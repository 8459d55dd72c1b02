package graft.ingest

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node._
import com.fasterxml.jackson.databind.ObjectMapper

import scala.jdk.CollectionConverters._

/** JSON text rendering with Python `json.dumps` semantics, used by the
  * sinks so cached-document bytes match what the reference pipeline writes
  * (`api_client.py:193` — `model_dump_json(indent=2)`;
  * `updated_document_actions.py:398` — `json.dumps(document)`):
  *
  *  - compact mode separators are `", "` / `": "`;
  *  - indent mode separators are `",\n"+indent` / `": "`;
  *  - `ensure_ascii`: every non-ASCII char escapes to `\\uXXXX`;
  *  - field order = insertion order (Jackson ObjectNode preserves it, same
  *    as the Python dict behavior the integration test asserts,
  *    reference `test_integration.py:353-358`).
  *
  * Parsing goes through Jackson so unknown fields survive round-trips
  * (SURVEY.md §7 hard-part 3: never a struct round-trip).
  */
object PyJson {

  val mapper = new ObjectMapper()

  def parse(text: String): JsonNode = mapper.readTree(text)

  def obj(): ObjectNode = mapper.createObjectNode()

  /** Render like `json.dumps(node)` (compact+spaces) or
    * `json.dumps(node, indent=n)`.
    */
  def dumps(node: JsonNode, indent: Int = -1): String = {
    val sb = new StringBuilder
    write(node, sb, indent, 0)
    sb.toString
  }

  private def write(n: JsonNode, sb: StringBuilder, indent: Int, depth: Int): Unit =
    n match {
      case o: ObjectNode =>
        val fields = o.properties().asScala.toSeq
        if (fields.isEmpty) { sb.append("{}"); return }
        sb.append('{')
        val pad = if (indent > 0) "\n" + (" " * (indent * (depth + 1))) else ""
        var first = true
        fields.foreach { e =>
          if (!first) sb.append(if (indent > 0) "," else ", ")
          first = false
          sb.append(pad)
          writeString(e.getKey, sb)
          sb.append(": ")
          write(e.getValue, sb, indent, depth + 1)
        }
        if (indent > 0) sb.append("\n").append(" " * (indent * depth))
        sb.append('}')
      case a: ArrayNode =>
        if (a.isEmpty) { sb.append("[]"); return }
        sb.append('[')
        val pad = if (indent > 0) "\n" + (" " * (indent * (depth + 1))) else ""
        var first = true
        a.elements().asScala.foreach { v =>
          if (!first) sb.append(if (indent > 0) "," else ", ")
          first = false
          sb.append(pad)
          write(v, sb, indent, depth + 1)
        }
        if (indent > 0) sb.append("\n").append(" " * (indent * depth))
        sb.append(']')
      case t: TextNode => writeString(t.textValue(), sb)
      case _: NullNode => sb.append("null")
      case b: BooleanNode => sb.append(if (b.booleanValue()) "true" else "false")
      case num: NumericNode =>
        // ints print as ints; floats like Python repr (shortest round-trip
        // double — Java's Double.toString matches for the values here)
        if (num.isIntegralNumber) sb.append(num.asText())
        else sb.append(pyFloat(num.doubleValue()))
      case other => sb.append(other.toString)
    }

  /** Python float repr. Java's Double.toString goes scientific for
    * |v| ≥ 1e7 or < 1e-3, Python only outside [1e-4, 1e16) — values in
    * between must be re-rendered as plain decimal ("12345678.5", not
    * "1.23456785e+07"); true scientific values normalize to e±dd form.
    */
  private def pyFloat(d: Double): String = {
    val s = java.lang.Double.toString(d)
    if (!s.contains("E")) return s
    val Array(m, e) = s.split("E")
    val exp = e.toInt
    if (exp < 16 && exp >= -4) {
      // Python renders this range as plain decimal
      var plain = new java.math.BigDecimal(s).toPlainString
      if (!plain.contains('.')) plain = plain + ".0"
      else {
        plain = plain.replaceAll("0+$", "")
        if (plain.endsWith(".")) plain = plain + "0"
      }
      plain
    } else {
      val mantissa = if (m.endsWith(".0")) m.dropRight(2) else m
      val expStr = f"${math.abs(exp)}%02d"
      s"${mantissa}e${if (exp < 0) "-" else "+"}$expStr"
    }
  }

  /** ensure_ascii=True string escaping (Python json.dumps default). */
  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }
}
