package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** PyJson must render byte-identically to Python json.dumps (the cached
  * docs' byte format). Expected strings below are literal python outputs.
  */
class PyJsonSpec extends AnyFunSuite {

  private def roundTrip(json: String, indent: Int = -1): String =
    PyJson.dumps(PyJson.parse(json), indent)

  test("compact separators and ensure_ascii match json.dumps defaults") {
    assert(roundTrip("""{"a":1,"b":[1,2],"c":{"d":"x"}}""") ===
      """{"a": 1, "b": [1, 2], "c": {"d": "x"}}""")
    // ensure_ascii: \u00e9 and NBSP escape exactly like json.dumps
    assert(roundTrip("{\"s\":\"caf\u00e9\u00a0x\"}") ===
      "{\"s\": \"caf\\u00e9\\u00a0x\"}")
    assert(roundTrip("""{"e":{},"l":[]}""") === """{"e": {}, "l": []}""")
  }

  test("indent=2 matches json.dumps(indent=2)") {
    assert(roundTrip("""{"a":1,"b":[1]}""", 2) ===
      "{\n  \"a\": 1,\n  \"b\": [\n    1\n  ]\n}")
  }

  test("floats render like Python repr across the notation boundary") {
    // (python json.dumps output, input double)
    val cases = Seq(
      "1.5" -> 1.5,
      "10000000.0" -> 1e7,           // Java would say 1.0E7
      "12345678.5" -> 1.23456785e7,
      "100000000.0" -> 1e8,
      "0.0005" -> 0.0005,            // Java would say 5.0E-4
      "0.0001" -> 1e-4,
      "1e-05" -> 1e-5,
      "1e+16" -> 1e16,
      "1.5e+22" -> 1.5e22,
      "-12345678.5" -> -1.23456785e7
    )
    cases.foreach { case (expected, d) =>
      val node = PyJson.parse(s"""{"v": ${java.lang.Double.toString(d)}}""")
      val out = PyJson.dumps(node)
      assert(out === s"""{"v": $expected}""", s"for double $d")
    }
  }
}
