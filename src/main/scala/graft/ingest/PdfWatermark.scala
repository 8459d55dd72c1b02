package graft.ingest

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.Inflater

/** Hand-rolled last-page PDF watermark appender (reference
  * `pdf_conversion.py:125-160` `add_last_page_watermark`; contract tested
  * at `tests/test_pdf_conversion.py:49-69`: page_count + 1, same page
  * dimensions as the previous last page, whitespace-normalized exact
  * watermark text). No PDF library resolves in this offline container, so
  * — like [[graft.sources.Npy]] hand-rolls the npy format — this module
  * implements the minimal PDF machinery itself:
  *
  *  - an object parser (dicts, arrays, names, strings, streams, refs);
  *  - xref loading: classic tables AND cross-reference streams
  *    (FlateDecode + PNG predictors) AND compressed objects in `/ObjStm`
  *    object streams, following the `/Prev` chain;
  *  - an *incremental update* writer: the original bytes are preserved as
  *    a strict prefix; the new page, its content stream, the font, and the
  *    re-written root `/Pages` node are appended with a new xref section
  *    (same flavor — table or stream — as the file's existing xref, as
  *    ISO 32000 requires) whose trailer `/Prev` points at the old one.
  *
  * Word-wrapping uses the standard Helvetica AFM widths, mirroring the
  * reference's `insert_textbox(..., fontname="helv", fontsize=12)` inside
  * a 72 pt margin rect.
  */
object PdfWatermark {

  // ---- object model ----------------------------------------------------

  sealed trait PVal
  case class PNum(v: Double, isInt: Boolean) extends PVal {
    def toLong: Long = v.toLong
  }
  case class PName(v: String) extends PVal
  case class PStr(raw: String) extends PVal // undecoded, serialized verbatim
  case class PBool(v: Boolean) extends PVal
  case object PNull extends PVal
  case class PRef(num: Int, gen: Int) extends PVal
  case class PArr(items: Vector[PVal]) extends PVal
  case class PDict(entries: Map[String, PVal]) extends PVal {
    def get(k: String): Option[PVal] = entries.get(k)
  }
  case class PStream(dict: PDict, raw: Array[Byte]) extends PVal

  private def num(v: PVal): Double = v match {
    case PNum(x, _) => x
    case other => throw new IllegalArgumentException(s"expected number, got $other")
  }

  // ---- lexer / parser --------------------------------------------------

  /** Recursive-descent parser over the PDF byte array. PDF syntax is
    * byte-oriented; ISO-8859-1 maps bytes 1:1 to chars for the text parts.
    */
  final class Parser(val data: Array[Byte]) {
    var pos: Int = 0

    private def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
    private def isDelim(b: Byte): Boolean =
      "()<>[]{}/%".indexOf(b.toChar) >= 0

    def skipWs(): Unit = {
      while (pos < data.length &&
          (isWs(data(pos)) || data(pos) == '%')) {
        if (data(pos) == '%') { // comment to EOL
          while (pos < data.length && data(pos) != '\n' && data(pos) != '\r')
            pos += 1
        } else pos += 1
      }
    }

    private def token(): String = {
      skipWs()
      val start = pos
      while (pos < data.length && !isWs(data(pos)) && !isDelim(data(pos)))
        pos += 1
      new String(data, start, pos - start, ISO_8859_1)
    }

    def expect(s: String): Unit = {
      skipWs()
      val got = new String(data, pos, s.length, ISO_8859_1)
      if (got != s)
        throw new IllegalArgumentException(s"expected '$s' at $pos, got '$got'")
      pos += s.length
    }

    def parseValue(): PVal = {
      skipWs()
      data(pos).toChar match {
        case '<' if data(pos + 1) == '<' => parseDictOrStream()
        case '<' => parseHexString()
        case '(' => parseLiteralString()
        case '[' => parseArray()
        case '/' => parseName()
        case c if c == '+' || c == '-' || c == '.' || c.isDigit =>
          parseNumberOrRef()
        case 't' | 'f' =>
          token() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case other => throw new IllegalArgumentException(s"bad token $other")
          }
        case 'n' =>
          expect("null"); PNull
        case c => throw new IllegalArgumentException(s"unexpected '$c' at $pos")
      }
    }

    private def parseName(): PName = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < data.length && !isWs(data(pos)) && !isDelim(data(pos))) {
        if (data(pos) == '#' && pos + 2 < data.length) {
          sb.append(Integer.parseInt(
            new String(data, pos + 1, 2, ISO_8859_1), 16).toChar)
          pos += 3
        } else { sb.append(data(pos).toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def parseLiteralString(): PStr = {
      val start = pos
      pos += 1
      var depth = 1
      while (depth > 0) {
        data(pos) match {
          case '\\' => pos += 2
          case '(' => depth += 1; pos += 1
          case ')' => depth -= 1; pos += 1
          case _ => pos += 1
        }
      }
      PStr(new String(data, start, pos - start, ISO_8859_1))
    }

    private def parseHexString(): PStr = {
      val start = pos
      pos += 1
      while (data(pos) != '>') pos += 1
      pos += 1
      PStr(new String(data, start, pos - start, ISO_8859_1))
    }

    private def parseArray(): PArr = {
      pos += 1
      val items = Vector.newBuilder[PVal]
      skipWs()
      while (data(pos) != ']') { items += parseValue(); skipWs() }
      pos += 1
      PArr(items.result())
    }

    private def parseNumberOrRef(): PVal = {
      val save = pos
      val t1 = token()
      if (t1.forall(c => c.isDigit)) {
        // might be "num gen R"
        val save2 = pos
        skipWs()
        if (pos < data.length && data(pos).toChar.isDigit) {
          val t2 = token()
          skipWs()
          if (t2.forall(_.isDigit) && pos < data.length && data(pos) == 'R' &&
              (pos + 1 >= data.length || isWs(data(pos + 1)) ||
                isDelim(data(pos + 1)))) {
            pos += 1
            return PRef(t1.toInt, t2.toInt)
          }
        }
        pos = save2
        PNum(t1.toDouble, isInt = true)
      } else {
        pos = save + t1.length
        PNum(t1.toDouble, isInt = !t1.exists(c => c == '.' || c == 'e' || c == 'E'))
      }
    }

    private def parseDictOrStream(): PVal = {
      pos += 2
      val entries = Map.newBuilder[String, PVal]
      skipWs()
      while (!(data(pos) == '>' && data(pos + 1) == '>')) {
        val PName(k) = parseName(): @unchecked
        entries += k -> parseValue()
        skipWs()
      }
      pos += 2
      PDict(entries.result()) // a following stream is the caller's to enter
    }

    /** True when a `stream` keyword follows; if so, position past it (and
      * its EOL) so the caller can slice the body.
      */
    def enterStream(): Boolean = {
      val save = pos
      skipWs()
      if (pos + 6 <= data.length &&
          new String(data, pos, 6, ISO_8859_1) == "stream") {
        pos += 6
        if (data(pos) == '\r') pos += 1
        if (data(pos) == '\n') pos += 1
        true
      } else { pos = save; false }
    }
  }

  // ---- document reader -------------------------------------------------

  private sealed trait XEntry
  private case class XOffset(off: Long, gen: Int) extends XEntry
  private case class XInStream(container: Int, idx: Int) extends XEntry
  /** Freed in some revision — must SHADOW older sections' live entries. */
  private case object XFree extends XEntry

  /** Random-access reader over one PDF byte array: xref map + object
    * loader + page-tree walk.
    */
  final class Doc(val data: Array[Byte]) {
    private val xref = scala.collection.mutable.HashMap[Int, XEntry]()
    var trailer: PDict = PDict(Map.empty)
    /** true when the newest xref section is a cross-reference stream. */
    var xrefIsStream: Boolean = false
    val startXref: Long = {
      val tail = new String(data, math.max(0, data.length - 2048),
        math.min(2048, data.length), ISO_8859_1)
      val i = tail.lastIndexOf("startxref")
      require(i >= 0, "no startxref")
      tail.substring(i + 9).trim.takeWhile(_.isDigit).toLong
    }
    loadXref(startXref, isNewest = true)

    private def loadXref(off: Long, isNewest: Boolean): Unit = {
      val p = new Parser(data)
      p.pos = off.toInt
      p.skipWs()
      if (new String(data, p.pos, 4, ISO_8859_1) == "xref") {
        if (isNewest) xrefIsStream = false
        p.pos += 4
        p.skipWs()
        while (new String(data, p.pos, 7, ISO_8859_1) != "trailer") {
          val start = p.parseValue().asInstanceOf[PNum].toLong.toInt
          val count = p.parseValue().asInstanceOf[PNum].toLong.toInt
          p.skipWs()
          (0 until count).foreach { i =>
            val line = new String(data, p.pos, 18, ISO_8859_1)
            p.pos += 20
            val objNum = start + i
            // newest-section-wins INCLUDING free entries: an object freed
            // by a later revision must not resurrect from an older section
            if (!xref.contains(objNum))
              xref(objNum) =
                if (line.charAt(17) == 'n')
                  XOffset(line.substring(0, 10).toLong,
                    line.substring(11, 16).toInt)
                else XFree
          }
          p.skipWs()
        }
        p.expect("trailer")
        val t = p.parseValue().asInstanceOf[PDict]
        if (trailer.entries.isEmpty) trailer = t
        // hybrid files: /XRefStm entries take PRECEDENCE over this
        // section's /Prev chain (ISO 32000 §7.5.8.4) — load it first so
        // first-seen-wins resolves to the hybrid stream's entries
        t.get("XRefStm").foreach(v => loadXref(num(v).toLong, isNewest = false))
        t.get("Prev").foreach(v => loadXref(num(v).toLong, isNewest = false))
      } else {
        // cross-reference stream: "N G obj << ... >> stream"
        if (isNewest) xrefIsStream = true
        p.parseValue(); p.parseValue() // obj num, gen
        p.expect("obj")
        val dict = p.parseValue().asInstanceOf[PDict]
        require(p.enterStream(), "xref stream object has no stream body")
        val dataBytes = streamBytesAt(p, dict)
        val w = dict.get("W").get.asInstanceOf[PArr].items.map(num(_).toInt)
        val size = num(dict.get("Size").get).toInt
        val index = dict.get("Index") match {
          case Some(PArr(items)) => items.map(num(_).toLong.toInt)
          case _ => Vector(0, size)
        }
        val rowLen = w.sum
        var rowPos = 0
        index.grouped(2).foreach {
          case Seq(start, count) =>
            (0 until count).foreach { i =>
              val row = dataBytes.slice(rowPos, rowPos + rowLen)
              rowPos += rowLen
              def field(fi: Int): Long = {
                val fStart = w.take(fi).sum
                var v = 0L
                (0 until w(fi)).foreach(j =>
                  v = (v << 8) | (row(fStart + j) & 0xffL))
                v
              }
              val tpe = if (w(0) == 0) 1L else field(0)
              val objNum = start + i
              if (!xref.contains(objNum)) tpe match {
                case 1 => xref(objNum) = XOffset(field(1), field(2).toInt)
                case 2 => xref(objNum) = XInStream(field(1).toInt, field(2).toInt)
                case _ => xref(objNum) = XFree // shadows older sections
              }
            }
          case _ => ()
        }
        if (trailer.entries.isEmpty) trailer = dict
        dict.get("Prev").foreach(v => loadXref(num(v).toLong, isNewest = false))
      }
    }

    /** Slice + decode a stream's bytes, parser positioned at stream start. */
    private def streamBytesAt(p: Parser, dict: PDict): Array[Byte] = {
      val len = num(resolve(dict.get("Length").get)).toLong.toInt
      val raw = p.data.slice(p.pos, p.pos + len)
      decode(dict, raw)
    }

    private def decode(dict: PDict, raw: Array[Byte]): Array[Byte] = {
      val filters: Seq[String] = dict.get("Filter") match {
        case Some(PName(n)) => Seq(n)
        case Some(PArr(items)) => items.collect { case PName(n) => n }
        case _ => Seq.empty
      }
      require(filters.forall(_ == "FlateDecode"),
        s"unsupported PDF stream filters $filters")
      var out = raw
      filters.foreach { _ => out = inflate(out) }
      val parms = resolve(dict.get("DecodeParms").getOrElse(PNull)) match {
        case d: PDict => d
        case PArr(items) if items.nonEmpty =>
          resolve(items.head) match { case d: PDict => d; case _ => PDict(Map.empty) }
        case _ => PDict(Map.empty)
      }
      val predictor = parms.get("Predictor").map(num(_).toInt).getOrElse(1)
      if (predictor >= 10) {
        val columns = parms.get("Columns").map(num(_).toInt).getOrElse(1)
        out = pngUnpredict(out, columns)
      }
      out
    }

    private def inflate(in: Array[Byte]): Array[Byte] = {
      val inf = new Inflater()
      inf.setInput(in)
      val out = new ByteArrayOutputStream(in.length * 4)
      val buf = new Array[Byte](8192)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n) else if (n == 0 && inf.needsDictionary())
          throw new IllegalArgumentException("flate needs dictionary")
      }
      inf.end()
      out.toByteArray
    }

    /** Reverse PNG row predictors (sub/up/average/paeth), bpp = 1. */
    private def pngUnpredict(in: Array[Byte], columns: Int): Array[Byte] = {
      val rowLen = columns + 1
      val rows = in.length / rowLen
      val out = new Array[Byte](rows * columns)
      var prev = new Array[Byte](columns)
      (0 until rows).foreach { r =>
        val ft = in(r * rowLen) & 0xff
        val row = in.slice(r * rowLen + 1, r * rowLen + 1 + columns)
        (0 until columns).foreach { c =>
          val left = if (c > 0) out(r * columns + c - 1) & 0xff else 0
          val up = prev(c) & 0xff
          val ul = if (c > 0) prev(c - 1) & 0xff else 0
          val recon = ft match {
            case 0 => row(c) & 0xff
            case 1 => (row(c) & 0xff) + left
            case 2 => (row(c) & 0xff) + up
            case 3 => (row(c) & 0xff) + (left + up) / 2
            case 4 =>
              val pp = left + up - ul
              val pa = math.abs(pp - left); val pb = math.abs(pp - up)
              val pc = math.abs(pp - ul)
              val pred = if (pa <= pb && pa <= pc) left
                else if (pb <= pc) up else ul
              (row(c) & 0xff) + pred
            case other =>
              throw new IllegalArgumentException(s"bad PNG filter $other")
          }
          out(r * columns + c) = recon.toByte
        }
        prev = out.slice(r * columns, (r + 1) * columns)
      }
      out
    }

    private val objCache = scala.collection.mutable.HashMap[Int, PVal]()

    def obj(ref: PRef): PVal = obj(ref.num)

    def obj(n: Int): PVal = objCache.getOrElseUpdate(n, xref.get(n) match {
      case Some(XOffset(off, _)) =>
        val p = new Parser(data)
        p.pos = off.toInt
        p.parseValue(); p.parseValue()
        p.expect("obj")
        val v = p.parseValue()
        v match {
          case d: PDict if p.enterStream() => PStream(d, streamBytesAt(p, d))
          case other => other
        }
      case Some(XInStream(container, idx)) =>
        val PStream(cd, bytes) = obj(container): @unchecked
        val nObjs = num(cd.get("N").get).toInt
        val first = num(cd.get("First").get).toInt
        val hp = new Parser(bytes)
        val pairs = (0 until nObjs).map { _ =>
          (hp.parseValue().asInstanceOf[PNum].toLong.toInt,
            hp.parseValue().asInstanceOf[PNum].toLong.toInt)
        }
        val (_, off) = pairs(idx)
        val op = new Parser(bytes)
        op.pos = first + off
        op.parseValue()
      case Some(XFree) | None => PNull
    })

    def resolve(v: PVal): PVal = v match {
      case r: PRef => resolve(obj(r))
      case other => other
    }

    def rootRef: PRef = trailer.get("Root").get.asInstanceOf[PRef]
    def pagesRef: PRef =
      resolve(rootRef).asInstanceOf[PDict].get("Pages").get.asInstanceOf[PRef]

    /** Max object number across all xref sections. */
    def maxObjNum: Int = xref.keys.max

    def pagesGen: Int = xref(pagesRef.num) match {
      case XOffset(_, g) => g
      case _ => 0
    }

    /** Count page LEAVES by walking the tree (independent of /Count). */
    def pageLeafCount: Int = {
      def walk(ref: PRef): Int = resolve(ref) match {
        case d: PDict if d.get("Type").contains(PName("Pages")) =>
          // /Kids may itself be an indirect reference to the array
          resolve(d.get("Kids").get) match {
            case PArr(kids) => kids.collect { case r: PRef => walk(r) }.sum
            case _ => 0
          }
        case _: PDict => 1
        case _ => 0
      }
      walk(pagesRef)
    }

    /** (width, height) of the LAST page, resolving MediaBox inheritance. */
    def lastPageSize: (Double, Double) = {
      def walk(ref: PRef, inherited: Option[PArr]): (Double, Double) = {
        val d = resolve(ref).asInstanceOf[PDict]
        val mb = d.get("MediaBox").map(resolve(_).asInstanceOf[PArr])
          .orElse(inherited)
        if (d.get("Type").contains(PName("Pages"))) {
          val PArr(kids) = resolve(d.get("Kids").get): @unchecked
          walk(kids.last.asInstanceOf[PRef], mb)
        } else {
          val box = mb.getOrElse(
            throw new IllegalArgumentException("no MediaBox"))
          val c = box.items.map(v => num(resolve(v)))
          (c(2) - c(0), c(3) - c(1))
        }
      }
      walk(pagesRef, None)
    }

    /** Decoded content-stream bytes of the LAST page. */
    def lastPageContent: Array[Byte] = {
      def lastLeaf(ref: PRef): PDict = resolve(ref) match {
        case d: PDict if d.get("Type").contains(PName("Pages")) =>
          val PArr(kids) = resolve(d.get("Kids").get): @unchecked
          lastLeaf(kids.last.asInstanceOf[PRef])
        case d: PDict => d
        case other => throw new IllegalArgumentException(s"bad page $other")
      }
      val page = lastLeaf(pagesRef)
      page.get("Contents").map(resolve) match {
        case Some(PStream(_, bytes)) => bytes
        case Some(PArr(items)) =>
          items.flatMap(i => resolve(i) match {
            case PStream(_, b) => b.toSeq
            case _ => Seq.empty[Byte]
          }).toArray
        case _ => Array.emptyByteArray
      }
    }
  }

  // ---- serializer ------------------------------------------------------

  private def ser(v: PVal): String = v match {
    case PNum(x, true) => x.toLong.toString
    case PNum(x, false) => x.toString
    case PName(n) => "/" + n
    case PStr(raw) => raw
    case PBool(b) => b.toString
    case PNull => "null"
    case PRef(n, g) => s"$n $g R"
    case PArr(items) => items.map(ser).mkString("[ ", " ", " ]")
    case PDict(entries) =>
      entries.map { case (k, vv) => s"/$k ${ser(vv)}" }
        .mkString("<< ", " ", " >>")
    case PStream(_, _) =>
      throw new IllegalArgumentException("stream reserialization unsupported")
  }

  // ---- Helvetica metrics + word wrap -----------------------------------

  /** Standard Helvetica AFM widths (1/1000 em) for chars 32..126. */
  private val HelvWidths: Array[Int] = Array(
    278, 278, 355, 556, 556, 889, 667, 191, 333, 333, 389, 584, 278, 333,
    278, 278, 556, 556, 556, 556, 556, 556, 556, 556, 556, 556, 278, 278,
    584, 584, 584, 556, 1015, 667, 667, 722, 722, 667, 611, 778, 722, 278,
    500, 667, 556, 833, 722, 778, 667, 778, 722, 667, 611, 722, 667, 944,
    667, 667, 611, 278, 278, 278, 469, 556, 333, 556, 556, 500, 556, 556,
    278, 556, 556, 222, 222, 500, 222, 833, 556, 556, 556, 556, 333, 500,
    278, 556, 500, 722, 500, 500, 500, 334, 260, 334, 584)

  private def textWidth(s: String, fontSize: Double): Double =
    s.map { c =>
      val i = c.toInt - 32
      if (i >= 0 && i < HelvWidths.length) HelvWidths(i) else 556
    }.sum * fontSize / 1000.0

  /** Greedy word wrap at `maxWidth` points; input newlines are hard
    * breaks (the reference's insert_textbox semantics).
    */
  private[ingest] def wrapLines(text: String, fontSize: Double,
      maxWidth: Double): Seq[String] =
    text.split("\n", -1).toSeq.flatMap { para =>
      if (para.isEmpty) Seq("")
      else {
        val words = para.split(" ").filter(_.nonEmpty)
        val lines = Seq.newBuilder[String]
        var cur = new StringBuilder
        words.foreach { w =>
          val cand = if (cur.isEmpty) w else cur.toString + " " + w
          if (textWidth(cand, fontSize) <= maxWidth || cur.isEmpty) {
            cur = new StringBuilder(cand)
          } else {
            lines += cur.toString
            cur = new StringBuilder(w)
          }
        }
        if (cur.nonEmpty) lines += cur.toString
        lines.result()
      }
    }

  private def escapeString(s: String): String =
    "(" + s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c => c.toString
    } + ")"

  // ---- the appender ----------------------------------------------------

  /** Append a last page carrying `text` (Helvetica 12 pt, 72 pt margins,
    * word-wrapped) as an incremental update. The original bytes are a
    * strict prefix of the result.
    */
  def addLastPageWatermark(pdf: Array[Byte], text: String): Array[Byte] = {
    val doc = new Doc(pdf)
    val (w, h) = doc.lastPageSize
    val pagesRef = doc.pagesRef
    val pagesDict = doc.resolve(pagesRef).asInstanceOf[PDict]

    val base = doc.maxObjNum + 1
    val fontNum = base
    val contentNum = base + 1
    val pageNum = base + 2
    val xrefStreamNum = base + 3 // only used for stream-flavor updates

    // content stream: 12pt Helvetica, 1.2 line height (fitz default), text
    // origin at the top margin minus one ascent
    val fontSize = 12.0
    val leading = fontSize * 1.2
    val margin = 72.0
    val lines = wrapLines(text, fontSize, w - 2 * margin)
    val content = new StringBuilder
    content.append("BT\n/F0 ").append(fontSize).append(" Tf\n")
      .append(leading).append(" TL\n")
      .append("1 0 0 1 ").append(margin).append(' ')
      .append(h - margin - fontSize).append(" Tm\n")
    lines.foreach { line =>
      if (line.nonEmpty)
        content.append(escapeString(line)).append(" Tj\n")
      content.append("T*\n")
    }
    content.append("ET\n")
    val contentBytes = content.toString.getBytes(ISO_8859_1)

    val fontObj =
      "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    val contentObj =
      s"<< /Length ${contentBytes.length} >>\nstream\n" +
        new String(contentBytes, ISO_8859_1) + "\nendstream"
    val pageObj =
      s"<< /Type /Page /Parent ${ser(pagesRef)} " +
        s"/MediaBox [ 0 0 $w $h ] " +
        s"/Resources << /Font << /F0 $fontNum 0 R >> >> " +
        s"/Contents $contentNum 0 R >>"
    // re-written root Pages node: same object number, Kids + new page,
    // Count + 1 (intermediate nodes are untouched — the page is appended
    // at the top level, so only the root count changes)
    val PArr(kids) = doc.resolve(pagesDict.get("Kids").get): @unchecked
    val oldCount = num(doc.resolve(pagesDict.get("Count").get)).toLong
    val newPages = PDict(pagesDict.entries
      + ("Kids" -> PArr(kids :+ PRef(pageNum, 0)))
      + ("Count" -> PNum((oldCount + 1).toDouble, isInt = true)))

    val out = new ByteArrayOutputStream(pdf.length + 4096)
    out.write(pdf)
    if (pdf.last != '\n') out.write('\n')

    def writeObj(n: Int, gen: Int, body: String): Long = {
      val off = out.size().toLong
      out.write(s"$n $gen obj\n$body\nendobj\n".getBytes(ISO_8859_1))
      off
    }
    val pagesGen = doc.pagesGen
    val pagesOff = writeObj(pagesRef.num, pagesGen, ser(newPages))
    val fontOff = writeObj(fontNum, 0, fontObj)
    val contentOff = writeObj(contentNum, 0, contentObj)
    val pageOff = writeObj(pageNum, 0, pageObj)

    val keepKeys = Seq("Root", "Info", "ID")
    val inherited = keepKeys.flatMap(k =>
      doc.trailer.get(k).map(k -> _)).toMap

    if (!doc.xrefIsStream) {
      val xrefOff = out.size().toLong
      val sb = new StringBuilder("xref\n")
      def entry(off: Long, gen: Int) = f"$off%010d $gen%05d n \n"
      sb.append(s"${pagesRef.num} 1\n").append(entry(pagesOff, pagesGen))
      sb.append(s"$fontNum 3\n")
        .append(entry(fontOff, 0)).append(entry(contentOff, 0))
        .append(entry(pageOff, 0))
      val trailerDict = PDict(inherited
        + ("Size" -> PNum((pageNum + 1).toDouble, isInt = true))
        + ("Prev" -> PNum(doc.startXref.toDouble, isInt = true)))
      sb.append("trailer\n").append(ser(trailerDict))
        .append(s"\nstartxref\n$xrefOff\n%%EOF\n")
      out.write(sb.toString.getBytes(ISO_8859_1))
    } else {
      // the file uses cross-reference streams: the update must too. Rows
      // are uncompressed (/W [1 4 2], no filter) — tiny and universal.
      val rows = Seq(
        (pagesRef.num, pagesOff, pagesGen),
        (fontNum, fontOff, 0),
        (contentNum, contentOff, 0),
        (pageNum, pageOff, 0))
      val xrefOff = out.size().toLong
      val allRows = rows :+ ((xrefStreamNum, xrefOff, 0))
      val body = new ByteArrayOutputStream()
      allRows.foreach { case (_, off, gen) =>
        body.write(1)
        body.write(((off >> 24) & 0xff).toInt); body.write(((off >> 16) & 0xff).toInt)
        body.write(((off >> 8) & 0xff).toInt); body.write((off & 0xff).toInt)
        body.write((gen >> 8) & 0xff); body.write(gen & 0xff)
      }
      val idx = allRows.flatMap { case (n, _, _) => Seq(n, 1) }
      val xd = PDict(inherited
        + ("Type" -> PName("XRef"))
        + ("Size" -> PNum((xrefStreamNum + 1).toDouble, isInt = true))
        + ("W" -> PArr(Vector(PNum(1, true), PNum(4, true), PNum(2, true))))
        + ("Index" -> PArr(idx.map(i => PNum(i.toDouble, isInt = true)).toVector))
        + ("Length" -> PNum(body.size().toDouble, isInt = true))
        + ("Prev" -> PNum(doc.startXref.toDouble, isInt = true)))
      out.write((s"$xrefStreamNum 0 obj\n${ser(xd)}\nstream\n").getBytes(ISO_8859_1))
      out.write(body.toByteArray)
      out.write(("\nendstream\nendobj\n" +
        s"startxref\n$xrefOff\n%%EOF\n").getBytes(ISO_8859_1))
    }
    out.toByteArray
  }

  /** Extract the text shown by `Tj` operators in a content stream (enough
    * for the watermark page, whose stream this module itself wrote; used
    * by the spec to port the reference's extraction-equality assertion).
    */
  def extractTjText(content: Array[Byte]): String = {
    val s = new String(content, ISO_8859_1)
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '(') {
        val sb = new StringBuilder
        i += 1
        var depth = 1
        while (depth > 0) {
          s.charAt(i) match {
            case '\\' =>
              sb.append(s.charAt(i + 1)); i += 2
            case '(' => depth += 1; sb.append('('); i += 1
            case ')' =>
              depth -= 1; if (depth > 0) sb.append(')'); i += 1
            case c => sb.append(c); i += 1
          }
        }
        // consume up to operator; only Tj strings count as shown text
        val rest = s.substring(i).dropWhile(_.isWhitespace)
        if (rest.startsWith("Tj")) out.append(sb).append('\n')
      } else i += 1
    }
    out.toString
  }
}
