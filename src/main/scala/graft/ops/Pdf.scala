package graft.ops

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PDF text extraction — the reference's headline unstructured file
  * type (sources/unstructured_data/README.md:95 `invoice_1.pdf`; the
  * inbox/gdrive flows filter on `.pdf`, sources/inbox/README.md:105) —
  * as a JDK-only codec in the [[MediaCodecs]] mold: no library, a
  * by-hand reader for the subset that carries text, and a by-hand
  * writer so fixtures have ground truth by construction.
  *
  * Reader scope (the honest contract, like the other codecs): classic
  * cross-reference PDFs whose content streams are uncompressed or
  * FlateDecode-compressed, text drawn with the standard operators —
  * literal `(…)` and hex `<…>` strings via `Tj`, `'`, `"` and `TJ`
  * arrays, line moves via `Td`/`TD`/`T*`. That covers
  * machine-generated text PDFs (invoices, reports, exports — the
  * reference's use case); PDF 1.5+ object streams (/ObjStm) are
  * inflated and scanned as dict material, so page counting survives
  * packed page dicts (content streams are stream objects and cannot be
  * packed). Out of scope and detected honestly: cross-reference stream
  * DECODING (/XRef predictors — unneeded, the reader scans objects
  * directly), non-Flate filters (DCT, LZW), CID/Type0 multi-byte
  * encodings —
  * those extract as empty text rather than garbage, and malformed
  * blobs quarantine as `format = "corrupt"` (one bad file must never
  * fail a corpus-scale job).
  *
  * Scale shape: extraction is a narrow `mapPartitions` over (id, blob)
  * rows — the blobs never shuffle, only extracted text flows
  * downstream; same plumbing as [[MediaCodecs]]/[[Extraction]].
  */
object Pdf {

  // ---------------------------------------------------------------- writer

  private def escapeString(s: String): String =
    s.flatMap {
      case '\\' => "\\\\"
      case '('  => "\\("
      case ')'  => "\\)"
      case c    => c.toString
    }

  private def hexString(s: String): String =
    s.getBytes(StandardCharsets.ISO_8859_1).map(b => f"${b & 0xff}%02X").mkString

  private[ops] def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** One page's content stream: each line one text-show at a fixed
    * leading. Lines rotate through the three string forms the reader
    * must handle — literal `Tj`, hex `Tj`, and a kerned `TJ` array —
    * so a round-trip exercises all of them.
    */
  private def pageContent(lines: Seq[String]): Array[Byte] = {
    val ops = new StringBuilder("BT /F1 12 Tf 72 720 Td ")
    lines.zipWithIndex.foreach { case (line, i) =>
      if (i > 0) ops.append("0 -14 Td ")
      (i % 3) match {
        case 0 => ops.append(s"(${escapeString(line)}) Tj ")
        case 1 => ops.append(s"<${hexString(line)}> Tj ")
        case _ =>
          val words = line.split(" ", 2)
          if (words.length == 2)
            ops.append(s"[(${escapeString(words(0))}) -120 ( ${escapeString(words(1))})] TJ ")
          else ops.append(s"(${escapeString(line)}) Tj ")
      }
    }
    ops.append("ET")
    ops.toString.getBytes(StandardCharsets.ISO_8859_1)
  }

  /** A complete single-font PDF: `pages` is lines-per-page. Every
    * structural byte is written by hand (header, objects, xref offsets,
    * trailer), so the output is a real PDF any reader opens — and the
    * extractable text is the input lines by construction.
    */
  def encodePdf(pages: Seq[Seq[String]], compress: Boolean): Array[Byte] = {
    require(pages.nonEmpty, "a PDF needs at least one page")
    val out = new ByteArrayOutputStream()
    def write(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Long]()
    def beginObj(n: Int): Unit = { offsets += out.size().toLong; write(s"$n 0 obj\n") }

    write("%PDF-1.4\n%âãÏÓ\n")
    val nPages = pages.size
    val pageObj = (i: Int) => 4 + 2 * i
    val contentObj = (i: Int) => 5 + 2 * i

    beginObj(1); write("<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    beginObj(2)
    write(s"<< /Type /Pages /Kids [${(0 until nPages).map(i => s"${pageObj(i)} 0 R").mkString(" ")}] /Count $nPages >>\nendobj\n")
    beginObj(3); write("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>\nendobj\n")
    pages.zipWithIndex.foreach { case (lines, i) =>
      beginObj(pageObj(i))
      write(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${contentObj(i)} 0 R >>\nendobj\n")
      val raw = pageContent(lines)
      val (body, filter) =
        if (compress) (deflate(raw), " /Filter /FlateDecode") else (raw, "")
      beginObj(contentObj(i))
      write(s"<< /Length ${body.length}$filter >>\nstream\n")
      out.write(body)
      write("\nendstream\nendobj\n")
    }
    val xrefPos = out.size()
    val n = offsets.size + 1
    write(s"xref\n0 $n\n0000000000 65535 f \n")
    offsets.foreach(o => write(f"$o%010d 00000 n \n"))
    write(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------- reader

  final case class PdfInfo(n_pages: Long, text: String)

  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(bytes)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsDictionary()) {
      val k = inf.inflate(buf)
      if (k == 0 && inf.needsInput()) throw new java.io.IOException("truncated Flate stream")
      out.write(buf, 0, k)
    }
    inf.end()
    out.toByteArray
  }

  /** All decoded stream payloads plus the concatenated non-stream
    * regions (dicts — where /Type /Page counts live).
    */
  private def streamsAndDicts(bytes: Array[Byte]): (Seq[Array[Byte]], String) = {
    // ISO-8859-1 is a 1:1 byte<->char view: offsets in the string ARE
    // byte offsets, which the /Length arithmetic below depends on
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    if (!s.startsWith("%PDF-")) throw new java.io.IOException("not a PDF header")
    val streams = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    val dicts = new StringBuilder()
    var pos = 0
    while (pos < s.length) {
      val st = s.indexOf("stream", pos)
      if (st < 0) { dicts.append(s.substring(pos)); pos = s.length }
      else if (st + 6 < s.length && (s.charAt(st + 6) == '\n' || s.charAt(st + 6) == '\r')) {
        dicts.append(s.substring(pos, st))
        // data starts after the EOL that terminates the `stream` keyword
        val dataStart =
          if (s.startsWith("\r\n", st + 6)) st + 8 else st + 7
        // the CURRENT stream's dict only: scan back to this object's
        // `obj` (or the previous stream's `endstream`) so a neighboring
        // object's /Filter or /Length is never misattributed — a Flate
        // dict within a fixed lookbehind window would otherwise make us
        // inflate a plain-text stream (false corrupt) or drop text.
        // With NEITHER anchor present (tolerant parse of a headerless
        // object) fall back to a bounded window — generous enough for a
        // long dict, never the whole file prefix (which would adopt an
        // unrelated earlier object's /Filter).
        val anchor = math.max(s.lastIndexOf("obj", st), s.lastIndexOf("endstream", st))
        val dictStart = if (anchor >= 0) anchor else math.max(0, st - 4096)
        // honor a DIRECT /Length from this dict; an indirect
        // `/Length 12 0 R` (or garbage) falls back to the endstream scan
        val dictRegion = s.substring(dictStart, st)
        // (?!\d) pins the FULL number (no backtracking to a prefix);
        // the second lookahead rejects indirect `/Length 12 0 R` refs
        val lenM = "/Length\\s+(\\d+)(?!\\d)(?!\\s+\\d+\\s+R)".r
          .findAllMatchIn(dictRegion).toSeq.lastOption
        val dataEnd = lenM.map(m => dataStart + m.group(1).toInt) match {
          case Some(e) if e <= s.length && s.indexOf("endstream", e) >= 0 => e
          case _ =>
            val e = s.indexOf("endstream", dataStart)
            if (e < 0) throw new java.io.IOException("unterminated stream")
            // trim the EOL that precedes `endstream`
            if (e >= 2 && s.startsWith("\r\n", e - 2)) e - 2
            else if (e >= 1 && (s.charAt(e - 1) == '\n' || s.charAt(e - 1) == '\r')) e - 1
            else e
        }
        val raw = java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)
        val body =
          if (dictRegion.contains("/FlateDecode")) inflate(raw)
          else if (dictRegion.contains("/Filter")) Array.emptyByteArray // unsupported filter: skip honestly
          else raw
        // PDF 1.5+ object streams pack NON-stream objects (page dicts
        // among them) inside a compressed payload; page CONTENT streams
        // are stream objects and can't live there, so for text purposes
        // an ObjStm is dict material (page counting), never operators
        if (dictRegion.contains("/ObjStm"))
          dicts.append(' ').append(new String(body, StandardCharsets.ISO_8859_1))
        else streams += body
        val es = s.indexOf("endstream", dataEnd)
        if (es < 0) throw new java.io.IOException("unterminated stream")
        pos = es + 9
      } else { dicts.append(s.substring(pos, st + 6)); pos = st + 6 }
    }
    (streams.toSeq, dicts.toString)
  }

  /** Text operators over one decoded content stream: BT/ET blocks,
    * literal and hex strings, Tj / ' / " / TJ shows, Td / TD / T* line
    * moves. Lines join with '\n'.
    */
  private def textOps(content: Array[Byte]): Seq[String] = {
    val s = new String(content, StandardCharsets.ISO_8859_1)
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val line = new StringBuilder()
    var lastString: String = null
    var lastArray: Seq[String] = null
    var inText = false
    def flushLine(): Unit =
      if (line.nonEmpty) { lines += line.toString; line.clear() }
    var i = 0
    def parseLiteral(): String = {
      // i is at '('; returns unescaped content, leaves i after ')'
      val sb = new StringBuilder()
      var depth = 1
      i += 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' if i + 1 < s.length =>
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'b' => sb.append('\b'); i += 2
              case 'f' => sb.append('\f'); i += 2
              case '\n' => i += 2 // line continuation
              case d if d >= '0' && d <= '7' =>
                var oct = 0; var k = 0; i += 1
                while (k < 3 && i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  oct = oct * 8 + (s.charAt(i) - '0'); i += 1; k += 1
                }
                sb.append(oct.toChar)
              case c => sb.append(c); i += 2
            }
          case '(' => depth += 1; sb.append('('); i += 1
          case ')' =>
            depth -= 1; if (depth > 0) sb.append(')'); i += 1
          case c => sb.append(c); i += 1
        }
      }
      sb.toString
    }
    def parseHex(): String = {
      // i is at '<' (not '<<'); leaves i after '>'
      val hex = new StringBuilder()
      i += 1
      while (i < s.length && s.charAt(i) != '>') {
        val c = s.charAt(i)
        if (Character.digit(c, 16) >= 0) hex.append(c)
        i += 1
      }
      i += 1
      if (hex.length % 2 == 1) hex.append('0')
      hex.toString.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') lastString = parseLiteral()
      else if (c == '<' && i + 1 < s.length && s.charAt(i + 1) == '<') i += 2
      else if (c == '<') lastString = parseHex()
      else if (c == '[') {
        val items = scala.collection.mutable.ArrayBuffer[String]()
        i += 1
        var done = false
        while (i < s.length && !done) {
          s.charAt(i) match {
            case '(' => items += parseLiteral()
            case '<' => items += parseHex()
            case ']' => done = true; i += 1
            case _   => i += 1
          }
        }
        lastArray = items.toSeq
      } else if (Character.isLetter(c) || c == '\'' || c == '"' || c == '*') {
        val start = i
        while (i < s.length && !Character.isWhitespace(s.charAt(i)) &&
          !"()<>[]/".contains(s.charAt(i))) i += 1
        val op = s.substring(start, i)
        op match {
          case "BT" => inText = true
          case "ET" => if (inText) flushLine(); inText = false
          case "Tj" => if (inText && lastString != null) line.append(lastString)
          case "'" | "\"" =>
            if (inText) { flushLine(); if (lastString != null) line.append(lastString) }
          case "TJ" => if (inText && lastArray != null) lastArray.foreach(line.append(_))
          case "Td" | "TD" | "T*" => if (inText) flushLine()
          case _ => ()
        }
      } else i += 1
    }
    flushLine()
    lines.toSeq
  }

  /** Page count + extracted text ('\n' between lines and pages). Throws
    * on malformed input — [[extract]] quarantines.
    */
  def extractText(bytes: Array[Byte]): PdfInfo = {
    val (streams, dicts) = streamsAndDicts(bytes)
    val nPages = "/Type\\s*/Page[^s]".r.findAllMatchIn(dicts + " ").size
    val text = streams.flatMap(textOps).mkString("\n")
    PdfInfo(math.max(nPages, 0).toLong, text)
  }

  /** The extraction row op: (id, format, n_pages, text, n_chars) from
    * raw PDF blobs via a narrow mapPartitions — blobs never shuffle.
    * Malformed blobs quarantine as format "corrupt" with empty text
    * (filter downstream to audit); a PDF whose filters/encodings are
    * out of reader scope extracts as format "pdf" with whatever text
    * its supported streams carry. A NULL id, by contrast, FAILS THE JOB
    * (named error, not a quarantined row): a bad file is data, a null
    * key is a pipeline bug upstream — quarantining it would silently
    * orphan the row from every downstream join on id.
    */
  def extract(df: DataFrame, idCol: String, pdfCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField(idCol, LongType),
      StructField("format", StringType),
      StructField("n_pages", LongType),
      StructField("text", StringType),
      StructField("n_chars", LongType)))
    df.select(col(idCol).cast(LongType), col(pdfCol))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          // a null id must name the column (same guard as
          // Tokenize.tokenCounts) — an opaque executor NPE here would
          // fail the whole corpus job, violating the one-bad-file
          // contract the catch below exists for
          if (r.isNullAt(0))
            throw new IllegalArgumentException(
              s"extract: null id in column '$idCol' — filter null ids before extracting")
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val info = extractText(bytes)
            Row(id, "pdf", info.n_pages, info.text, info.text.length.toLong)
          } catch {
            case scala.util.control.NonFatal(_) =>
              Row(id, "corrupt", 0L, "", 0L)
          }
        }
      }(Encoders.row(schema))
  }
}
