package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** PDF codec: writer→reader round trips (all three string forms, both
  * filters, escapes, multi-page), honest degrades (unsupported filter,
  * corrupt blobs), and the DataFrame extraction op.
  */
class PdfSpec extends SparkTestBase {
  import spark.implicits._

  test("round trip: uncompressed and Flate, literal/hex/TJ lines, multi-page") {
    val pages = Seq(
      Seq("alpha beta gamma", "delta epsilon", "zeta eta theta iota"),
      Seq("page two first", "page two second"))
    for (compress <- Seq(false, true)) {
      val bytes = Pdf.encodePdf(pages, compress)
      val info = Pdf.extractText(bytes)
      assert(info.n_pages == 2L, s"compress=$compress")
      assert(info.text == pages.flatten.mkString("\n"), s"compress=$compress")
    }
  }

  test("string escapes round trip: parens, backslash, octal-able chars") {
    val lines = Seq("a (nested (deep)) paren", "back\\slash and ) stray")
    val info = Pdf.extractText(Pdf.encodePdf(Seq(lines), compress = true))
    assert(info.text == lines.mkString("\n"))
  }

  test("literal-string escape sequences decode: \\n \\t octal and line continuation") {
    val content = "BT (AB\\101\\n\\tC) Tj ET".getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n2 0 obj\n" +
      s"<< /Length ${content.length} >>\nstream\n").getBytes("ISO-8859-1") ++
      content ++ "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    val info = Pdf.extractText(pdf)
    assert(info.text == "ABA\n\tC" && info.n_pages == 1L)
  }

  test("unsupported filter extracts empty text, not garbage; corrupt blobs throw") {
    val body = Array[Byte](1, 2, 3, 4)
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ body ++ "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf).text == "")
    intercept[Exception](Pdf.extractText("not a pdf at all".getBytes("ISO-8859-1")))
    // truncated Flate stream inside a real header also throws (→ quarantine)
    val good = Pdf.encodePdf(Seq(Seq("alpha beta gamma delta epsilon zeta")), compress = true)
    intercept[Exception](Pdf.extractText(good.take(good.length - 40) ++
      "endstream\n%%EOF".getBytes("ISO-8859-1")))
  }

  test("mixed filters: a neighboring object's /FlateDecode is not misattributed") {
    // Flate text stream immediately followed by an UNCOMPRESSED one —
    // the second stream's dict region must not inherit the first's
    // /Filter (that would inflate plain text and falsely quarantine)
    val z = Pdf.deflate("BT (first line) Tj ET".getBytes("ISO-8859-1"))
    val plain = "BT (second line) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n" +
      s"2 0 obj\n<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n").getBytes("ISO-8859-1") ++
      z ++ ("\nendstream\nendobj\n" +
      s"3 0 obj\n<< /Length ${plain.length} >>\nstream\n$plain\nendstream\nendobj\n%%EOF")
        .getBytes("ISO-8859-1")
    val info = Pdf.extractText(pdf)
    assert(info.text == "first line\nsecond line" && info.n_pages == 1L)
  }

  test("PDF 1.5 object streams: packed page dicts count as pages, never as text") {
    // two page dicts packed in a compressed ObjStm + one content stream
    val packed = Pdf.deflate(
      ("4 0 5 40 << /Type /Page /Contents 6 0 R >> " +
        "<< /Type /Page /Contents 6 0 R >>").getBytes("ISO-8859-1"))
    val content = "BT (packed pages) Tj ET"
    val pdf = ("%PDF-1.5\n" +
      s"3 0 obj\n<< /Type /ObjStm /N 2 /Length ${packed.length} /Filter /FlateDecode >>\nstream\n")
      .getBytes("ISO-8859-1") ++ packed ++
      ("\nendstream\nendobj\n" +
        s"6 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n%%EOF")
        .getBytes("ISO-8859-1")
    val info = Pdf.extractText(pdf)
    assert(info.n_pages == 2L, s"got ${info.n_pages}")
    assert(info.text == "packed pages")
  }

  test("an indirect /Length reference falls back to the endstream scan") {
    val content = "BT (hello world) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n2 0 obj\n" +
      s"<< /Length 9 0 R >>\nstream\n$content\nendstream\nendobj\n%%EOF")
      .getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf).text == "hello world")
  }

  test("extract op: decodes per row, quarantines corrupt blobs as format=corrupt") {
    val rows = Seq(
      (1L, Pdf.encodePdf(Seq(Seq("one two", "three")), compress = false)),
      (2L, Pdf.encodePdf(Seq(Seq("four"), Seq("five six")), compress = true)),
      (3L, "garbage".getBytes("ISO-8859-1")))
    val out = Pdf.extract(rows.toDF("doc_id", "content"), "doc_id", "content")
      .select("doc_id", "format", "n_pages", "text", "n_chars")
      .as[(Long, String, Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "pdf", 1L, "one two\nthree", 13L),
      (2L, "pdf", 2L, "four\nfive six", 13L),
      (3L, "corrupt", 0L, "", 0L)))
  }

  test("extract op: a null id names the column instead of an opaque executor NPE") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = true),
      StructField("content", BinaryType)))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(null, Pdf.encodePdf(Seq(Seq("one")), compress = false))), schema)
    val e = intercept[Exception] {
      Pdf.extract(df, "doc_id", "content").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("null id in column 'doc_id'"), msgs)
  }
}
