package graft.connectors.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.SerializableWritable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.StateStore

/** One parsed WARC record (or a quarantine row: `error` non-null, all
  * record fields null — a corrupt/truncated member cannot be resynced
  * inside a gzip stream, so the REMAINDER of that file is quarantined
  * while every record parsed before the fault is kept).
  */
final case class WarcRecord(
    warc_file: String,
    rec_index: Long,
    warc_type: String,
    url: String,
    warc_date: String,
    mime: String,
    payload: Array[Byte],
    error: String,
)

/** WARC/WET container source — the format web-scale text corpora
  * actually ship in (ISO 28500 WARC 1.0; CommonCrawl's convention of one
  * gzip MEMBER per record, concatenated). This is the day-one container
  * a 100 TB text pipeline reads in front of the crawl surface the engine
  * already has: [[Warc.read]] → [[graft.ops.Html.extract]] →
  * [[graft.ops.Url.canonicalize]] → frontier/dedup. Reference analog:
  * the filesystem source's reader-per-format seam
  * (sources/filesystem/__init__.py:77-133) and the unstructured-data
  * source's raw-payload-to-text step
  * (sources/unstructured_data/__init__.py:19-103).
  *
  * Scale posture: gzip is not splittable, so the unit of parallelism is
  * the FILE — CommonCrawl ships ~1 GB segments by the thousands, which
  * is exactly one task each. The parser is a streaming iterator over the
  * inflate stream (O(record) memory, never O(file) — why this is not
  * Spark's `binaryFile` source, which materializes whole files as rows),
  * records flow straight into the scan stage via `flatMap`, and the
  * heavy `payload` column is pruned before any shuffle by the usual
  * column-pruning rules. JDK-only: `GZIPInputStream` reads concatenated
  * members natively; its mid-member EOF/ZipException failure modes map
  * to the quarantine row (same discipline as
  * [[graft.connectors.rest.Transport]]'s truncation defense and
  * [[graft.ops.Pdf]]'s corrupt-slice quarantine).
  */
object Warc {

  // ------------------------------------------------------------- parse

  /** Read a CRLF- (or LF-) terminated ASCII line from a binary stream
    * without over-reading — the payload that follows is binary, so a
    * Reader's internal buffering would corrupt the record framing.
    */
  private def readLine(in: InputStream): String = {
    val buf = new ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { buf.write(b); b = in.read() }
    val bytes = buf.toByteArray
    val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r') bytes.length - 1 else bytes.length
    new String(bytes, 0, n, StandardCharsets.UTF_8)
  }

  /** Streaming record iterator over one (possibly multi-member-gzip)
    * WARC stream. Lazy: one record in memory at a time. On ANY fault —
    * truncated member, corrupt inflate, malformed framing — emits a
    * single quarantine row and stops the file (records already yielded
    * are kept; there is no reliable resync point inside gzip).
    */
  private[sources] def parseStream(raw: InputStream, file: String, gzipped: Boolean): Iterator[WarcRecord] =
    new Iterator[WarcRecord] {
      private var in: InputStream = _
      private var idx = 0L
      private var finished = false
      private var pending: WarcRecord = _

      private def quarantine(e: Exception): WarcRecord =
        WarcRecord(file, idx, null, null, null, null, null,
          s"${e.getClass.getSimpleName}: ${e.getMessage}")

      private def closeQuietly(): Unit =
        try { if (in != null) in.close() else raw.close() } catch { case _: Exception => () }

      private def advance(): Unit = {
        if (pending != null || finished) return
        try {
          if (in == null)
            in = new BufferedInputStream(if (gzipped) new GZIPInputStream(raw) else raw, 1 << 16)
          // skip inter-record blank lines (record trailer is CRLF CRLF)
          var line = readLine(in)
          while (line != null && line.isEmpty) line = readLine(in)
          if (line == null) { finished = true; closeQuietly(); return }
          if (!line.startsWith("WARC/"))
            throw new EOFException(s"expected WARC/ version line, got '${line.take(60)}'")
          val headers = scala.collection.mutable.Map[String, String]()
          var h = readLine(in)
          while (h != null && h.nonEmpty) {
            val c = h.indexOf(':')
            if (c > 0) headers(h.substring(0, c).trim.toLowerCase) = h.substring(c + 1).trim
            h = readLine(in)
          }
          val len = headers.get("content-length").flatMap(_.toLongOption)
            .getOrElse(throw new EOFException("record missing Content-Length"))
          if (len > Int.MaxValue - 8)
            throw new EOFException(s"record payload too large: $len bytes")
          val payload = in.readNBytes(len.toInt)
          if (payload.length < len)
            throw new EOFException(s"payload truncated: ${payload.length} of $len bytes")
          pending = WarcRecord(file, idx,
            headers.getOrElse("warc-type", ""),
            headers.getOrElse("warc-target-uri", null),
            headers.getOrElse("warc-date", null),
            headers.getOrElse("content-type", null),
            payload, null)
          idx += 1
        } catch {
          case e: Exception =>
            pending = quarantine(e)
            finished = true
            closeQuietly()
        }
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): WarcRecord = {
        advance()
        if (pending == null) throw new NoSuchElementException("end of WARC stream")
        val r = pending; pending = null; r
      }
    }

  /** Read WARC/WET files as a DataFrame, ONE INPUT PARTITION PER FILE
    * (gzip is unsplittable; files are the parallel unit). Columns:
    * `warc_file, rec_index, warc_type, url, warc_date, mime, payload
    * (binary), error` — quarantine rows carry `error` non-null. The
    * Hadoop conf is shipped via broadcast so schemes beyond `file://`
    * resolve with the session's credentials on executors.
    */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "Warc.read needs at least one file")
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new SerializableWritable(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(spark.sparkContext.parallelize(paths, paths.size))
      .mapPartitions { it =>
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(conf.value.value)
          parseStream(fs.open(hp), p, p.endsWith(".gz"))
        }
      }
      .toDF()
  }

  /** Incremental file-level read via the shared seen-file state
    * ([[FilesystemSource]]'s pattern, key-compatible): list the dir,
    * read ONLY files not in the committed seen set, return the frame and
    * the new full list to commit after a successful load
    * ([[FilesystemSource.commitSeen]]).
    */
  def readNew(spark: SparkSession, name: String, dir: String, state: StateStore,
      suffix: String = ".warc.gz"): (Option[DataFrame], Seq[String]) = {
    val all = FilesystemSource.listFiles(spark, dir, suffix)
    val seen = state.getList(FilesystemSource.seenKey(name)).toSet
    val fresh = all.filterNot(seen)
    (if (fresh.isEmpty) None else Some(read(spark, fresh)), all)
  }

  /** HTTP response payload → body (the bytes after the first blank
    * line), as a codegen'd column over the UTF-8 view — for `response`
    * records whose payload is `application/http; msgtype=response`.
    * Payloads without an HTTP header block pass through whole (WET
    * `conversion` records are already bare text).
    */
  def httpBody(payload: Column): Column = {
    val s = payload.cast("string")
    val i = locate("\r\n\r\n", s)
    when(i === 0, s).otherwise(s.substr(i + lit(4), length(s)))
  }

  // ------------------------------------------------------------ encode

  /** Encode one WARC record (headers + payload + CRLF CRLF trailer). */
  def encodeRecord(warcType: String, url: String, date: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $warcType\r\n"
    if (url != null) h ++= s"WARC-Target-URI: $url\r\n"
    if (date != null) h ++= s"WARC-Date: $date\r\n"
    if (contentType != null) h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${payload.length}\r\n\r\n"
    h.toString.getBytes(StandardCharsets.ISO_8859_1) ++ payload ++
      "\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1)
  }

  /** One gzip member per record — the record-at-time compression
    * convention that makes a WARC seekable by member offset.
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(out)
    try gz.write(record) finally gz.close()
    out.toByteArray
  }

  /** Concatenate records into one container: per-record gzip members
    * (`.warc.gz`) or raw (`.warc`).
    */
  def encodeFile(records: Seq[Array[Byte]], gzipPerRecord: Boolean = true): Array[Byte] =
    if (gzipPerRecord) records.iterator.map(gzipMember).reduce(_ ++ _)
    else records.reduce(_ ++ _)

  /** A minimal HTTP/1.1 200 response wrapper for `response` payloads. */
  def httpResponse(body: Array[Byte], contentType: String = "text/html"): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes(StandardCharsets.ISO_8859_1) ++ body
}
