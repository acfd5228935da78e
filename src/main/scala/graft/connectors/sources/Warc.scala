package graft.connectors.sources

import java.io.{BufferedInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

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
  * column-pruning rules. JDK-only: concatenated members are inflated by
  * [[MultiMemberGzipInputStream]] (hand-parsed RFC 1952 framing —
  * unlike JDK `GZIPInputStream`, whose readTrailer silently swallows a
  * malformed or short next-member header as clean EOF, ANY trailing
  * bytes that do not begin a complete valid member raise IOException);
  * every framing/inflate/CRC failure mode maps to the quarantine row
  * (same discipline as [[graft.connectors.rest.Transport]]'s truncation
  * defense and [[graft.ops.Pdf]]'s corrupt-slice quarantine).
  */
object Warc {

  /** Exact multi-member gzip inflate (RFC 1952). The JDK's
    * `GZIPInputStream` handles concatenated members but treats any
    * IOException while peeking the NEXT member's header as clean EOF —
    * so a container truncated to fewer bytes than a gzip header
    * (~10 B) past its last complete member reads clean, violating the
    * "quarantine on ANY fault" contract. This stream parses the framing
    * itself: per member it validates the header (magic/method, skips
    * FEXTRA/FNAME/FCOMMENT/FHCRC fields), inflates with a raw
    * `Inflater(nowrap)`, and verifies the trailer's CRC32 and ISIZE;
    * at a member boundary either the stream ends exactly (clean EOF) or
    * a full valid next header must follow — anything else throws.
    */
  private[sources] final class MultiMemberGzipInputStream(rawIn: InputStream) extends InputStream {
    private val in = new BufferedInputStream(rawIn, 1 << 16)
    private val inf = new java.util.zip.Inflater(true)
    private val crc = new java.util.zip.CRC32
    private val buf = new Array[Byte](8192)
    // buf[lo, hi) = bytes read from `in` but not yet consumed (they are
    // either ahead of the inflater or left over after it finished)
    private var lo = 0
    private var hi = 0
    private var inMember = false
    private var eos = false
    private var memberBytesOut = 0L

    /** Next raw byte, leftover-first; -1 on end of the underlying stream. */
    private def nextByte(): Int =
      if (lo < hi) { val b = buf(lo) & 0xff; lo += 1; b }
      else in.read()

    private def u8(what: String): Int = {
      val b = nextByte()
      if (b < 0) throw new EOFException(s"gzip member truncated in $what")
      b
    }

    private def u16(what: String): Int = u8(what) | (u8(what) << 8)

    private def u32(what: String): Long =
      (u16(what).toLong) | (u16(what).toLong << 16)

    /** Parse one member header. Returns false on clean EOF at the
      * boundary (no more members); throws on anything else — including
      * trailing bytes too short to be a header.
      */
    private def parseHeader(): Boolean = {
      val b1 = nextByte()
      if (b1 < 0) return false // clean end of the container
      val b2 = nextByte()
      if (b1 != 0x1f || b2 != 0x8b)
        throw new java.io.IOException(
          f"trailing bytes are not a gzip member (got 0x$b1%02x${if (b2 < 0) " then EOF" else f" 0x$b2%02x"})")
      val method = u8("header")
      if (method != 8)
        throw new java.io.IOException(s"unsupported gzip compression method $method")
      val flags = u8("header")
      var i = 0
      while (i < 6) { u8("header"); i += 1 } // MTIME(4) XFL OS
      if ((flags & 4) != 0) { var n = u16("FEXTRA"); while (n > 0) { u8("FEXTRA"); n -= 1 } }
      if ((flags & 8) != 0) while (u8("FNAME") != 0) ()
      if ((flags & 16) != 0) while (u8("FCOMMENT") != 0) ()
      if ((flags & 2) != 0) u16("FHCRC")
      inf.reset(); crc.reset(); memberBytesOut = 0L
      // hand any remaining leftover straight to the inflater; `hi` stays
      // the region end so readTrailer can reclaim the unconsumed tail
      // (buf[hi - remaining, hi)) when this member finishes
      inf.setInput(buf, lo, hi - lo)
      lo = hi
      inMember = true
      true
    }

    private def readTrailer(): Unit = {
      // reclaim bytes the inflater over-read past the deflate stream
      val rem = inf.getRemaining
      lo = hi - rem
      val expectCrc = u32("trailer")
      val expectLen = u32("trailer")
      if (expectCrc != crc.getValue)
        throw new java.io.IOException(
          f"gzip member CRC mismatch: expected 0x$expectCrc%08x, got 0x${crc.getValue}%08x")
      if (expectLen != (memberBytesOut & 0xffffffffL))
        throw new java.io.IOException(
          s"gzip member ISIZE mismatch: expected $expectLen, inflated $memberBytesOut")
      inMember = false
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n < 0) -1 else one(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      while (true) {
        if (eos) return -1
        if (!inMember) {
          if (!parseHeader()) { eos = true; return -1 }
        }
        val n = inf.inflate(b, off, len)
        if (n > 0) {
          crc.update(b, off, n); memberBytesOut += n
          // verify the trailer EAGERLY, before handing over the member's
          // final bytes: a CRC/ISIZE mismatch must fault the read that
          // delivers the corrupt data, not a later read that happens to
          // cross the member boundary
          if (inf.finished()) readTrailer()
          return n
        }
        if (inf.finished()) readTrailer()
        else if (inf.needsInput()) {
          val k = in.read(buf)
          if (k < 0) throw new EOFException("gzip member truncated mid-deflate")
          inf.setInput(buf, 0, k)
          lo = k; hi = k // region end = k, so readTrailer reclaims buf[k - remaining, k)
        } else throw new java.io.IOException("gzip member needs a preset dictionary")
      }
      -1 // unreachable
    }

    override def close(): Unit = { inf.end(); in.close() }
  }

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
  private[sources] def parseStream(raw: InputStream, file: String, gzipped: Boolean,
      /** Invoked with the WRAPPING stream when it is built: early-stop
        * cleanup must close the wrapper (ending the gzip Inflater's
        * native state), not just the raw fd.
        */
      onStream: InputStream => Unit = _ => ()): Iterator[WarcRecord] =
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
          if (in == null) {
            in = new BufferedInputStream(
              if (gzipped) new MultiMemberGzipInputStream(raw) else raw, 1 << 16)
            onStream(in)
          }
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
        // the record iterator closes its stream on exhaustion or fault,
        // but a consumer that stops EARLY (limit/take/first) abandons it
        // mid-file — in a long-lived executor that leaks the open Hadoop
        // input stream AND the gzip Inflater's native zlib state, so the
        // task-completion listener closes whatever stream is current when
        // the task ends. `current` is upgraded from the raw fd to the
        // WRAPPING stream once parseStream builds it: closing the wrapper
        // chains to Inflater.end() + the fd; closing only the fd would
        // leave the native inflate buffers to GC finalization
        var current: InputStream = null
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (current != null) try current.close() catch { case _: Exception => () }
        }
        it.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(conf.value.value)
          val stream = fs.open(hp)
          current = stream
          parseStream(stream, p, p.endsWith(".gz"), onStream = s => current = s)
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
