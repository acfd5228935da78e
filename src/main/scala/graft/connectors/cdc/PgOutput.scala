package graft.connectors.cdc

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** Decoder for the pgoutput logical-replication binary format (grammar from
  * the public PostgreSQL docs, "Logical Streaming Replication Protocol",
  * message formats §55.5 / protocol 3.x; the reference implements the same
  * frame grammar in sources/pg_replication/decoders.py:62-428).
  *
  * Scope: Begin/Commit transaction framing, Relation schema frames, and
  * Insert/Update/Delete tuples with 'n'/'u'/'t' tuple-data kinds. Column
  * values arrive in the text output format; typed conversion happens at
  * the DataFrame layer (ChangeBatch) so the decode stays allocation-lean.
  */
object PgOutput {

  /** Microseconds between 2000-01-01 (postgres epoch) and 1970-01-01. */
  val PgEpochOffsetMicros: Long = 946684800000000L

  final case class ColumnMeta(name: String, typeOid: Int, typeMod: Int, isKey: Boolean)
  final case class RelationMeta(relationId: Int, namespace: String, name: String,
      replicaIdentity: Char, columns: Seq[ColumnMeta])

  /** One decoded column value: None = SQL NULL; `unchangedToast` marks 'u'
    * kinds (value not sent — key-only deletes and untouched TOAST columns,
    * reference handling at sources/pg_replication/schema_types.py:123-140).
    */
  final case class TupleValue(value: Option[String], unchangedToast: Boolean = false)

  sealed trait Message
  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Int) extends Message
  final case class Commit(commitLsn: Long, endLsn: Long, commitTsMicros: Long) extends Message
  final case class Relation(meta: RelationMeta) extends Message
  final case class Insert(relationId: Int, row: Seq[TupleValue]) extends Message
  final case class Update(relationId: Int, oldRow: Option[Seq[TupleValue]], newRow: Seq[TupleValue]) extends Message
  final case class Delete(relationId: Int, keyRow: Seq[TupleValue]) extends Message
  final case class Truncate(relationIds: Seq[Int]) extends Message
  /** Protocol v2 streamed-transaction framing: a large in-progress txn
    * arrives as segments (StreamStart..StreamStop) and resolves with
    * StreamCommit or StreamAbort ("Logical Streaming Replication Protocol",
    * protocol version 2 message formats).
    */
  final case class StreamStart(xid: Int, firstSegment: Boolean) extends Message
  case object StreamStop extends Message
  final case class StreamCommit(xid: Int, commitLsn: Long, endLsn: Long, commitTsMicros: Long) extends Message
  /** subXid == xid aborts the whole transaction; otherwise just that
    * subtransaction's changes.
    */
  final case class StreamAbort(xid: Int, subXid: Int) extends Message
  /** A DML/Relation message inside a streamed transaction: the wire format
    * prefixes the body with the (sub)transaction xid that produced it.
    */
  final case class Streamed(xid: Int, inner: Message) extends Message
  /** Replication-origin marker — decoded (so the stream position advances
    * correctly) and skipped by the consumer, like the reference.
    */
  final case class Origin(commitLsn: Long, name: String) extends Message
  /** Type metadata for a custom type OID; the text output format makes it
    * informational only.
    */
  final case class TypeInfo(typeOid: Int, namespace: String, name: String) extends Message
  /** `pg_logical_emit_message` payload (transactional when flag bit 0). */
  final case class LogicalMessage(transactional: Boolean, lsn: Long, prefix: String,
      content: Array[Byte]) extends Message
  final case class Unknown(tag: Char) extends Message

  /** `inStream` = between StreamStart and StreamStop: v2 prefixes R/I/U/D/T
    * bodies with an Int32 xid there (and only there).
    */
  def decode(frame: Array[Byte], inStream: Boolean = false): Message = {
    val buf = ByteBuffer.wrap(frame)
    val tag = buf.get().toChar
    tag match {
      case 'S' => StreamStart(buf.getInt, buf.get() == 1)
      case 'E' => StreamStop
      case 'c' =>
        // wire order is Int32 xid THEN Int8 flags (logicalrep_write_stream_commit;
        // "Stream Commit" in the protocol docs) — the reverse order would
        // garble the xid and orphan the buffered transaction
        val xid = buf.getInt
        buf.get() // flags (unused, must be 0)
        StreamCommit(xid, buf.getLong, buf.getLong, buf.getLong + PgEpochOffsetMicros)
      case 'A' => StreamAbort(buf.getInt, buf.getInt)
      case 'R' | 'I' | 'U' | 'D' | 'T' | 'M' if inStream =>
        val xid = buf.getInt
        Streamed(xid, decodeBody(tag, buf))
      case _ => decodeBody(tag, buf)
    }
  }

  private def decodeBody(tag: Char, buf: ByteBuffer): Message =
    (tag: @unchecked) match {
      case 'B' => Begin(buf.getLong, buf.getLong + PgEpochOffsetMicros, buf.getInt)
      case 'C' =>
        buf.get() // flags (unused, must be 0)
        Commit(buf.getLong, buf.getLong, buf.getLong + PgEpochOffsetMicros)
      case 'R' =>
        val relId = buf.getInt
        val ns = cstring(buf)
        val name = cstring(buf)
        val ident = buf.get().toChar
        val ncols = buf.getShort.toInt
        val cols = (0 until ncols).map { _ =>
          val flags = buf.get()
          ColumnMeta(cstring(buf), buf.getInt, buf.getInt, (flags & 1) == 1)
        }
        Relation(RelationMeta(relId, ns, name, ident, cols))
      case 'I' =>
        val relId = buf.getInt
        require(buf.get().toChar == 'N', "insert must carry a new tuple")
        Insert(relId, tupleData(buf))
      case 'U' =>
        val relId = buf.getInt
        var marker = buf.get().toChar
        val old = if (marker == 'K' || marker == 'O') {
          val t = tupleData(buf); marker = buf.get().toChar; Some(t)
        } else None
        require(marker == 'N', s"update missing new tuple (got $marker)")
        Update(relId, old, tupleData(buf))
      case 'D' =>
        val relId = buf.getInt
        val kind = buf.get().toChar
        require(kind == 'K' || kind == 'O', s"delete tuple kind $kind")
        Delete(relId, tupleData(buf))
      case 'T' =>
        val n = buf.getInt
        buf.get() // options
        Truncate((0 until n).map(_ => buf.getInt))
      case 'O' => Origin(buf.getLong, cstring(buf))
      case 'Y' => TypeInfo(buf.getInt, cstring(buf), cstring(buf))
      case 'M' =>
        val transactional = (buf.get() & 1) == 1
        val lsn = buf.getLong
        val prefix = cstring(buf)
        val content = new Array[Byte](buf.getInt)
        buf.get(content)
        LogicalMessage(transactional, lsn, prefix, content)
      case other => Unknown(other)
    }

  private def tupleData(buf: ByteBuffer): Seq[TupleValue] = {
    val n = buf.getShort.toInt
    (0 until n).map { _ =>
      buf.get().toChar match {
        case 'n' => TupleValue(None)
        case 'u' => TupleValue(None, unchangedToast = true)
        case 't' =>
          val len = buf.getInt
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          TupleValue(Some(new String(bytes, StandardCharsets.UTF_8)))
        case other => throw new IllegalArgumentException(s"tuple kind $other")
      }
    }
  }

  private def cstring(buf: ByteBuffer): String = {
    // collect raw bytes to the NUL, then decode as UTF-8: per-byte toChar
    // would mangle multi-byte identifiers (and sign-extend bytes >= 0x80)
    val start = buf.position()
    while (buf.get() != 0) {}
    val bytes = new Array[Byte](buf.position() - start - 1)
    val end = buf.position()
    buf.position(start); buf.get(bytes); buf.position(end)
    new String(bytes, StandardCharsets.UTF_8)
  }

  // -------------------------------------------------------- encode (tests)

  /** Frame encoders — used by specs and the synthetic-CDC harness to build
    * protocol-exact batches without a live postgres.
    */
  object Encode {
    private def buffer(size: Int = 8192) = ByteBuffer.allocate(size)
    private def finish(b: ByteBuffer): Array[Byte] = {
      val out = new Array[Byte](b.position()); b.flip(); b.get(out); out
    }
    private def putCString(b: ByteBuffer, s: String): Unit = {
      b.put(s.getBytes(StandardCharsets.UTF_8)); b.put(0.toByte)
    }
    private def putTuple(b: ByteBuffer, row: Seq[Option[String]]): Unit =
      putTupleFull(b, row.map(v => TupleValue(v)))

    private def putTupleFull(b: ByteBuffer, row: Seq[TupleValue]): Unit = {
      b.putShort(row.size.toShort)
      row.foreach {
        case TupleValue(_, true) => b.put('u'.toByte)
        case TupleValue(None, _) => b.put('n'.toByte)
        case TupleValue(Some(v), _) =>
          val bytes = v.getBytes(StandardCharsets.UTF_8)
          b.put('t'.toByte); b.putInt(bytes.length); b.put(bytes)
      }
    }

    def begin(finalLsn: Long, commitTsMicros: Long, xid: Int): Array[Byte] = {
      val b = buffer(); b.put('B'.toByte); b.putLong(finalLsn)
      b.putLong(commitTsMicros - PgEpochOffsetMicros); b.putInt(xid); finish(b)
    }
    def commit(commitLsn: Long, endLsn: Long, commitTsMicros: Long): Array[Byte] = {
      val b = buffer(); b.put('C'.toByte); b.put(0.toByte); b.putLong(commitLsn)
      b.putLong(endLsn); b.putLong(commitTsMicros - PgEpochOffsetMicros); finish(b)
    }
    def relation(meta: RelationMeta): Array[Byte] = {
      val b = buffer(); b.put('R'.toByte); b.putInt(meta.relationId)
      putCString(b, meta.namespace); putCString(b, meta.name)
      b.put(meta.replicaIdentity.toByte); b.putShort(meta.columns.size.toShort)
      meta.columns.foreach { c =>
        b.put((if (c.isKey) 1 else 0).toByte); putCString(b, c.name)
        b.putInt(c.typeOid); b.putInt(c.typeMod)
      }
      finish(b)
    }
    def insert(relId: Int, row: Seq[Option[String]]): Array[Byte] = {
      val b = buffer(); b.put('I'.toByte); b.putInt(relId); b.put('N'.toByte)
      putTuple(b, row); finish(b)
    }
    def update(relId: Int, row: Seq[Option[String]]): Array[Byte] = {
      val b = buffer(); b.put('U'.toByte); b.putInt(relId); b.put('N'.toByte)
      putTuple(b, row); finish(b)
    }
    /** Update with explicit tuple kinds — 'u' marks unchanged TOAST. */
    def updateToast(relId: Int, row: Seq[TupleValue]): Array[Byte] = {
      val b = buffer(); b.put('U'.toByte); b.putInt(relId); b.put('N'.toByte)
      putTupleFull(b, row); finish(b)
    }
    def delete(relId: Int, keyRow: Seq[Option[String]]): Array[Byte] = {
      val b = buffer(); b.put('D'.toByte); b.putInt(relId); b.put('K'.toByte)
      putTuple(b, keyRow); finish(b)
    }
    def truncate(relIds: Seq[Int]): Array[Byte] = {
      val b = buffer(); b.put('T'.toByte); b.putInt(relIds.size); b.put(0.toByte)
      relIds.foreach(b.putInt); finish(b)
    }

    def origin(commitLsn: Long, name: String): Array[Byte] = {
      val b = buffer(); b.put('O'.toByte); b.putLong(commitLsn); putCString(b, name); finish(b)
    }
    def typeInfo(oid: Int, namespace: String, name: String): Array[Byte] = {
      val b = buffer(); b.put('Y'.toByte); b.putInt(oid)
      putCString(b, namespace); putCString(b, name); finish(b)
    }
    def logicalMessage(transactional: Boolean, lsn: Long, prefix: String, content: Array[Byte]): Array[Byte] = {
      val b = buffer(); b.put('M'.toByte); b.put((if (transactional) 1 else 0).toByte)
      b.putLong(lsn); putCString(b, prefix); b.putInt(content.length); b.put(content); finish(b)
    }

    // ------------------------------------------- v2 streamed transactions

    def streamStart(xid: Int, firstSegment: Boolean = true): Array[Byte] = {
      val b = buffer(); b.put('S'.toByte); b.putInt(xid)
      b.put((if (firstSegment) 1 else 0).toByte); finish(b)
    }
    def streamStop(): Array[Byte] = {
      val b = buffer(); b.put('E'.toByte); finish(b)
    }
    def streamCommit(xid: Int, commitLsn: Long, endLsn: Long, commitTsMicros: Long): Array[Byte] = {
      val b = buffer(); b.put('c'.toByte); b.putInt(xid); b.put(0.toByte)
      b.putLong(commitLsn); b.putLong(endLsn)
      b.putLong(commitTsMicros - PgEpochOffsetMicros); finish(b)
    }
    def streamAbort(xid: Int, subXid: Int): Array[Byte] = {
      val b = buffer(); b.put('A'.toByte); b.putInt(xid); b.putInt(subXid); finish(b)
    }
    /** Wrap a non-stream DML/Relation frame in the in-stream form: tag,
      * Int32 xid, then the original body.
      */
    def streamed(xid: Int, frame: Array[Byte]): Array[Byte] = {
      val b = buffer(frame.length + 5)
      b.put(frame(0)); b.putInt(xid); b.put(frame, 1, frame.length - 1); finish(b)
    }
  }
}
