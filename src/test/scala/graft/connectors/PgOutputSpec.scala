package graft.connectors.cdc

import graft.SparkTestBase
import graft.core.MergeEngine
import PgOutput._

class PgOutputSpec extends SparkTestBase {
  import spark.implicits._

  private val rel = RelationMeta(1001, "public", "accounts", 'd', Seq(
    ColumnMeta("id", 20, -1, isKey = true),
    ColumnMeta("name", 25, -1, isKey = false),
    ColumnMeta("balance", 701, -1, isKey = false),
    ColumnMeta("active", 16, -1, isKey = false),
  ))

  private val ts0 = 1700000000000000L // µs

  test("frame round-trip: relation, insert, update, delete, begin/commit") {
    assert(decode(Encode.relation(rel)) == Relation(rel))
    assert(decode(Encode.insert(1001, Seq(Some("1"), Some("alice"), Some("10.5"), Some("t"))))
      == Insert(1001, Seq(TupleValue(Some("1")), TupleValue(Some("alice")), TupleValue(Some("10.5")), TupleValue(Some("t")))))
    assert(decode(Encode.delete(1001, Seq(Some("1"), None, None, None)))
      == Delete(1001, Seq(TupleValue(Some("1")), TupleValue(None), TupleValue(None), TupleValue(None))))
    decode(Encode.begin(500L, ts0, 42)) match {
      case Begin(lsn, ts, xid) => assert(lsn == 500L && ts == ts0 && xid == 42)
      case other               => fail(s"$other")
    }
    decode(Encode.commit(500L, 501L, ts0)) match {
      case Commit(c, e, ts) => assert(c == 500L && e == 501L && ts == ts0)
      case other            => fail(s"$other")
    }
  }

  private def txn(lsnStart: Long, frames: (Long, Array[Byte])*): Seq[(Long, Array[Byte])] =
    Seq((lsnStart, Encode.begin(lsnStart + frames.size + 1, ts0, 1))) ++ frames ++
      Seq((lsnStart + frames.size + 1, Encode.commit(lsnStart + frames.size + 1, lsnStart + frames.size + 2, ts0)))

  test("consume honors transaction boundaries and batch size") {
    val frames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L, (11L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t"))))) ++
        txn(20L,
          (21L, Encode.insert(1001, Seq(Some("2"), Some("b"), Some("2.0"), Some("t")))),
          (22L, Encode.insert(1001, Seq(Some("3"), Some("c"), Some("3.0"), Some("t")))))

    // target 2 is hit mid-second-txn: the whole txn is still included
    val res = ChangeBatch.consume(frames.iterator, targetBatchSize = 2)
    assert(res.batch.changes.size == 3)
    assert(res.lastCommitLsn.contains(24L))

    // an open (uncommitted) transaction is not emitted
    val open = Seq((1L, Encode.relation(rel)), (2L, Encode.begin(9L, ts0, 7)),
      (3L, Encode.insert(1001, Seq(Some("9"), Some("z"), Some("0"), Some("f")))))
    val res2 = ChangeBatch.consume(open.iterator)
    assert(res2.batch.changes.isEmpty && res2.lastCommitLsn.isEmpty)
  }

  test("relation redefinition flushes the batch (schema change)") {
    val rel2 = rel.copy(columns = rel.columns :+ ColumnMeta("extra", 25, -1, isKey = false))
    val frames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L, (11L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t"))))) ++
        Seq((15L, Encode.relation(rel2))) ++
        txn(20L, (21L, Encode.insert(1001, Seq(Some("2"), Some("b"), Some("2.0"), Some("t"), Some("x")))))
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.schemaChanged)
    assert(res.batch.changes.size == 1) // only the pre-change txn
  }

  test("CDC end-to-end: decode → typed rows → merge applies upsert + hard delete") {
    val frames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L,
          (11L, Encode.insert(1001, Seq(Some("1"), Some("alice"), Some("10.5"), Some("t")))),
          (12L, Encode.insert(1001, Seq(Some("2"), Some("bob"), Some("7.25"), Some("f"))))) ++
        txn(20L,
          (21L, Encode.update(1001, Seq(Some("1"), Some("alice2"), Some("11.0"), Some("t")))),
          (22L, Encode.delete(1001, Seq(Some("2"), None, None, None))))

    val res = ChangeBatch.consume(frames.iterator)
    val changes = res.batch.byRelation("accounts")
    val raw = ChangeBatch.changeRows(spark, rel, changes)
    val typed = ChangeBatch.toTypedDf(raw, rel)
    assert(typed.schema("id").dataType.typeName == "long")
    assert(typed.schema("active").dataType.typeName == "boolean")

    val merged = MergeEngine.mergePlan(None, typed, ChangeBatch.mergeHints(rel))
    val rows = merged.select("id", "name", "balance").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1L && rows.head.getString(1) == "alice2" && rows.head.getDouble(2) == 11.0)
  }

  test("one stream routes to N relations, each with its own schema and merge hints") {
    val rel2 = RelationMeta(1002, "public", "audit_log", 'd', Seq(
      ColumnMeta("log_id", 20, -1, isKey = true),
      ColumnMeta("note", 25, -1, isKey = false),
    ))
    val frames =
      Seq((1L, Encode.relation(rel)), (2L, Encode.relation(rel2))) ++
        txn(10L,
          (11L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t")))),
          (12L, Encode.insert(1002, Seq(Some("100"), Some("created")))),
          (13L, Encode.insert(1002, Seq(Some("101"), Some("updated")))))
    val res = ChangeBatch.consume(frames.iterator)
    val byRel = res.batch.byRelation
    assert(byRel.keySet == Set("accounts", "audit_log"))
    assert(byRel("audit_log").size == 2)

    // each relation gets typed rows under its own schema + hints
    val audit = ChangeBatch.toTypedDf(
      ChangeBatch.changeRows(spark, rel2, byRel("audit_log")), rel2)
    assert(audit.schema("log_id").dataType.typeName == "long")
    assert(ChangeBatch.mergeHints(rel2).primaryKey == Seq("log_id"))
    assert(audit.count() == 2)
  }

  test("truncate frames surface the relations to clear, txn-aligned") {
    val frames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L, (11L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t"))))) ++
        Seq((20L, Encode.begin(23L, ts0, 9)),
          (21L, Encode.truncate(Seq(1001))),
          (22L, Encode.insert(1001, Seq(Some("2"), Some("b"), Some("2.0"), Some("t")))),
          (23L, Encode.commit(23L, 24L, ts0)))
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.truncatedRelations == Seq("accounts"))
    // the pre-truncate insert (id=1, earlier txn) must NOT survive: the
    // loader clears the table then applies the batch, so re-applying it
    // would resurrect a truncated row. Only the post-truncate insert stays.
    assert(res.batch.changes.map(_.values.head.value.get) == Seq("2"))

    // an uncommitted truncate is NOT surfaced
    val open = Seq((1L, Encode.relation(rel)), (2L, Encode.begin(9L, ts0, 7)),
      (3L, Encode.truncate(Seq(1001))))
    assert(ChangeBatch.consume(open.iterator).truncatedRelations.isEmpty)
  }

  test("truncate mid-txn wipes that txn's earlier rows but keeps other relations") {
    val rel2 = RelationMeta(1002, "public", "audit_log", 'd', Seq(
      ColumnMeta("log_id", 20, -1, isKey = true),
      ColumnMeta("note", 25, -1, isKey = false),
    ))
    val frames =
      Seq((1L, Encode.relation(rel)), (2L, Encode.relation(rel2))) ++
        Seq((20L, Encode.begin(26L, ts0, 9)),
          (21L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t")))),
          (22L, Encode.insert(1002, Seq(Some("100"), Some("kept")))),
          (23L, Encode.truncate(Seq(1001))),
          (24L, Encode.insert(1001, Seq(Some("2"), Some("b"), Some("2.0"), Some("t")))),
          (26L, Encode.commit(26L, 27L, ts0)))
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.truncatedRelations == Seq("accounts"))
    // accounts: only post-truncate id=2; audit_log untouched by the truncate
    assert(res.batch.byRelation("accounts").map(_.values.head.value.get) == Seq("2"))
    assert(res.batch.byRelation("audit_log").map(_.values.head.value.get) == Seq("100"))
  }

  test("unchanged-TOAST columns keep the base value through applyChanges") {
    // base: account 1 with a name; update arrives with name as 'u'
    val baseFrames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L, (11L, Encode.insert(1001, Seq(Some("1"), Some("big-toasty-name"), Some("5.0"), Some("t")))))
    val baseRes = ChangeBatch.consume(baseFrames.iterator)
    val base = ChangeBatch.toTypedDf(
      ChangeBatch.changeRows(spark, rel, baseRes.batch.byRelation("accounts")), rel)
      .drop("_toast_unchanged")
    val baseTable = ChangeBatch.applyChanges(None, base.withColumn("_toast_unchanged",
      org.apache.spark.sql.functions.array()), rel)

    val updFrames =
      Seq((1L, Encode.relation(rel))) ++
        txn(20L, (21L, Encode.updateToast(1001, Seq(
          TupleValue(Some("1")), TupleValue(None, unchangedToast = true),
          TupleValue(Some("9.9")), TupleValue(Some("f"))))))
    val updRes = ChangeBatch.consume(updFrames.iterator)
    val typed = ChangeBatch.toTypedDf(
      ChangeBatch.changeRows(spark, rel, updRes.batch.byRelation("accounts")), rel)
    val merged = ChangeBatch.applyChanges(Some(baseTable), typed, rel)

    val row = merged.select("id", "name", "balance", "active").head()
    assert(row.getString(1) == "big-toasty-name") // kept from base, not nulled
    assert(row.getDouble(2) == 9.9 && !row.getBoolean(3))
  }

  test("applyChanges builds its plan without an eager driver probe job") {
    val baseFrames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L, (11L, Encode.insert(1001, Seq(Some("1"), Some("n"), Some("5.0"), Some("t")))))
    val baseRes = ChangeBatch.consume(baseFrames.iterator)
    val base = ChangeBatch.toTypedDf(
      ChangeBatch.changeRows(spark, rel, baseRes.batch.byRelation("accounts")), rel)
    // jobs started synchronously from this thread inherit the job group —
    // parallel suites in the shared session can't pollute the assertion
    val sc = spark.sparkContext
    sc.setJobGroup("toast-probe-check", "applyChanges must be plan-only", false)
    try ChangeBatch.applyChanges(Some(base.drop("_toast_unchanged")), base, rel)
    finally sc.clearJobGroup()
    assert(sc.statusTracker.getJobIdsForGroup("toast-probe-check").isEmpty)
  }

  test("v2 stream frames round-trip: start/stop/commit/abort and xid-prefixed DML") {
    assert(decode(Encode.streamStart(42)) == StreamStart(42, firstSegment = true))
    assert(decode(Encode.streamStop()) == StreamStop)
    decode(Encode.streamCommit(42, 500L, 501L, ts0)) match {
      case StreamCommit(xid, c, e, ts) => assert(xid == 42 && c == 500L && e == 501L && ts == ts0)
      case other                       => fail(s"$other")
    }
    assert(decode(Encode.streamAbort(42, 43)) == StreamAbort(42, 43))
    val ins = Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t")))
    decode(Encode.streamed(42, ins), inStream = true) match {
      case Streamed(42, Insert(1001, row)) => assert(row.head.value.contains("1"))
      case other                           => fail(s"$other")
    }
    // outside a stream the same tag parses as plain DML (no xid prefix)
    assert(decode(ins).isInstanceOf[Insert])
  }

  test("stream commit decodes a byte-literal frame: Int32 xid before Int8 flags") {
    // Hand-built from the documented layout ("Stream Commit", protocol v2):
    // Byte1('c'), Int32 xid, Int8 flags, Int64 commit LSN, Int64 end LSN,
    // Int64 commit timestamp (µs since the 2000-01-01 postgres epoch).
    // A round-trip with our own encoder can't catch a field-order mistake
    // mirrored on both sides — this literal can.
    val b = java.nio.ByteBuffer.allocate(30)
    b.put('c'.toByte); b.putInt(0xABCD1234); b.put(0.toByte)
    b.putLong(700L); b.putLong(701L); b.putLong(ts0 - PgOutput.PgEpochOffsetMicros)
    val frame = new Array[Byte](b.position()); b.flip(); b.get(frame)
    assert(decode(frame) == StreamCommit(0xABCD1234, 700L, 701L, ts0))
  }

  test("streamed txn: segments accumulate, only StreamCommit emits, abort discards") {
    def ins(id: String) = Encode.insert(1001, Seq(Some(id), Some("x"), Some("1.0"), Some("t")))
    val frames = Seq[(Long, Array[Byte])](
      (1L, Encode.relation(rel)),
      // txn 100 streams two segments interleaved with a normal txn
      (10L, Encode.streamStart(100)),
      (11L, Encode.streamed(100, ins("1"))),
      (12L, Encode.streamStop()),
    ) ++ txn(20L, (21L, ins("50"))) ++ Seq[(Long, Array[Byte])](
      (30L, Encode.streamStart(100, firstSegment = false)),
      (31L, Encode.streamed(100, ins("2"))),
      (32L, Encode.streamStop()),
      // txn 200 streams then ABORTS entirely — nothing may surface
      (40L, Encode.streamStart(200)),
      (41L, Encode.streamed(200, ins("99"))),
      (42L, Encode.streamStop()),
      (43L, Encode.streamAbort(200, 200)),
      (50L, Encode.streamCommit(100, 50L, 51L, ts0)),
    )
    val res = ChangeBatch.consume(frames.iterator)
    // normal txn emitted at its commit; streamed txn 100 at its StreamCommit
    assert(res.batch.changes.map(_.values.head.value.get) == Seq("50", "1", "2"))
    assert(res.batch.changes.filter(_.values.head.value.get != "50").forall(_.commitTsMicros == ts0))
    assert(res.lastCommitLsn.contains(51L))

    // an uncommitted stream at the cut stays pending
    val open = Seq[(Long, Array[Byte])](
      (1L, Encode.relation(rel)),
      (10L, Encode.streamStart(300)), (11L, Encode.streamed(300, ins("7"))), (12L, Encode.streamStop()))
    assert(ChangeBatch.consume(open.iterator).batch.changes.isEmpty)
  }

  test("streamed txn: subtransaction abort drops exactly its changes") {
    def ins(id: String) = Encode.insert(1001, Seq(Some(id), Some("x"), Some("1.0"), Some("t")))
    val frames = Seq[(Long, Array[Byte])](
      (1L, Encode.relation(rel)),
      (10L, Encode.streamStart(100)),
      (11L, Encode.streamed(100, ins("1"))),  // top-level xid
      (12L, Encode.streamed(150, ins("2"))),  // subxact 150 — will abort
      (13L, Encode.streamed(100, ins("3"))),
      (14L, Encode.streamStop()),
      (15L, Encode.streamAbort(100, 150)),
      (16L, Encode.streamCommit(100, 20L, 21L, ts0)),
    )
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.batch.changes.map(_.values.head.value.get) == Seq("1", "3"))
  }

  test("streamed truncate wipes earlier rows in the txn and the batch") {
    def ins(id: String) = Encode.insert(1001, Seq(Some(id), Some("x"), Some("1.0"), Some("t")))
    val frames =
      Seq((1L, Encode.relation(rel))) ++
        txn(5L, (6L, ins("1"))) ++ // earlier committed txn — must be wiped
        Seq[(Long, Array[Byte])](
          (10L, Encode.streamStart(100)),
          (11L, Encode.streamed(100, ins("2"))), // pre-truncate in-txn — wiped
          (12L, Encode.streamed(100, Encode.truncate(Seq(1001)))),
          (13L, Encode.streamed(100, ins("3"))), // post-truncate — survives
          (14L, Encode.streamStop()),
          (15L, Encode.streamCommit(100, 20L, 21L, ts0)),
        )
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.truncatedRelations == Seq("accounts"))
    assert(res.batch.changes.map(_.values.head.value.get) == Seq("3"))
  }

  test("origin/type/message frames decode and the consumer skips them") {
    assert(decode(Encode.origin(77L, "primary")) == Origin(77L, "primary"))
    assert(decode(Encode.typeInfo(50000, "public", "mood")) == TypeInfo(50000, "public", "mood"))
    decode(Encode.logicalMessage(transactional = true, 9L, "app", "hi".getBytes)) match {
      case LogicalMessage(true, 9L, "app", c) => assert(new String(c) == "hi")
      case other                              => fail(s"$other")
    }
    // interleaved in a txn, they change nothing about the emitted batch
    val frames =
      Seq((1L, Encode.relation(rel)), (2L, Encode.origin(0L, "primary"))) ++
        txn(10L,
          (11L, Encode.insert(1001, Seq(Some("1"), Some("a"), Some("1.0"), Some("t")))),
          (12L, Encode.logicalMessage(transactional = true, 12L, "app", "x".getBytes)))
    val res = ChangeBatch.consume(frames.iterator)
    assert(res.batch.changes.size == 1)
  }

  test("snapshot bootstrap applies only changes past the boundary LSN") {
    // snapshot state (as of lsn 20): accounts 1=alice, 2=bob
    val snapFrames =
      Seq((1L, Encode.relation(rel))) ++
        txn(10L,
          (11L, Encode.insert(1001, Seq(Some("1"), Some("alice"), Some("1.0"), Some("t")))),
          (12L, Encode.insert(1001, Seq(Some("2"), Some("bob"), Some("2.0"), Some("t")))))
    val snapRes = ChangeBatch.consume(snapFrames.iterator)
    val snapshot = ChangeBatch.applyChanges(None,
      ChangeBatch.toTypedDf(
        ChangeBatch.changeRows(spark, rel, snapRes.batch.byRelation("accounts")), rel), rel)

    // the replayed archive contains PRE-boundary frames (already in the
    // snapshot — the delete at lsn 15 must NOT erase bob) and post-boundary
    // ones (the update at lsn 30 must apply)
    val archive =
      Seq((1L, Encode.relation(rel))) ++
        txn(14L, (15L, Encode.delete(1001, Seq(Some("2"), None, None, None)))) ++
        txn(29L, (30L, Encode.update(1001, Seq(Some("1"), Some("alice2"), Some("9.0"), Some("t")))))
    val (merged, res) = ChangeBatch.bootstrap(spark, snapshot, rel, archive.iterator, snapshotLsn = 20L)
    val rows = merged.select("id", "name").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "alice2", 2L -> "bob"))
    assert(res.lastCommitLsn.contains(32L))
  }

  test("non-ASCII identifiers round-trip through relation frames") {
    val intl = RelationMeta(8, "öffentlich", "ordres_commandés", 'd', Seq(
      ColumnMeta("идентификатор", 20, -1, isKey = true),
      ColumnMeta("名前", 25, -1, isKey = false),
    ))
    assert(decode(Encode.relation(intl)) == Relation(intl))
  }

  test("bytea and numeric text formats convert") {
    val r = RelationMeta(7, "public", "blobs", 'd', Seq(
      ColumnMeta("id", 20, -1, isKey = true),
      ColumnMeta("payload", 17, -1, isKey = false),
      ColumnMeta("amount", 1700, -1, isKey = false),
    ))
    val ch = Seq(ChangeBatch.Change(r, 1L, ts0, deleted = false,
      Seq(TupleValue(Some("5")), TupleValue(Some("\\x68690a")), TupleValue(Some("12.345")))))
    val typed = ChangeBatch.toTypedDf(ChangeBatch.changeRows(spark, r, ch), r)
    val row = typed.head()
    assert(new String(row.getAs[Array[Byte]]("payload"), "UTF-8") == "hi\n")
    assert(row.getDecimal(2).compareTo(new java.math.BigDecimal("12.345")) == 0)
  }
}
