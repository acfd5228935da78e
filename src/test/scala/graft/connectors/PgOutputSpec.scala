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
