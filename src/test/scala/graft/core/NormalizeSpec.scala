package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

case class NInner(x: Long, y: String)
case class NDoc(id: Long, name: String, inner: NInner, tags: Seq[String], items: Seq[NInner])

class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def sample = Seq(
    NDoc(1L, "a", NInner(10, "i1"), Seq("t1", "t2"), Seq(NInner(1, "a1"), NInner(2, "a2"))),
    NDoc(2L, "b", NInner(20, "i2"), Seq("t3"), Nil),
  ).toDF()

  test("struct columns flatten to __ paths") {
    val flat = Normalize.flattenStructs(sample.select($"id", $"inner"), TableHints("docs"))
    assert(flat.columns.toSet == Set("id", "inner__x", "inner__y"))
    assert(flat.where($"id" === 1).select($"inner__x").head().getLong(0) == 10L)
  }

  test("arrays become child tables with parent ids and list idx") {
    val tables = Normalize.normalize(sample, TableHints("docs", primaryKey = Seq("id")))
    assert(tables.keySet == Set("docs", "docs__tags", "docs__items"))
    val parent = tables("docs")
    assert(!parent.columns.contains("tags") && !parent.columns.contains("items"))
    assert(parent.columns.contains("_dlt_id"))

    val tags = tables("docs__tags")
    assert(tags.columns.toSet == Set("_dlt_id", "_dlt_parent_id", "_dlt_list_idx", "value"))
    assert(tags.count() == 3)
    // child rows join back to the right parent
    val joined = parent.select($"id", col(Normalize.DltId))
      .join(tags, parent(Normalize.DltId) === tags(Normalize.DltParentId))
    assert(joined.where($"id" === 1).count() == 2)
    assert(joined.where($"id" === 2).count() == 1)

    val items = tables("docs__items")
    assert(items.columns.toSet == Set("_dlt_id", "_dlt_parent_id", "_dlt_list_idx", "x", "y"))
    assert(items.count() == 2)
  }

  test("_dlt_id is deterministic across runs") {
    val a = Normalize.normalize(sample, TableHints("docs", primaryKey = Seq("id")))("docs")
      .select($"id", col(Normalize.DltId)).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Normalize.normalize(sample, TableHints("docs", primaryKey = Seq("id")))("docs")
      .select($"id", col(Normalize.DltId)).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("json-hinted columns stay serialized, not recursed") {
    val hints = TableHints("docs", primaryKey = Seq("id"),
      columns = Map("items" -> ColumnHint(dltType = Some(DltType.TJson))))
    val tables = Normalize.normalize(sample, hints)
    assert(tables.keySet == Set("docs", "docs__tags"))
    val parent = tables("docs")
    val itemsJson = parent.where($"id" === 1).select($"items").head().getString(0)
    assert(itemsJson.contains("\"x\":1"))
  }

  test("parseJsonColumn infers schema from data and parses in place") {
    val df = Seq(
      (1L, """{"k": 5, "tags": ["a","b"], "meta": {"x": 1.5}}"""),
      (2L, """{"k": 7, "tags": [], "meta": {"x": 2.0}}"""),
      (3L, null),
    ).toDF("id", "props")
    val parsed = Normalize.parseJsonColumn(df, "props")
    assert(parsed.schema("props").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    val tables = Normalize.normalize(parsed, TableHints("ev", primaryKey = Seq("id")))
    val parent = tables("ev")
    assert(parent.columns.contains("props__k") && parent.columns.contains("props__meta__x"))
    assert(parent.where($"id" === 1).select("props__k").head().getLong(0) == 5L)
    assert(parent.where($"id" === 3).select("props__k").head().isNullAt(0))
    assert(tables("ev__props__tags").count() == 2)
  }

  test("maxTableNesting serializes deeper levels to JSON") {
    val hints = TableHints("docs", primaryKey = Seq("id"), maxTableNesting = 0)
    val tables = Normalize.normalize(sample, hints)
    assert(tables.keySet == Set("docs"))
    val parent = tables("docs")
    assert(parent.schema("tags").dataType.typeName == "string")
  }
}
