package graft.connectors.transforms

import graft.SparkTestBase
import graft.core.StateStore
import org.apache.spark.sql.functions._

class TransformsSpec extends SparkTestBase {
  import spark.implicits._

  test("custom fields: first-seen name wins across runs, options accrete, enums decode") {
    val dir = tmpDir("cf-state")
    val state = StateStore(dir, "p")

    val run1 = Seq(CustomFields.FieldDef("abc123", "Deal Stage", "enum", Map("1" -> "Open")))
    val m1 = CustomFields.updateMapping(state, "deals", run1)
    state.commit()

    // run 2: field renamed remotely + new option → name stays, option added
    val run2 = Seq(CustomFields.FieldDef("abc123", "Stage (renamed)", "enum", Map("2" -> "Won")))
    val m2 = CustomFields.updateMapping(StateStore(dir, "p"), "deals", run2)
    assert(m2("abc123").name == "Deal Stage")
    assert(m2("abc123").options == Map("1" -> "Open", "2" -> "Won"))

    val df = Seq(("d1", "1"), ("d2", "2"), ("d3", "9")).toDF("id", "abc123")
    val out = CustomFields.applyMapping(df, m2)
    assert(out.columns.toSet == Set("id", "deal_stage"))
    assert(out.orderBy("id").select("deal_stage").as[String].collect().toSeq == Seq("Open", "Won", "9"))

    val mt = CustomFields.mappingTable(spark, "deals", m2)
    assert(mt.head().getString(3) == "deal_stage")
    assert(m1("abc123").options == Map("1" -> "Open"))
  }

  test("pivotStages melts wide date_entered columns to long rows") {
    val df = Seq(
      ("c1", Some("2024-01-01"), None),
      ("c2", Some("2024-02-01"), Some("2024-03-01")),
    ).toDF("id", "date_entered_lead", "date_entered_won")
    val out = RowShapes.pivotStages(df, "id", "date_entered_")
    assert(out.count() == 3)
    assert(out.where($"id" === "c2" && $"stage" === "won")
      .select("entered_at").as[String].head() == "2024-03-01")
  }

  test("pivotCustomFields maps field-id array entries to named columns") {
    val df = Seq(
      ("t1", Seq(("100", "high"), ("200", "bug"))),
      ("t2", Seq(("100", "low"))),
    ).toDF("id", "fields")
      .withColumn("fields", expr("transform(fields, f -> named_struct('id', f._1, 'value', f._2))"))
    val out = RowShapes.pivotCustomFields(df, "fields", Map("100" -> "priority", "200" -> "kind"))
    assert(out.columns.toSet == Set("id", "priority", "kind"))
    assert(out.where($"id" === "t2").head().getAs[String]("kind") == null)
    assert(out.where($"id" === "t1").head().getAs[String]("priority") == "high")
  }

  test("explodePropertyHistory explodes map of entry arrays") {
    val df = Seq(
      ("obj1", Map("stage" -> Seq(("a", 1L), ("b", 2L)), "owner" -> Seq(("x", 3L)))),
    ).toDF("id", "hist")
      .withColumn("hist", expr("transform_values(hist, (k, v) -> transform(v, e -> named_struct('value', e._1, 'ts', e._2)))"))
    val out = RowShapes.explodePropertyHistory(df, "id", "hist")
    assert(out.columns.toSet == Set("object_id", "property_name", "value", "ts"))
    assert(out.count() == 3)
    assert(out.where($"property_name" === "stage").count() == 2)
  }

  test("groupDealFlows routes by object type with flattened data") {
    val df = Seq(
      ("dealChange", ("f1", 1L), "2024-01-01"),
      ("note", ("f2", 2L), "2024-01-02"),
    ).toDF("object", "data", "ts")
      .withColumn("data", expr("named_struct('field', data._1, 'n', data._2)"))
    val out = RowShapes.groupDealFlows(df, "object", "data", "ts")
    assert(out.columns.toSet == Set("_table", "field", "n", "timestamp"))
    assert(out.where($"_table" === "deals_flow_note").count() == 1)
  }

  test("explodeDatedReport injects the date key into each row") {
    val df = Seq(
      Map("2024-01-01" -> Seq(("p1", 5L)), "2024-01-02" -> Seq(("p2", 7L), ("p3", 1L))),
    ).toDF("report")
      .withColumn("report", expr("transform_values(report, (k, v) -> transform(v, r -> named_struct('page', r._1, 'visits', r._2)))"))
    val out = RowShapes.explodeDatedReport(df, "report")
    assert(out.count() == 3)
    assert(out.where($"date" === "2024-01-02").count() == 2)
  }

  test("unwrapSingleOrList handles both shapes") {
    val listDf = Seq(Seq(("a", 1L), ("b", 2L))).toDF("data")
      .withColumn("data", expr("transform(data, d -> named_struct('k', d._1, 'v', d._2))"))
    assert(RowShapes.unwrapSingleOrList(listDf, "data").count() == 2)
    val singleDf = Seq(("a", 1L)).toDF("k", "v").select(struct($"k", $"v").as("data"))
    assert(RowShapes.unwrapSingleOrList(singleDf, "data").columns.toSet == Set("k", "v"))
  }

  test("chunkByLength respects the URL budget") {
    val chunks = RowShapes.chunkByLength(Seq("aaaa", "bbbb", "cccc", "dd"), maxChars = 10)
    assert(chunks == Seq(Seq("aaaa", "bbbb"), Seq("cccc", "dd")))
    assert(RowShapes.chunkByLength(Nil, 10).isEmpty)
  }
}
