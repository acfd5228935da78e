package graft.pipeline

import graft.SparkTestBase
import graft.connectors.rest.StaticPagesTransport
import graft.connectors.sources.Fleet

/** pipeline.run(source) over a whole connector config, parent-child
  * included — the reference's top-level call shape end to end.
  */
class RestPipelineSpec extends SparkTestBase {

  test("pipedrive-shaped source: deals → executor-side participants fan-out → tables") {
    val src = Fleet.pipedrive("tok")
    // keep only the deals + participants pair for the fixture
    val slim = src.copy(resources = src.resources.filter(r =>
      r.name == "deals" || r.name == "deal_participants"))

    val t = StaticPagesTransport(Map(
      "api/v2/deals?api_token=tok&limit=500&sort_by=update_time&sort_direction=desc" ->
        """{"data":[{"id":1,"title":"d1","update_time":"2024-01-01"},
          |         {"id":2,"title":"d2","update_time":"2024-01-02"}],
          | "additional_data":{"next_cursor":null}}""".stripMargin,
      "api/v2/deals/1/participants?api_token=tok&limit=500" ->
        """{"data":[{"id":10,"person":"p10"}],"additional_data":{"next_cursor":null}}""",
      "api/v2/deals/2/participants?api_token=tok&limit=500" ->
        """{"data":[{"id":20,"person":"p20"},{"id":21,"person":"p21"}],"additional_data":{"next_cursor":null}}""",
    ))

    val dest = tmpDir("restpipe-dest")
    val pipe = new Pipeline(spark, "pd", dest, tmpDir("restpipe-state"))
    val results = pipe.run(RestPipeline.toSourceDef(slim, () => t))

    assert(results.map(_.table).toSet == Set("deals", "deal_participants"))
    assert(spark.read.parquet(s"$dest/deals").count() == 2)
    val parts = spark.read.parquet(s"$dest/deal_participants")
    assert(parts.count() == 3)
    // child rows carry the parent key for joins
    assert(parts.columns.contains("_parent_id"))
    assert(parts.where(parts("_parent_id") === "2").count() == 2)
  }
}
