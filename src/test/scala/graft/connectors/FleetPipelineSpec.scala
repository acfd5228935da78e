package graft.connectors

import graft.SparkTestBase
import graft.connectors.rest.{RestEngine, StaticPagesTransport}
import graft.connectors.sources.Fleet
import graft.core.StateStore
import graft.pipeline.{Pipeline, ResourceDef, SourceDef}

/** The "user could switch" demo: a fleet source definition drives the REST
  * engine against canned pages, flows through the pipeline driver, and
  * lands merge-disposition parquet tables with cursor state — the whole
  * SURVEY §3.1 lifecycle on one connector config.
  */
class FleetPipelineSpec extends SparkTestBase {
  import spark.implicits._

  test("github source → pipeline → merged tables + committed cursor") {
    val src = Fleet.github("octo", "repo", None)
    val issuesRes = src.resources.find(_.name == "issues").get
    val t = StaticPagesTransport(Map(
      "repos/octo/repo/issues?direction=asc&per_page=100&sort=updated&state=all" ->
        """[{"id":1,"updated_at":"2024-01-01T00:00:00Z","title":"a","labels":[{"name":"bug"}]},
          | {"id":2,"updated_at":"2024-01-02T00:00:00Z","title":"b","labels":[]}]""".stripMargin,
    ))

    val dest = tmpDir("fleet-dest")
    val stateDir = tmpDir("fleet-state")
    val pipe = new Pipeline(spark, "gh", dest, stateDir)
    val resource = ResourceDef(
      name = "issues",
      hints = issuesRes.hints,
      build = ctx => RestEngine.readResource(ctx.spark, src, issuesRes, t, Some(ctx.state)),
    )
    val results = pipe.run(SourceDef(src.name, Seq(resource)))

    // root table merged on id; labels array became a child table
    assert(results.map(_.table).toSet == Set("issues", "issues__labels"))
    val issues = spark.read.parquet(s"$dest/issues")
    assert(issues.count() == 2)
    assert(issues.columns.contains("_dlt_load_id"))
    assert(spark.read.parquet(s"$dest/issues__labels").count() == 1)

    // rerun with the same pages: merge keeps it at 2 rows (idempotent)
    pipe.run(SourceDef(src.name, Seq(resource)))
    assert(spark.read.parquet(s"$dest/issues").count() == 2)

    val state = StateStore(stateDir, s"gh.${src.name}")
    assert(state.getString("last_load_id").isDefined)
  }
}
