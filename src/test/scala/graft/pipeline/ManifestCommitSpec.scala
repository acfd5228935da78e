package graft.pipeline

import graft.SparkTestBase
import graft.core._
import org.apache.spark.sql.functions._

/** All-or-nothing multi-table finalize: a crash between two tables'
  * finalizes must be INVISIBLE to readers of the manifest — both tables
  * stay at the previous run's state until the single pointer flip.
  */
class ManifestCommitSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(n: Int, tag: String) =
    (1 to n).map(i => (i.toLong, tag, if (i % 2 == 0) "a" else "b")).toDF("id", "tag", "kind")

  test("a crash between two routed-table finalizes is invisible to manifest readers") {
    val dest = tmpDir("mani-dest")
    val pipe = new Pipeline(spark, "p", dest, tmpDir("mani-state"), manifestCommit = true)
    def src(tag: String, boom: Boolean) = SourceDef("s", Seq(
      ResourceDef("ev", TableHints("ev", Disposition.Replace),
        _ => rows(6, tag), routingColumn = Some("kind")),
      // a second resource that fails AFTER the routed tables landed —
      // the run dies with ev_a/ev_b generations on disk, pointer untouched
      ResourceDef("late", TableHints("late", Disposition.Replace),
        _ => if (boom) sys.error("crash between finalizes") else Seq(1).toDF("x")),
    ))

    assert(pipe.run(src("v1", boom = false)).map(_.table).toSet == Set("ev_a", "ev_b", "late"))
    val m = pipe.manifest
    def tags(t: String) = m.read(t).get.select("tag").distinct().as[String].collect().toSet
    assert(tags("ev_a") == Set("v1") && tags("ev_b") == Set("v1"))

    // run 2 crashes after both routed tables landed their new generations
    intercept[RuntimeException] { pipe.run(src("v2", boom = true)) }
    // readers still see v1 of BOTH tables — no torn A-new/B-old state
    assert(tags("ev_a") == Set("v1") && tags("ev_b") == Set("v1"))
    // the v2 landings exist only as unreferenced orphan dirs
    val evA = new java.io.File(s"$dest/ev_a")
    assert(evA.listFiles().count(f => f.isDirectory && f.getName.matches("g[0-9]+")) > m.gens("ev_a").size)

    // the retry publishes BOTH tables atomically (the crash orphan's
    // generation number is swept at publish start and safely re-minted)
    assert(pipe.run(src("v2", boom = false)).map(_.table).toSet == Set("ev_a", "ev_b", "late"))
    assert(tags("ev_a") == Set("v2") && tags("ev_b") == Set("v2"))
    val v1Gen = "g1" // run 1's committed generation, superseded by the retry
    def dirs() = evA.listFiles().filter(f => f.isDirectory && f.getName.matches("g[0-9]+"))
      .map(_.getName).toSet
    assert(dirs().contains(v1Gen),
      "a superseded generation gets one publish interval of reader grace")
    // the NEXT publish's entry sweep reclaims it; only live + just-superseded remain
    pipe.run(src("v3", boom = false))
    assert(!dirs().contains(v1Gen), "the following publish must sweep the superseded generation")
    assert(dirs().intersect(pipe.manifest.gens("ev_a").toSet) == pipe.manifest.gens("ev_a").toSet)
  }

  test("append lands O(batch) deltas; merge rewrites shrink the generation list") {
    val dest = tmpDir("mani-append")
    val pipe = new Pipeline(spark, "p", dest, tmpDir("mani-append-state"), manifestCommit = true)
    def append(tag: String) = SourceDef("s", Seq(ResourceDef("logs",
      TableHints("logs", Disposition.Append), _ => rows(3, tag))))

    pipe.run(append("r1"))
    pipe.run(append("r2"))
    val m = pipe.manifest
    assert(m.gens("logs").size == 2, "each append is one delta generation")
    assert(m.read("logs").get.count() == 6)
    assert(m.read("logs").get.select("tag").distinct().as[String].collect().toSet == Set("r1", "r2"))

    // a merge rewrite collapses the list to a single generation
    val mergeSrc = SourceDef("s", Seq(ResourceDef("logs",
      TableHints("logs", Disposition.Merge, primaryKey = Seq("id", "tag")),
      _ => rows(3, "r2"))))
    pipe.run(mergeSrc)
    assert(m.gens("logs").size == 1)
    assert(m.read("logs").get.count() == 6, "merge on (id, tag) upserts the same keys")
  }

  test("data commits before cursors: a merge re-run over new tables is idempotent") {
    val dest = tmpDir("mani-idem")
    val pipe = new Pipeline(spark, "p", dest, tmpDir("mani-idem-state"), manifestCommit = true)
    val src = SourceDef("s", Seq(ResourceDef("t",
      TableHints("t", Disposition.Merge, primaryKey = Seq("id")), _ => rows(5, "x"))))
    pipe.run(src)
    // _dlt_load_id legitimately differs per run — compare the data columns
    def snap() = pipe.manifest.read("t").get
      .select("id", "tag", "kind").orderBy("id").collect().toSeq
    val before = snap()
    pipe.run(src) // the crash-between-commits replay path
    assert(snap() == before)
  }

  test("bucketed tables refuse the manifest path loudly") {
    val dest = tmpDir("mani-bucket")
    val pipe = new Pipeline(spark, "p", dest, tmpDir("mani-bucket-state"), manifestCommit = true)
    val src = SourceDef("s", Seq(ResourceDef("t",
      TableHints("t", Disposition.Merge, primaryKey = Seq("id"), bucketCount = Some(4)),
      _ => rows(3, "x"))))
    val e = intercept[Exception] { pipe.run(src) }
    assert(e.getMessage.contains("manifest"))
  }

  test("concurrent manifest writers to one root are excluded by the lease") {
    val dest = tmpDir("mani-lock")
    val pipe = new Pipeline(spark, "p", dest, tmpDir("mani-lock-state"), manifestCommit = true)
    val src = SourceDef("s", Seq(ResourceDef("t",
      TableHints("t", Disposition.Replace), _ => rows(2, "x"))))
    val lease = TableLock.acquire(spark, dest, "other-writer")
    try intercept[TableLock.LockHeldException] { pipe.run(src) }
    finally lease.release()
    pipe.run(src)
    assert(pipe.manifest.read("t").get.count() == 2)
  }
}
