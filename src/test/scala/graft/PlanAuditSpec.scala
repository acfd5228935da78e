package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan audits: the 100 TB design claims specific plan shapes
  * (broadcast dims, pushed filters, pruned scans, bounded shuffles). These
  * assertions run the REAL driver queries against the sf0.001 testdata and
  * fail if a code change silently degrades the plan — e.g. a broadcast
  * flipping to a sort-merge join or a filter detaching from the scan.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def ran(q: String): DataFrame = {
    val df = SparkEntry.queries(q)(spark, sf)
    df.collect() // force AQE to finalize the plan before inspecting it
    df
  }
  private def finalPlan(df: DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    // AQE prints the final plan followed by the initial one — audit the final
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("star join broadcasts every dimension (no sort-merge join)") {
    val plan = finalPlan(ran("q_multi_join_agg"))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), "dims must broadcast, not shuffle the fact table")
  }

  test("scan-agg pushes its filter into the parquet scan and prunes columns") {
    val plan = finalPlan(ran("q_pushdown_scan_agg"))
    assert(plan.contains("PushedFilters: [IsNotNull"), plan.take(2000))
    // the scan's projected column list: the full lineitem table is 16
    // columns; the query needs a handful
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(scanCols.nonEmpty && scanCols.split(",").length < 8,
      s"scan must not read all columns: $scanCols")
  }

  test("decontamination broadcasts the eval n-gram side") {
    val plan = finalPlan(ran("q_decontaminate"))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan.take(2000))
  }

  test("brute-force ANN broadcasts queries; the corpus is never exchanged") {
    val plan = finalPlan(ran("q_ann_cosine"))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("merge upsert's anti-join broadcasts the update keys at runtime (AQE)") {
    // sf0.001 has no events past the batch split — AQE then eliminates the
    // join outright (good, but not the shape under test); sf0.01 has both
    val df = SparkEntry.queries("q_merge_upsert")(spark, "/root/testdata/sf0.01")
    df.collect()
    val plan = finalPlan(df)
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(plan.contains("BroadcastHashJoin"),
      "AQE must convert the survivor anti-join to broadcast for a small batch:\n" + plan.take(2000))
  }

  test("near-dup demo queries join on bucket keys, never an all-pairs nested loop") {
    // q_dedup_jaccard routes through LSH band buckets, q_dedup_cosine
    // through sign-LSH buckets: both must plan as equi joins — a
    // BroadcastNestedLoopJoin here is the O(n²) scale-killer shape
    for (q <- Seq("q_dedup_jaccard", "q_dedup_cosine", "q_dedup_pipeline")) {
      val plan = finalPlan(ran(q))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q must not plan an all-pairs join:\n${plan.take(2000)}")
    }
  }

  test("sequence packing is one window over one shuffle") {
    val plan = finalPlan(ran("q_pack_sequences"))
    // exchanges: one for the window partition key, one for the final
    // orderBy the driver compare requires — nothing else
    val exchanges = plan.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused"))
    assert(exchanges <= 2, s"$exchanges exchanges:\n${plan.take(2000)}")
  }

  test("document scan pushes the range filter into the DSv2 store, not a post-filter of a full scan") {
    val plan = finalPlan(ran("q_doc_pushdown"))
    // DocScan.description() surfaces the pushed store filter; both range
    // bounds must reach it so the store only materializes the slice
    assert(plan.contains("doc_id.gte") && plan.contains("doc_id.lt"),
      s"range filter must be pushed into the document store:\n${plan.take(2000)}")
  }
}
