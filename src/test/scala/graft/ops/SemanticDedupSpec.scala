package graft.ops

import graft.SparkTestBase

/** SemDeDup-style semantic dedup and cluster-balanced sampling: cell
  * assignment ties, the greedy keep-first drop rule, zero-vector safety,
  * and the per-cluster quota ordering contract.
  */
class SemanticDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two axis-aligned cells; ties (equal dot) go to the LARGER cell id,
  // the ivfAssign convention
  private val cents = Seq(0 -> Array(1.0, 0.0), 1 -> Array(0.0, 1.0))
  private val vecs = Seq(
    (1L, Seq(4.0, 0.0)),  // cell 0, the keeper
    (2L, Seq(8.0, 0.0)),  // cell 0, cosine 1.0 with id 1 -> dropped
    (3L, Seq(3.0, 1.0)),  // cell 0, cosine .9487 with id 1 -> dropped
    (4L, Seq(0.0, 5.0)),  // cell 1, kept
    (5L, Seq(1.0, 1.0)),  // dot tie (1,1) -> cell 1; cosine .7071 with id 4 < .75 -> kept
    (6L, Seq(0.0, 0.0)),  // zero vector -> cell 1 (0,0 tie), never dropped
    (7L, Seq(0.0, 0.0)),  // zero twin: cosine undefined, also kept
    (8L, Seq(-4.0, 0.0)), // dot (-4,0) -> cell 1; negative dot with 5 -> kept
  )

  test("semanticDedup drops smaller-id cosine neighbors within a cell, keeps across cells and zero vectors") {
    val out = Dedup.semanticDedup(vecs.toDF("id", "vec"), "id", "vec", cents, threshold = 0.75)
      .select("id", "cell", "kept").as[(Long, Long, Long)].collect()
      .map { case (id, cell, kept) => id -> ((cell, kept)) }.toMap
    assert(out.keySet == (1L to 8L).toSet)
    val cells = out.view.mapValues(_._1).toMap
    assert(cells == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L, 8L -> 1L))
    val droppedIds = out.collect { case (id, (_, 0L)) => id }.toSet
    assert(droppedIds == Set(2L, 3L))
  }

  test("semanticDedup is not sensitive to which near-dup arrives first: id 1 has no smaller neighbor, stays") {
    val out = Dedup.semanticDedup(vecs.toDF("id", "vec"), "id", "vec", cents, threshold = 0.75)
    assert(out.filter("id = 1 and kept = 1").count() == 1)
  }

  test("semanticDedup pair space plans as an equi join on cell, never a nested loop") {
    val plan = Dedup.semanticDedup(vecs.toDF("id", "vec"), "id", "vec", cents, threshold = 0.75)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("semanticDedup capped path: a homogeneous mega-cell keeps exactly one doc") {
    // 40 identical vectors in cell 0 with cap 5 -> 8 sub-cells; spokes drop
    // against sub hubs, hub chain collapses hubs to the global min id
    val mega = (1L to 40L).map(i => (i, Seq(4.0, 0.0))) :+ (99L, Seq(0.0, 5.0))
    val out = Dedup.semanticDedup(mega.toDF("id", "vec"), "id", "vec", cents,
      threshold = 0.75, maxCellSize = 5)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    assert(out.size == 41)
    val keptIds = out.collect { case (id, 1L) => id }.toSet
    assert(keptIds == Set(1L, 99L), s"kept=$keptIds")
  }

  test("semanticDedup capped path never examines cross-sub non-hub pairs: distinct families per sub stay kept") {
    // cap forces sub-splitting of a cell whose members are all DISSIMILAR:
    // nothing should drop (sub-split only shrinks the examined pair space)
    val spread = Seq(
      (1L, Seq(9.0, 1.0)), (2L, Seq(9.0, -1.0)), (3L, Seq(9.0, 3.0)),
      (4L, Seq(9.0, -3.0)), (5L, Seq(9.0, 5.0)), (6L, Seq(9.0, -5.0)),
    ).filter { case (_, v) => v.head > 0 } // all cell 0
    val uncapped = Dedup.semanticDedup(spread.toDF("id", "vec"), "id", "vec", cents,
      threshold = 0.9999)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    val capped = Dedup.semanticDedup(spread.toDF("id", "vec"), "id", "vec", cents,
      threshold = 0.9999, maxCellSize = 2)
      .select("id", "kept").as[(Long, Long)].collect().toMap
    assert(uncapped.values.forall(_ == 1L))
    assert(capped == uncapped)
  }

  test("semanticDedup cells at or under the cap match the uncapped output exactly") {
    val uncapped = Dedup.semanticDedup(vecs.toDF("id", "vec"), "id", "vec", cents, threshold = 0.75)
      .select("id", "cell", "kept").as[(Long, Long, Long)].collect().toSet
    val bigCap = Dedup.semanticDedup(vecs.toDF("id", "vec"), "id", "vec", cents,
      threshold = 0.75, maxCellSize = 100)
      .select("id", "cell", "kept").as[(Long, Long, Long)].collect().toSet
    assert(bigCap == uncapped)
  }

  test("clusterBalancedSample keeps the per-cell quota ordered by score desc then id asc") {
    val scored = Seq(
      (1L, Seq(4.0, 0.0), 10.0), (2L, Seq(8.0, 0.0), 20.0), (3L, Seq(3.0, 1.0), 20.0),
      (4L, Seq(0.0, 5.0), 5.0), (5L, Seq(1.0, 1.0), 5.0), (8L, Seq(-4.0, 0.0), 1.0),
    ).toDF("id", "vec", "sc")
    val out = Corpus.clusterBalancedSample(scored, "id", "vec", cents,
      perCluster = 2, scoreCol = org.apache.spark.sql.functions.col("sc"))
      .select("cell", "rank", "id").as[(Long, Long, Long)].collect().toSet
    // cell 0: ids {1(10), 2(20), 3(20)} -> 2 then 3 (score tie broken by id); 1 cut
    // cell 1: ids {4(5), 5(5), 8(1)} -> 4 then 5
    assert(out == Set((0L, 1L, 2L), (0L, 2L, 3L), (1L, 1L, 4L), (1L, 2L, 5L)))
  }
}
