package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("stratifiedExact takes exactly n per stratum, deterministically, and all of small strata") {
    val df = ((1L to 100L).map(i => (i, "en")) ++ (101L to 103L).map(i => (i, "fr")))
      .toDF("id", "lang")
    val s1 = Corpus.stratifiedExact(df, "lang", "id", 10)
    assert(s1.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("en" -> 10L, "fr" -> 3L))
    val s2 = Corpus.stratifiedExact(df, "lang", "id", 10)
    assert(s1.select("id").as[Long].collect().sorted.toSeq == s2.select("id").as[Long].collect().sorted.toSeq)
  }

  test("hashSample is a narrow deterministic cut") {
    val df = (1L to 1000L).toDF("id")
    val a = Corpus.hashSample(df, "id", 10).select("id").as[Long].collect().toSet
    val b = Corpus.hashSample(df, "id", 10).select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty && a.size < 1000)
    // no exchange in the plan: sampling must not shuffle
    val plan = Corpus.hashSample(df, "id", 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("leakageSafeSplit co-locates whole components, roots singletons at their own id") {
    val docs = (1L to 20L).toDF("id")
    // components {1,2,3} (root 1) and {10,11} (root 10); rest singletons
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "cluster")
    val out = Corpus.leakageSafeSplit(docs, "id", clusters, nSplits = 3)
      .select("id", "root", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1L) == byId(2L) && byId(2L) == byId(3L), "component {1,2,3} must share root+split")
    assert(byId(10L) == byId(11L), "component {10,11} must share root+split")
    assert(byId(5L)._1 == 5L, "singleton roots at its own id")
    assert(out.forall(t => t._3 >= 0L && t._3 < 3L))
    assert(out.map(_._3).distinct.size > 1, "splits must actually spread")
    // determinism + salt sensitivity
    val again = Corpus.leakageSafeSplit(docs, "id", clusters, nSplits = 3)
      .select("id", "split").as[(Long, Long)].collect().toMap
    assert(out.map(t => t._1 -> t._3).toMap == again)
    val salted = Corpus.leakageSafeSplit(docs, "id", clusters, nSplits = 3, salt = "other")
      .select("id", "split").as[(Long, Long)].collect().toMap
    assert(salted != again, "a different salt must reshuffle the assignment")
  }

  test("leakageSafeSplit end-to-end: no near-dup pair straddles splits on real pair output") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), (3L, "a b c d e f g x"),
      (4L, "p q r s t u v w"), (5L, "p q r s t u v w"),
      (6L, "z y x w v u t s r")).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
      numHashes = 4, rowsPerBand = 2, threshold = 0.5)
    val split = Corpus.leakageSafeSplit(docs, "doc_id", Dedup.clusterPairs(pairs), nSplits = 2)
      .select(col("doc_id"), col("split"))
    val straddlers = pairs
      .join(split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), Seq("id_a"))
      .join(split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), Seq("id_b"))
      .filter(col("sa") =!= col("sb"))
    assert(straddlers.count() == 0L, "no verified near-dup pair may cross a split boundary")
  }

  test("packSequences: docs never split, bins advance with the budget, oversize doc gets its own bin") {
    val df = Seq(
      (1L, "en", 3000L), (2L, "en", 2000L), (3L, "en", 9000L), (4L, "en", 100L),
      (5L, "fr", 4000L),
    ).toDF("doc_id", "lang", "toks")
    val packed = Corpus.packSequences(df, "doc_id", "toks", 4096L, packKey = Some("lang"))
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // en: cum-before = 0, 3000, 5000, 14000 → bins 0, 0, 1, 3
    assert(packed(1L) == 0L && packed(2L) == 0L)
    assert(packed(3L) == 1L) // the 9000-token doc starts in bin 1 and owns 2+
    assert(packed(4L) == 3L)
    assert(packed(5L) == 0L) // fr packs independently
  }

  test("unkeyed packSequences distributes the global cumsum across range buckets") {
    val n = 500
    // uneven token sizes so bucket sums differ; ids shuffled across input partitions
    val df = scala.util.Random.shuffle((1L to n.toLong).toList)
      .map(i => (i, 1L + (i * 7) % 13)).toDF("doc_id", "toks").repartition(8)
    val got = Corpus.packSequences(df, "doc_id", "toks", budget = 40L, buckets = 8)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // oracle: driver-side exact global cumsum in id order
    var cum = 0L
    (1L to n.toLong).foreach { i =>
      val t = 1L + (i * 7) % 13
      assert(got(i) == cum / 40L, s"doc $i: got ${got(i)} expected ${cum / 40L}")
      cum += t
    }
    // plan shape: the per-row window is partitioned (by __b); the only
    // unpartitioned window is the per-bucket offset cumsum (≤ buckets rows)
    val packed = Corpus.packSequences(df, "doc_id", "toks", budget = 40L, buckets = 8)
    packed.collect()
    val plan = packed.queryExecution.executedPlan.toString
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("__b")), plan.take(2000))
    // unkeyed packing on a non-numeric id must fail fast, not silently
    // plan a single-partition window
    val e = intercept[IllegalArgumentException](
      Corpus.packSequences(Seq(("a", 1L)).toDF("doc_id", "toks"), "doc_id", "toks", 10L))
    assert(e.getMessage.contains("packKey"))
  }

  test("tokenBudgetSelect keeps the exact best-priority prefix under the budget") {
    val n = 400
    // priorities with ties (i % 50) so tie-break-by-id crosses bucket math;
    // shuffled input partitions
    val df = scala.util.Random.shuffle((1L to n.toLong).toList)
      .map(i => (i, 1L + (i * 5) % 17, (i % 50).toLong)).toDF("doc_id", "toks", "prio")
      .repartition(8)
    val budget = 900L
    val got = Corpus.tokenBudgetSelect(df, "doc_id", "toks", "prio", budget, buckets = 8)
      .select("doc_id").as[Long].collect().toSet
    // oracle: driver-side exact cumsum in (prio desc, id) order
    val ordered = (1L to n.toLong).map(i => (i, 1L + (i * 5) % 17, (i % 50).toLong))
      .sortBy { case (id, _, p) => (-p, id) }
    var cum = 0L
    val expected = ordered.takeWhile { case (_, t, _) => { cum += t; cum <= budget } }
      .map(_._1).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < n) // the budget actually bites
    // non-numeric priority fails fast
    val e = intercept[IllegalArgumentException](
      Corpus.tokenBudgetSelect(Seq((1L, 1L, "x")).toDF("doc_id", "toks", "prio"),
        "doc_id", "toks", "prio", 10L))
    assert(e.getMessage.contains("numeric priority"))
    // NULL priority sorts LAST (SQL DESC semantics): the unscored doc must
    // not consume the budget ahead of scored docs
    val withNull = Seq(
      (1L, 5L, Some(10L)), (2L, 5L, Some(1L)), (3L, 5L, None),
    ).toDF("doc_id", "toks", "prio")
    val sel = Corpus.tokenBudgetSelect(withNull, "doc_id", "toks", "prio", budget = 10L, buckets = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(sel == Set(1L, 2L), s"null-priority doc must lose to scored docs, got $sel")
  }

  test("ngramHashes: distinct n-grams; shorter-than-n text yields empty, not a descending range") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val got = df.select(col("id"), Corpus.ngramHashes(col("text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).length == 2) // "a b c", "b c d"
    assert(got(2L).isEmpty)
  }

  test("degenerate inputs: empty pair set, empty eval set, empty right side") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val emptyPairs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    assert(Dedup.clusterPairs(emptyPairs).count() == 0)
    assert(Dedup.clusterPairs(emptyPairs, driverMaxEdges = 0L).count() == 0)

    val train = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val emptyEval = train.filter(lit(false))
    val c = Corpus.contamination(train, emptyEval, "doc_id", "text", n = 2)
      .collect().head
    assert(c.getLong(2) == 0L && c.getDouble(3) == 0.0)

    val left = Seq((1L, 10L, new java.sql.Timestamp(0L))).toDF("event_id", "user_id", "ts")
    val emptyRight = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "rts", "v")
    val a = Temporal.asofJoin(left, emptyRight, "user_id", "ts", "rts", Seq("v")).collect()
    assert(a.length == 1 && a.head.isNullAt(a.head.fieldIndex("v")))

    assert(Corpus.packSequences(Seq((1L, 10L)).toDF("doc_id", "toks"), "doc_id", "toks", 100L)
      .select("pack_id").head().getLong(0) == 0L)
  }

  test("contamination counts eval-overlapping n-grams per train doc") {
    val train = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown" with eval
      (2L, "completely different words here now"),
      (3L, "ab"), // too short for any 3-gram
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "the quick brown cat sat")).toDF("doc_id", "text")
    val got = Corpus.contamination(train, ev, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ((3L, 1L, 1.0 / 3.0))) // only "the quick brown" overlaps
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((0L, 0L, 0.0)))
  }

  test("contamination over the broadcast cap degrades to a shuffle join with identical output") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words in this one here"),
      (3L, "the quick brown cat naps all day long"),
    ).toDF("doc_id", "text")
    val ev = Seq((100L, "the quick brown cat sat"), (101L, "over the lazy dog indeed"))
      .toDF("doc_id", "text")
    def rows(capped: Long) =
      Corpus.contamination(train, ev, "doc_id", "text", n = 3, broadcastRowCap = capped)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    val onBroadcastPath = rows(capped = 4000000L)
    val onShufflePath = rows(capped = 1L) // forced over the cap
    assert(onShufflePath == onBroadcastPath)
    // and the gated plan really dropped the broadcast on the SEMI join
    // (the later tiny aggregated outer join back to train may still
    // broadcast — that one is AQE's call and not what the cap governs)
    val shuffled = Corpus.contamination(train, ev, "doc_id", "text", n = 3, broadcastRowCap = 1L)
    val plan = shuffled.queryExecution.executedPlan.toString
    val semiJoinLines = plan.linesIterator.filter(_.contains("LeftSemi")).mkString("\n")
    assert(semiJoinLines.nonEmpty && !semiJoinLines.contains("Broadcast"), plan.take(1500))
  }
}
