package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "the quick brown fox"),   // exact dup of 1
    (3L, "the quick brown wolf"),  // near dup
    (4L, "completely different words here"),
  ).toDF("doc_id", "text")

  test("exact dedup groups duplicates and keeps min id") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(groups == Set((1L, 2L), (3L, 1L), (4L, 1L)))
    assert(Dedup.exactDedup(docs, "doc_id", "text").count() == 3)
  }

  test("jaccard: identical=1, near-dup high, disjoint=0") {
    val j = docs.as("a").crossJoin(docs.as("b"))
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib"),
        Dedup.jaccard($"a.text", $"b.text").as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) == 0.6) // 3 shared / 5 union
    assert(j((1L, 4L)) == 0.0)
  }

  test("minhash LSH: exact dups always share every band bucket") {
    val buckets = Dedup.lshBuckets(docs, "doc_id", "text", numHashes = 4, rowsPerBand = 2)
    val byDoc = buckets.collect().groupBy(_.getLong(2)).view
      .mapValues(_.map(r => (r.getInt(0), r.getString(1))).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))
    val cands = Dedup.lshCandidateGroups(docs, "doc_id", "text", 4, 2)
    assert(cands.where($"min_id" === 1 && $"max_id" >= 2 && $"n_docs" >= 2).count() > 0)
  }

  test("pair clustering: chains and stars collapse to min-id components; survivors kept") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),        // chain 1-2-3
      (10L, 11L), (10L, 12L),    // star around 10
    ).toDF("id_a", "id_b")
    val clusters = Dedup.clusterPairs(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))

    val docs = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L).toDF("doc_id")
    val kept = Dedup.dedupByClusters(docs, "doc_id", Dedup.clusterPairs(pairs))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 10L, 99L)) // one per cluster + untouched singleton
  }

  test("pair clustering matches a union-find oracle on random graphs and long chains") {
    val rnd = new scala.util.Random(42)
    val randomEdges = (1 to 300).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val chain = (0L until 99L).map(i => (i + 1000L, i + 1001L)) // diameter 99 ≫ maxIter 25
    val all = randomEdges ++ chain

    // driver-side union-find oracle
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    all.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val nodes = all.flatMap(t => Seq(t._1, t._2)).distinct
    val oracle = nodes.map(n => n -> find(n)).toMap

    // small path (driver union-find) and scale path (alternating star)
    // must produce identical labels
    val gotDriver = Dedup.clusterPairs(all.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotDistributed = Dedup.clusterPairs(all.toDF("id_a", "id_b"), driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDriver == oracle)
    assert(gotDistributed == oracle)
  }

  test("nearDupPairs: bucket cap splits a degenerate bucket, leaves sane buckets intact") {
    // one degenerate bucket: 40 copies of the same boilerplate line all land
    // in every band bucket together; plus one sane near-dup pair
    val boiler = (100L until 140L).map(i => (i, "copyright footer all rights reserved"))
    val sane = Seq((1L, "the quick brown fox jumps"), (2L, "the quick brown fox leaps"))
    val corpus = (boiler ++ sane).toDF("doc_id", "text")

    val uncapped = Dedup.nearDupPairs(corpus, "doc_id", "text", 4, 2, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.nearDupPairs(corpus, "doc_id", "text", 4, 2, 0.5, maxBucketSize = 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // sane bucket (size 2 <= cap) must be untouched by the cap
    assert(capped.contains((1L, 2L)))
    // identical docs share every band AND the next-band refinement key, so
    // the over-cap group is split into band-salted cells: all-pairs inside
    // a cell, star above the cap, consecutive cell hubs chained. The pair
    // set is data-dependent but must be (a) bounded well below the full
    // 40·39/2 space, (b) all true dups, (c) COVERING — every boilerplate
    // doc appears — and (d) one connected component through the chain
    val boilerPairs = capped.filter { case (a, _) => a >= 100L }
    assert(boilerPairs.nonEmpty && boilerPairs.size < 40 * 39 / 2,
      s"over-cap group must emit a bounded pair subset (got ${boilerPairs.size})")
    val covered = boilerPairs.flatMap(p => Seq(p._1, p._2))
    assert(covered == (100L until 140L).toSet,
      s"every doc of the over-cap group must appear in some pair (got ${covered.size})")
    // with the default cap the same call yields the full pair space
    assert(uncapped.size == 40 * 39 / 2 + 1)
    // clustering through cells + hub chain restores ONE boilerplate group
    val clusters = Dedup.clusterPairs(boilerPairs.toSeq.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(1)).toSet
    assert(clusters == Set(100L))
  }

  test("incremental near-dup pairs equal the cross subset of a full recompute") {
    // same hash family + banding on both paths ⇒ the batch-vs-index
    // candidate set must equal the batch↔corpus subset of a full
    // corpus-union recompute, and verification is exact on both
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    val all = (1L to 45L).map(i => (i, Vector.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val corpus = all.filter(_._1 % 3 != 0).toDF("doc_id", "text")
    val batch = all.filter(_._1 % 3 == 0).toDF("doc_id", "text")

    val full = Dedup.nearDupPairs(all.toDF("doc_id", "text"), "doc_id", "text", 4, 2, 0.5)
      .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
    val crossExpected = full.filter(p => p.exists(_ % 3 == 0) && p.exists(_ % 3 != 0))

    val index = Dedup.lshIndexRows(corpus, "doc_id", "text", 4, 2)
    val got = Dedup.incrementalNearDupPairs(batch, corpus, index, "doc_id", "text", 4, 2, 0.5)
      .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(got == crossExpected)
  }

  test("incremental dedup: corpus dups dropped, batch-internal dups collapsed, index delta matches survivors") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"),
      (3L, "iota kappa lambda mu")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta"),  // exact dup of corpus 1 → dropped
      (11L, "alpha beta gamma delta"),  // also dup of 1 (and of 10) → dropped
      (12L, "nu xi omicron pi"),        // fresh singleton
      (13L, "rho sigma tau upsilon"),   // fresh, exact dup with 14 → 13 survives
      (14L, "rho sigma tau upsilon")).toDF("doc_id", "text")

    val index = Dedup.lshIndexRows(corpus, "doc_id", "text", 4, 2)
    val (survivors, delta) = Dedup.incrementalDedup(batch, corpus, index, "doc_id", "text", 4, 2, 0.9)
    val kept = survivors.select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 13L))
    // delta rows are exactly the survivors' band rows, appendable to the index
    val deltaIds = delta.select("id").as[Long].collect().toSet
    assert(deltaIds == kept)
    assert(delta.columns.toSeq == index.columns.toSeq)
    // grown index immediately catches a re-send of a surviving doc
    val resend = Seq((20L, "nu xi omicron pi")).toDF("doc_id", "text")
    val matched = Dedup.incrementalNearDupPairs(
      resend, corpus.unionByName(survivors), index.unionByName(delta),
      "doc_id", "text", 4, 2, 0.9)
    assert(matched.select("id_b").as[Long].collect().toSet == Set(12L))
  }

  test("broadcast gate: a 1-row cap forces the shuffle fallback with identical output") {
    // a backfill-sized batch must not be broadcast — force every gated
    // frame over the cap (broadcastRowCap = 1) and prove output identity
    // with the broadcast path for the full incremental cycle, over-cap
    // buckets included
    val boiler = (100L until 130L).map(i => (i, "copyright footer all rights reserved"))
    val corpus = (boiler ++ Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "epsilon zeta eta theta"))).toDF("doc_id", "text")
    val batch = Seq(
      (200L, "copyright footer all rights reserved"),
      (201L, "alpha beta gamma delta"),
      (202L, "nu xi omicron pi"),
      (203L, "rho sigma tau upsilon"),
      (204L, "rho sigma tau upsilon")).toDF("doc_id", "text")
    val index = Dedup.lshIndexRows(corpus, "doc_id", "text", 4, 2)

    def run(cap: Long) = {
      val pairs = Dedup.incrementalNearDupPairs(batch, corpus, index, "doc_id", "text",
        4, 2, 0.9, maxBucketSize = 8, broadcastRowCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val (survivors, delta) = Dedup.incrementalDedup(batch, corpus, index, "doc_id", "text",
        4, 2, 0.9, maxBucketSize = 8, broadcastRowCap = cap)
      (pairs, survivors.select("doc_id").as[Long].collect().toSet,
        delta.select("id").as[Long].collect().toSet)
    }
    val (bPairs, bKept, bDelta) = run(4000000L) // broadcast path
    val (sPairs, sKept, sDelta) = run(1L)       // shuffle fallback
    assert(sPairs == bPairs && sKept == bKept && sDelta == bDelta)
    assert(bKept == Set(202L, 203L))
  }

  test("incremental cap: over-cap homogeneous index bucket probes hub only; sane buckets unaffected") {
    val boiler = (100L until 130L).map(i => (i, "copyright footer all rights reserved"))
    val corpus = (boiler ++ Seq((1L, "the quick brown fox jumps"))).toDF("doc_id", "text")
    val batch = Seq(
      (200L, "copyright footer all rights reserved"), // lands in the over-cap bucket
      (201L, "the quick brown fox leaps")).toDF("doc_id", "text")
    val index = Dedup.lshIndexRows(corpus, "doc_id", "text", 4, 2)
    val pairs = Dedup.incrementalNearDupPairs(batch, corpus, index, "doc_id", "text",
      4, 2, 0.5, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical signatures can't be split by refinement → the batch doc
    // probes its band-salted cell of the over-cap group: a bounded,
    // nonempty pseudo-random sample of the copies, never all 30
    val boilerProbes = pairs.filter(_._1 == 200L)
    assert(boilerProbes.nonEmpty && boilerProbes.size < 30,
      s"over-cap group must be probed via a bounded cell sample (got ${boilerProbes.size})")
    assert(boilerProbes.forall { case (_, b) => b >= 100L && b < 130L })
    // the sane bucket (2 docs) still verifies exactly
    assert(pairs.contains((201L, 1L)))
  }

  test("line dedup: first occurrence wins corpus-wide, order preserved, hash-key path identical") {
    val docs = Seq(
      (1L, "header\nalpha beta\nfooter"),
      (2L, "header\ngamma delta\nfooter"),  // boilerplate deduped, middle survives
      (3L, "header\nalpha beta\nfooter"),   // fully duplicate → empty
      (4L, "zeta\nheader\neta"),            // non-contiguous keeps preserve order
      (5L, "x\nx"),                         // in-doc repeat: first position wins
    ).toDF("doc_id", "text")
    def run(hashKeys: Boolean) =
      Dedup.dedupLines(docs, "doc_id", "text", hashKeys = hashKeys)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val m = run(false)
    assert(m(1L) == (("header\nalpha beta\nfooter", 3L, 3L)))
    assert(m(2L) == (("gamma delta", 3L, 1L)))
    assert(m(3L) == (("", 3L, 0L)))
    assert(m(4L) == (("zeta\neta", 3L, 2L)))
    assert(m(5L) == (("x", 2L, 1L)))
    assert(run(true) == m) // 8-byte-key scale path, identical output
  }

  test("sharedSpans: diagonal runs found at any offset, boilerplate cap drops anchors, threshold exact") {
    val common = "one two three four five six seven eight nine ten eleven"
    val docs = Seq(
      (1L, s"aa bb $common cc"),
      (2L, s"xx $common yy zz"),  // same 11-token run, shifted offset
      (3L, "totally different words without overlap at all")).toDF("doc_id", "text")
    val spans = Dedup.sharedSpans(docs, "doc_id", "text", k = 5, minSpan = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(spans == Map((1L, 2L) -> 11L))
    // df-cap 1: every shared gram lives in 2 docs → dropped → no anchors
    assert(Dedup.sharedSpans(docs, "doc_id", "text", 5, 10, maxDocFreq = 1).count() == 0)
    // threshold boundary: a 9-token shared text misses minSpan=10, hits 9
    val short9 = Seq(
      (1L, "one two three four five six seven eight nine"),
      (2L, "one two three four five six seven eight nine")).toDF("doc_id", "text")
    assert(Dedup.sharedSpans(short9, "doc_id", "text", 5, 10).count() == 0)
    assert(Dedup.sharedSpans(short9, "doc_id", "text", 5, 9)
      .collect().head.getLong(2) == 9L)
  }

  test("simhash: identical texts identical, hamming sane") {
    val fp = docs.select($"doc_id", Dedup.simhash(split($"text", " ")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val d13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val d14 = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(d13 < d14) // near-dup closer than unrelated
  }

  test("cosine similarity: orthogonal=0, identical=1") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)), (3L, Array(2.0f, 0.0f)),
    ).toDF("id", "v")
    val sims = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.id".as("ia"), $"b.id".as("ib"), Similarity.cosine($"a.v", $"b.v").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 2L))) < 1e-12)
    assert(math.abs(sims((1L, 3L)) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine") {
    val corpus = Seq((10L, Array(1.0f, 0.1f)), (11L, Array(0.1f, 1.0f))).toDF("n_id", "n_vec")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val top = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 2)
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(top == Seq(10L, 11L))
  }

  test("ivfTopK probing every cell equals brute force") {
    val rnd = new scala.util.Random(7)
    val corpus = (10L to 40L).map(i => (i, Array.fill(6)(rnd.nextFloat()))).toDF("n_id", "n_vec")
    val queries = (1L to 3L).map(i => (i, Array.fill(6)(rnd.nextFloat()))).toDF("q_id", "q_vec")
    val centroids = (0 until 4).map(c => c -> Array.fill(6)(rnd.nextDouble() * 2 - 1))
    val brute = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 5)
      .select("q_id", "rank", "n_id").collect().map(_.toSeq).toSet
    val ivf = Similarity.ivfTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec",
      centroids, nProbe = 4, k = 5)
      .select("q_id", "rank", "n_id").collect().map(_.toSeq).toSet
    assert(ivf == brute)

    // partial probe returns a subset ranked consistently
    val partial = Similarity.ivfTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec",
      centroids, nProbe = 1, k = 5).collect()
    assert(partial.nonEmpty && partial.length <= 15)
  }

  test("bounded top-k equals the naive global window under ties and any partitioning") {
    // the partial per-partition top-k must be bit-identical to a single
    // rank window over all scored candidates — adversarial input:
    // duplicate vectors (exact cosine ties broken only by id) and several
    // input partitionings (the partial's group key includes the physical
    // partition id, which must never leak into the result)
    val rnd = new scala.util.Random(42)
    val base = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextFloat())))
    // every third vector is a copy of vector 0 → massive score ties
    val vecs = base.map { case (i, v) => (i, if (i % 3 == 0) base.head._2 else v) }
    val queries = vecs.take(3).map { case (i, v) => (i + 1000L, v) }
      .toDF("q_id", "q_vec")
    def naive(corpus: org.apache.spark.sql.DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val scored = corpus.crossJoin(broadcast(queries))
        .withColumn("cosine", Similarity.cosine($"q_vec", $"n_vec"))
      val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"n_id")
      scored.withColumn("rank", row_number().over(w)).filter($"rank" <= 7)
        .select($"q_id", $"rank", $"n_id", $"cosine")
        .orderBy("q_id", "rank").collect().toSeq
    }
    for (parts <- Seq(1, 4, 13)) {
      val corpus = vecs.toDF("n_id", "n_vec").repartition(parts)
      val got = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 7)
        .orderBy("q_id", "rank").collect().toSeq
      assert(got == naive(corpus), s"divergence at $parts partitions")
    }
    // non-long corpus ids take the declarative fallback — same result
    // modulo the id representation
    val sCorpus = vecs.toDF("n_id", "n_vec")
      .withColumn("n_id", format_string("doc-%03d", $"n_id")).repartition(4)
    val sGot = Similarity.bruteForceTopK(sCorpus, queries, "n_id", "n_vec", "q_id", "q_vec", 7)
      .orderBy("q_id", "rank")
      .select($"q_id", $"rank", $"n_id", $"cosine").collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val lExpected = naive(vecs.toDF("n_id", "n_vec").repartition(4))
      .map(r => (r.getLong(0), r.getInt(1), f"doc-${r.getLong(2)}%03d"))
    assert(sGot == lExpected, "string-id fallback must rank identically")
  }

  test("document chunking: stride windows with overlap, clamped tail, short docs pass through") {
    import graft.ops.Corpus
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens → 3 chunks at max=4, ov=1
      (2L, "a b c"),                                  // fits → 1 chunk
      (3L, "solo")).toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(docs, "doc_id", "text", maxTokens = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // stride 3: starts at w1, w4, w7, w10 → ceil((10-4)/3)+1 = 3 chunks
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, 0L, "w1 w2 w3 w4", 4L),
      (1L, 1L, "w4 w5 w6 w7", 4L),
      (1L, 2L, "w7 w8 w9 w10", 4L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b c", 3L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "solo", 1L)))
    // every adjacent chunk pair shares exactly `overlap` tokens
    val c1 = out.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    assert(c1.sliding(2).forall { case Array(a, b) => a.takeRight(1) == b.take(1) })
    // clamped tail: 11 tokens → last chunk short
    val tail = Corpus.chunkDocuments(
      Seq((9L, (1 to 11).map("t" + _).mkString(" "))).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 4, overlap = 1)
      .orderBy("chunk_idx").collect()
    assert(tail.last.getString(2) == "t10 t11" && tail.last.getLong(3) == 2L)
  }

  test("domain mixing: rates hit the target, sampling is deterministic, absent domains drop") {
    import graft.ops.Corpus
    // rates math: saturation at 1.0, proportional downsample, zero for empty
    val rates = Corpus.domainMixRates(
      Map("web" -> 1000L, "code" -> 100L, "books" -> 0L),
      Map("web" -> 0.5, "code" -> 0.4, "books" -> 0.1), totalRows = 400L)
    assert(rates("web") == 0.2)    // 400*0.5/1000
    assert(rates("code") == 1.0)   // 400*0.4/100 = 1.6 → saturate
    assert(rates("books") == 0.0)

    val rnd = new scala.util.Random(9)
    val docs = (1L to 3000L).map { i =>
      (i, if (i % 3 == 0) "web" else if (i % 3 == 1) "code" else "other")
    }.toDF("doc_id", "source")
    val out = Corpus.mixDomains(docs, "source", "doc_id",
      Map("web" -> 0.5, "code" -> 0.5), totalRows = 600L)
    val byDomain = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byDomain.contains("other"), "untargeted domains must drop")
    // each targeted domain: 1000 rows at rate 0.3 → ~300 (binomial, wide margin)
    for (d <- Seq("web", "code"))
      assert(byDomain(d) > 200 && byDomain(d) < 400, s"$d: ${byDomain(d)}")
    // determinism: identical surviving set on rerun
    val again = Corpus.mixDomains(docs, "source", "doc_id",
      Map("web" -> 0.5, "code" -> 0.5), totalRows = 600L)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("n-gram novelty: shared bigrams score low, unique text scores 1.0, short docs null") {
    import graft.ops.TextAnalysis
    val docs = Seq(
      (1L, "the quick brown fox"),        // bigrams: the quick / quick brown / brown fox
      (2L, "the quick red fox"),          // shares "the quick" with 1
      (3L, "totally novel words here"),   // all unique
      (4L, "single"),                     // no bigram
      (5L, "dup dup dup")).toDF("doc_id", "text") // intra-doc repeat: distinct-per-doc
    val out = TextAnalysis.ngramNovelty(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // doc 1: 3 bigrams, "the quick" shared with doc 2 → 2 novel
    assert(byId(1L) == ((3L, 2L, Some(2.0 / 3))))
    assert(byId(2L) == ((3L, 2L, Some(2.0 / 3))))
    assert(byId(3L) == ((3L, 3L, Some(1.0))))
    assert(byId(4L) == ((0L, 0L, None)))
    // doc 5: "dup dup" appears twice IN the doc but counts once; it's in
    // no other doc → fully novel
    assert(byId(5L) == ((1L, 1L, Some(1.0))))
  }

  test("multi-probe LSH recall >= single-probe, both against exact brute force") {
    val rnd = new scala.util.Random(5)
    val all = (0L until 80L).map(i => (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val corpus = all.drop(6).toDF("n_id", "n_vec")
    val queries = all.take(6).map { case (i, v) => (i + 500L, v) }.toDF("q_id", "q_vec")
    val exact = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 5)
    def recall(df: org.apache.spark.sql.DataFrame) =
      Similarity.meanRecall(Similarity.recallAtK(df, exact, "q_id", "n_id"))
    val single = recall(Similarity.lshTopK(
      corpus, queries, "n_id", "n_vec", "q_id", "q_vec", dim = 16, nBits = 4, k = 5))
    val multi = recall(Similarity.lshTopKMultiProbe(
      corpus, queries, "n_id", "n_vec", "q_id", "q_vec", dim = 16, nBits = 4, k = 5))
    // probing every Hamming-1 bucket can only widen the candidate set
    assert(multi >= single, s"multi-probe recall $multi < single $single")
    assert(multi > 0.5, s"multi-probe recall too low: $multi")
  }

  test("k-means centroids: deterministic across runs, unit-norm, and recall beats raw-sample seeds") {
    val rnd = new scala.util.Random(13)
    // three well-separated clusters on the unit sphere + noise
    def unit(base: Array[Double]) = {
      val v = base.map(_ + rnd.nextGaussian() * 0.1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val bases = Seq(Array(1.0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0), Array(0, 0, 1.0, 0, 0, 0))
    val corpus = (0L until 90L).map(i => (i, unit(bases((i % 3).toInt)))).toDF("n_id", "n_vec")

    val c1 = Similarity.kmeansCentroids(corpus, "n_id", "n_vec", k = 3, maxIter = 10)
    val c2 = Similarity.kmeansCentroids(corpus, "n_id", "n_vec", k = 3, maxIter = 10)
    assert(c1.map(_._2.toSeq) == c2.map(_._2.toSeq), "training must be run-deterministic")
    c1.foreach { case (_, v) =>
      assert(math.abs(math.sqrt(v.map(x => x * x).sum) - 1.0) < 1e-9, "spherical centroids")
    }

    // trained cells at nProbe=1 must dominate untrained first-k seeds
    val queries = (100L until 106L).map(i => (i, unit(bases((i % 3).toInt)))).toDF("q_id", "q_vec")
    val exact = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 5)
    val seeded = corpus.orderBy("n_id").limit(3).collect().zipWithIndex.map { case (r, i) =>
      i -> r.getSeq[Float](1).map(_.toDouble).toArray
    }.toSeq
    def recall(cents: Seq[(Int, Array[Double])]) = Similarity.meanRecall(Similarity.recallAtK(
      Similarity.ivfTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", cents, 1, 5),
      exact, "q_id", "n_id"))
    assert(recall(c1) == 1.0, "trained cells align with the true clusters")
    assert(recall(c1) >= recall(seeded))
  }

  test("ivfPqTopK: full probe + full shortlist equals brute force; codes are deterministic and m-wide") {
    val rnd = new scala.util.Random(3)
    val dim = 64
    val emb = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.filter($"vec_id" >= 4)
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val cents = Similarity.fixedCentroids(dim, k = 4)
    val cbs = Similarity.pqCodebooks(dim, m = 8, kSub = 16)

    // probing every cell with a corpus-sized shortlist removes both
    // approximations — the exact rerank must then reproduce brute force
    val full = Similarity.ivfPqTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec",
      cents, cbs, nProbe = 4, shortlist = 100, k = 5)
      .select("q_id", "rank", "n_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", k = 5)
      .select("q_id", "rank", "n_id").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == brute)

    // encoding: one int per subspace, stable across runs
    val enc1 = Similarity.pqEncode(corpus, "n_vec", cbs)
      .select($"n_id", $"__code").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val enc2 = Similarity.pqEncode(corpus, "n_vec", cbs)
      .select($"n_id", $"__code").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(enc1 == enc2)
    assert(enc1.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))

    // the real (approximate) setting still finds most of the truth
    val approx = Similarity.ivfPqTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec",
      cents, cbs, nProbe = 2, shortlist = 10, k = 5)
    val rec = Similarity.meanRecall(Similarity.recallAtK(
      approx, Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 5),
      "q_id", "n_id"))
    assert(rec > 0.3, s"recall $rec")
  }

  test("persisted PQ index: search equals the inline path; appended vectors become findable") {
    val rnd = new scala.util.Random(5)
    val dim = 64
    val emb = (0L until 30L).map(i => (i, Array.fill(dim)(rnd.nextDouble() - 0.5)))
    val queries = emb.take(3).toDF("vec_id", "embedding")
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus0 = emb.slice(3, 25).toDF("vec_id", "embedding")
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    val cents = Similarity.fixedCentroids(dim, k = 4)
    val cbs = Similarity.pqCodebooks(dim, m = 8, kSub = 16)
    val path = tmpDir("pq_index") + "/idx"

    Similarity.writePqIndex(corpus0, "n_id", "n_vec", cents, cbs, path)
    val fromIndex = Similarity.searchPqIndex(spark, path, corpus0, queries,
      "n_id", "n_vec", "q_id", "q_vec", cents, cbs, nProbe = 2, shortlist = 10, k = 5)
      .select("q_id", "rank", "n_id").collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val inline = Similarity.ivfPqTopK(corpus0, queries, "n_id", "n_vec", "q_id", "q_vec",
      cents, cbs, nProbe = 2, shortlist = 10, k = 5)
      .select("q_id", "rank", "n_id").collect().toSeq.map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(fromIndex.toSet == inline.toSet)

    // ingest a batch containing an exact copy of query 0's vector: after
    // the append-encode (narrow map over the batch only), the index must
    // surface it at rank 1 with full probing
    val batch = Seq((100L, emb.head._2)).toDF("vec_id", "embedding")
      .select($"vec_id".as("n_id"), $"embedding".as("n_vec"))
    Similarity.writePqIndex(batch, "n_id", "n_vec", cents, cbs, path, append = true)
    val grown = Similarity.searchPqIndex(spark, path, corpus0.unionByName(batch), queries,
      "n_id", "n_vec", "q_id", "q_vec", cents, cbs, nProbe = 4, shortlist = 30, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(grown(0L) == 100L)
  }

  test("random projection: deterministic, exact on identical vectors, JL-preserves ranking signal") {
    val rnd = new scala.util.Random(9)
    val emb = (0L until 30L).map(i => (i, Array.fill(64)(rnd.nextDouble() - 0.5)))
      .toDF("vec_id", "embedding")
    val planes = Similarity.projectionPlanes(64, 16)
    val p = emb.withColumn("pv", Similarity.randomProject($"embedding", planes))
    val p1 = p.select($"vec_id", $"pv").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val p2 = emb.withColumn("pv", Similarity.randomProject($"embedding", planes))
      .select($"vec_id", $"pv").collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(p1 == p2 && p1.values.forall(_.length == 16))
    // identical vectors stay identical; projected top-1 of a vector against
    // a corpus containing its copy is the copy
    val dup = Seq((99L, p1(0L).toArray)).toDF("vec_id", "pv")
    val corpus = p.select($"vec_id".as("n_id"), $"pv".as("n_vec")).filter($"n_id" > 0)
      .unionByName(dup.select($"vec_id".as("n_id"), $"pv".as("n_vec")))
    val q = p.filter($"vec_id" === 0).select($"vec_id".as("q_id"), $"pv".as("q_vec"))
    val top = Similarity.bruteForceTopK(corpus, q, "n_id", "n_vec", "q_id", "q_vec", 1)
      .select("n_id").as[Long].head()
    assert(top == 99L)
  }

  test("recall@k: exact vs itself is 1.0; degraded approx is proportional; IVF full-probe is 1.0") {
    val rnd = new scala.util.Random(11)
    val corpus = (10L to 60L).map(i => (i, Array.fill(6)(rnd.nextFloat()))).toDF("n_id", "n_vec")
    val queries = (1L to 4L).map(i => (i, Array.fill(6)(rnd.nextFloat()))).toDF("q_id", "q_vec")
    val exact = Similarity.bruteForceTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", 5)
    assert(Similarity.meanRecall(Similarity.recallAtK(exact, exact, "q_id", "n_id")) == 1.0)

    // drop 2 of 5 exact hits per query → recall 0.6
    val degraded = exact.where($"rank" <= 3)
    val r = Similarity.meanRecall(Similarity.recallAtK(degraded, exact, "q_id", "n_id"))
    assert(math.abs(r - 0.6) < 1e-9)

    val centroids = (0 until 4).map(c => c -> Array.fill(6)(rnd.nextDouble() * 2 - 1))
    val ivfFull = Similarity.ivfTopK(corpus, queries, "n_id", "n_vec", "q_id", "q_vec", centroids, 4, 5)
    assert(Similarity.meanRecall(Similarity.recallAtK(ivfFull, exact, "q_id", "n_id")) == 1.0)
  }

  test("hyperplane signatures are deterministic and bucket-compatible") {
    val vecs = Seq((1L, Array.fill(8)(0.5f))).toDF("id", "v")
    val s1 = vecs.select(Similarity.hyperplaneSignature($"v", 8, 4)).head().getLong(0)
    val s2 = vecs.select(Similarity.hyperplaneSignature($"v", 8, 4)).head().getLong(0)
    assert(s1 == s2)
    assert(s1 >= 0 && s1 < 16)
  }

  test("char-ngram profiles distinguish languages; zero scores → und") {
    val profiles = Map(
      "aa" -> Seq(("th", 1.0), ("he", 0.5)),
      "bb" -> Seq(("zz", 2.0)),
    )
    val d = Seq((1L, "the theory thereof"), (2L, "fizz buzz jazz zz"), (3L, "qqq")).toDF("id", "text")
    val out = d.select($"id", TextAnalysis.predictLangByProfile($"text", profiles).as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "aa", 2L -> "bb", 3L -> "und"))
  }

  test("chess archive planning: range minus seen, current month always retried") {
    import graft.connectors.sources.Specialized.Chess
    val range = Chess.monthRange("2023/11", "2024/02")
    assert(range == Seq("2023/11", "2023/12", "2024/01", "2024/02"))
    val todo = Chess.plan(range, seen = Set("2023/11", "2023/12", "2024/02"), currentYm = "2024/02")
    assert(todo == Seq("2024/01", "2024/02")) // unseen + current month retry
  }

  test("text analysis: tokens, quality, langid, fingerprint") {
    val d = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val q = d.select(
      TextAnalysis.wordCount($"text").as("w"),
      TextAnalysis.tokenCount($"text").as("t"),
      TextAnalysis.predictLang($"text").as("lang"),
      TextAnalysis.fingerprint($"text").as("fp"),
    ).head()
    assert(q.getAs[Int]("w") == 3)
    assert(q.getAs[Int]("t") == 3)
    assert(q.getAs[String]("lang") == "en")
    assert(q.getAs[String]("fp").length == 32)
  }

  test("batched decode matches per-row decode; frame plan fans out without blobs") {
    val d = (1L to 100L).map(i => (i, s"blob-$i")).toDF("id", "text")
      .withColumn("content", $"text".cast("binary"))
    val single = Multimodal.decodeFeatures(d, "id", "content")
      .collect().map(f => f.id -> f.feature.toSeq).toMap
    val batched = Multimodal.decodeFeaturesBatched(d, "id", "content", batchSize = 7)
      .collect().map(f => f.id -> f.feature.toSeq).toMap
    assert(batched == single)

    val feats = Multimodal.decodeFeatures(d, "id", "content").toDF()
    val plan = Multimodal.sampleFramePlan(feats, "id", "n_frames", stride = 4)
    assert(plan.columns.toSeq == Seq("id", "frame_idx")) // no blob column
    val one = feats.where($"id" === 1).head()
    val expected = (0 until one.getAs[Int]("n_frames") by 4).toSeq
    assert(plan.where($"id" === 1).orderBy("frame_idx").select("frame_idx")
      .as[Int].collect().toSeq == expected)
  }

  test("resize stage bounds dimensions, keeps aspect, shrinks bytes, stays narrow") {
    val d = (1L to 50L).map(i => (i, "x" * (100 + i.toInt))).toDF("id", "text")
      .withColumn("content", $"text".cast("binary"))
    val resized = Multimodal.resizeImages(d, "id", "content", maxDim = 64)
    val rows = resized.collect()
    assert(rows.length == 50)
    val orig = Multimodal.decodeFeatures(d, "id", "content").collect().map(f => f.id -> f).toMap
    rows.foreach { r =>
      assert(math.max(r.width, r.height) <= 64)
      val o = orig(r.id)
      // aspect preserved within integer rounding
      if (math.max(o.width, o.height) > 64) {
        val s = 64.0 / math.max(o.width, o.height)
        assert(math.abs(r.width - o.width * s) <= 1 && math.abs(r.height - o.height * s) <= 1)
        assert(r.content.length < o.n_bytes)
      }
    }
    // blob stage plans as a narrow map: no exchange before the kernel
    val plan = resized.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("PII redaction replaces all occurrences in order and leaves clean text alone") {
    val d = Seq(
      (1L, "mail a@b.co and c.d+x@e.org call 555-1234 twice 555-0000 at 10.0.0.1"),
      (2L, "no pii here 556-1234 999.999"), // near-misses must survive
    ).toDF("id", "text")
    val out = d.select($"id", TextAnalysis.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "mail <EMAIL> and <EMAIL> call <PHONE> twice <PHONE> at <IP>")
    assert(out(2L) == "no pii here 556-1234 999.999")
    val counts = d.where($"id" === 1)
      .select(TextAnalysis.piiCounts($"text").map { case (n, c) => c.as(n) }: _*).head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) == ((2L, 2L, 1L)))
  }

  test("c4LineFilter applies each rule, rejoins survivors, drops line-less docs") {
    val d = Seq(
      (1L, "a good long line stays here.\nshort one.\nno terminal punct line\nJavaScript required to proceed.\nanother keeper sentence ends right!"),
      (2L, "only { code } blocks here.\ntiny.\nnothing survives this doc"),
      (3L, "Does a question line survive? \n\"Quoted line also survives.\"")).toDF("id", "text")
    // doc 3 line 1 ends '? ' — trailing space means last char is ' ': dropped;
    // line 2 ends with the quote char: kept
    val out = TextAnalysis.c4LineFilter(d, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 3L), "doc 2 must vanish (zero kept lines)")
    val d1 = out.find(_._1 == 1L).get
    assert(d1._2 == "a good long line stays here.\nanother keeper sentence ends right!")
    assert(d1._3 == 5L && d1._4 == 2L)
    val d3 = out.find(_._1 == 3L).get
    assert(d3._2 == "\"Quoted line also survives.\"" && d3._3 == 2L && d3._4 == 1L)
    // policy matching is case-insensitive
    val cookie = TextAnalysis.c4LineFilter(
      Seq((9L, "We Use COOKIES on this site.")).toDF("id", "text"), "id", "text")
    assert(cookie.count() == 0L)
    // the whole filter is a narrow pass: no shuffle
    val plan = TextAnalysis.c4LineFilter(d, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4LineFilter must not shuffle:\n$plan")
  }

  test("repetition stats count duplicate words and 3-grams; short docs are zero-safe") {
    val d = Seq(
      (1L, "a b c a b c a b x"), // 9 words, {a,b,c,x}=4 distinct → 5 dups; 7 3-grams
      (2L, "one two"),           // under 3 words: no 3-grams, not a crash
    ).toDF("id", "text")
    val out = d.select(
      Seq($"id") ++ TextAnalysis.repetitionStats($"text").map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // 3-grams of doc 1: "a b c","b c a","c a b","a b c","b c a","c a b","a b x" → 4 distinct, 3 dups
    assert(out(1L) == ((9L, 5L, 7L, 3L)))
    assert(out(2L) == ((2L, 0L, 0L, 0L)))
  }

  test("multimodal decode plumbing produces one feature row per blob") {
    val d = Seq((1L, "abc"), (2L, "defg")).toDF("id", "text")
      .withColumn("content", $"text".cast("binary"))
    val feats = Multimodal.decodeFeatures(d, "id", "content").collect()
    assert(feats.length == 2)
    assert(feats.find(_.id == 2L).get.n_bytes == 4L)
    // deterministic: same bytes → same features
    val again = Multimodal.decodeFeatures(d, "id", "content").collect()
    assert(feats.map(_.feature.toSeq).toSet == again.map(_.feature.toSeq).toSet)
  }
}
