package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for training-data pipelines: the steps
  * between "deduplicated documents" and "training mix" — stratified
  * sampling, context-window sequence packing, and eval-set
  * decontamination. All are declarative window/join plans: no driver
  * loops, no UDFs, shuffles only on the natural keys (stratum, pack key,
  * n-gram hash).
  */
object Corpus {

  /** Exact-count stratified sample: the first `perStratum` rows of each
    * stratum in a DETERMINISTIC pseudo-random order (xxhash64 of the id —
    * stable across runs/cluster sizes, unlike `rand()`). One shuffle on
    * the stratum key; at 100 TB strata are large so the window stays
    * balanced. Use for per-language / per-source quotas in a training mix.
    */
  def stratifiedExact(df: DataFrame, stratumCol: String, idCol: String, perStratum: Int,
      orderBy: Option[Column] = None): DataFrame = {
    val ord = orderBy.getOrElse(xxhash64(col(idCol)))
    val w = Window.partitionBy(col(stratumCol)).orderBy(ord, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Proportional deterministic sample: keep ~1/`mod` of rows chosen by id
    * hash — a narrow map (no shuffle at all), the right shape for "10% of
    * 100 TB" cuts.
    */
  def hashSample(df: DataFrame, idCol: String, mod: Int, keep: Int = 0): DataFrame =
    df.filter(pmod(xxhash64(col(idCol)), lit(mod)) === keep)

  /** Leakage-safe train/eval split: assign every document a split by
    * hashing its NEAR-DUP CLUSTER root instead of its own id, so a
    * near-duplicate pair can never straddle train and eval — the
    * train-test contamination channel plain random splits leave open
    * (Lee et al. 2021, arXiv:2107.06499 §6.2 measure exactly this
    * leak). `clusters` is `Dedup.clusterPairs` output (id, cluster) —
    * docs absent from it are singletons and hash their own id, which
    * IS their component root, so the whole assignment is one left equi
    * join + a narrow md5 map; nothing about the split recomputes pair
    * work. The md5-hex-prefix uniform (not xxhash64) keeps the exact
    * assignment replayable by an external SQL oracle, the same trade
    * every sampling op here makes. Returns the docs plus (root, split)
    * with split in [0, nSplits).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusters: DataFrame,
      nSplits: Int, salt: String = "split"): DataFrame = {
    require(nSplits > 0, s"nSplits must be positive, got $nSplits")
    val root = coalesce(col("cluster"), col(idCol)).as("root")
    docs
      .join(clusters.select(col("id").as(idCol), col("cluster")), Seq(idCol), "left")
      .withColumn("root", root)
      .withColumn("split",
        pmod(conv(substring(md5(concat_ws(":", lit(salt), col("root").cast("string"))),
          1, 15), 16, 10).cast("long"), lit(nSplits.toLong)))
      .drop("cluster")
  }

  /** Cluster-balanced diversity sample: assign each embedding to its
    * nearest coarse centroid (`Similarity.ivfAssign` — a narrow map over a
    * broadcast centroid list), then keep the `perCluster` best rows of
    * each semantic cluster by (`scoreCol` desc, id asc). The per-cluster
    * selection is the native `BoundedTopK` aggregate, so each map task
    * ships at most perCluster × cells rows into the one shuffle — no
    * window sort over full clusters, no skew from a hot cluster. Use
    * after dedup to keep the training mix from over-representing one
    * semantic region (the embedding-space analog of `stratifiedExact`'s
    * per-language quotas).
    *
    * `idCol` must be LongType (the BoundedTopK buffer contract). Returns
    * (cell, rank, idCol, score) — rank is 1-based within the cluster.
    */
  def clusterBalancedSample(emb: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Double])], perCluster: Int, scoreCol: Column): DataFrame = {
    val assigned = Similarity.ivfAssign(emb, vecCol, centroids)
      .select(col("__cell").cast("long").as("cell"), col(idCol),
        scoreCol.cast("double").as("__score"))
    assigned
      .groupBy(col("cell"))
      .agg(graft.functions.BoundedTopK.topK(col("__score"), col(idCol), perCluster).as("__top"))
      .select(col("cell"), posexplode(col("__top")))
      .select(col("cell"), (col("pos") + 1).cast("long").as("rank"),
        col("col.i").as(idCol), col("col.s").as("score"))
  }

  /** Pack documents into fixed-budget context windows: documents are laid
    * out in a deterministic order (`idCol`) and the running token total
    * assigns each doc to bin floor(tokens_before / budget). Documents
    * never split; a bin may overflow by less than one document (offset
    * packing — the streaming-friendly variant of next-fit). `packKey`
    * partitions the packing (e.g. language) so each group packs
    * independently — ONE per-group window cumsum.
    *
    * Without a `packKey` the cumsum is GLOBAL, which a bare window would
    * compute on a single partition. Instead the plan is a two-level
    * cumsum: deterministic range buckets from approxQuantile boundaries
    * of the (numeric) id, a per-bucket windowed cumsum, and per-bucket
    * offsets (sum of all earlier buckets) broadcast-joined back. The
    * boundary VALUES only affect load balance — the result is the exact
    * global cumsum for any monotone bucketing, so approxQuantile's
    * approximation error is harmless. The only non-distributed step is
    * the offset window over `buckets` rows.
    */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      packKey: Option[String] = None,
      buckets: Int = 32,
  ): DataFrame = packKey match {
    case Some(k) =>
      val w = Window.partitionBy(col(k)).orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("__cum", sum(col(tokenCol)).over(w))
        .withColumn("pack_id", floor((col("__cum") - col(tokenCol)) / budget))
        .drop("__cum")
    case None =>
      require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"unkeyed packSequences needs a numeric id column to range-bucket the global " +
          s"cumsum ('$idCol' is ${df.schema(idCol).dataType.simpleString}); pass a packKey instead")
      // the boundary sketch and the per-bucket offsets both only need the
      // (id, token) pair — materialize that slim projection ONCE so the
      // full upstream plan (joins, parses) isn't re-executed three times:
      // it now runs once for the slim build and once for the final pass
      val slim = df.select(col(idCol), col(tokenCol)).localCheckpoint(true)
      // one bounded pass to pick balance-only boundaries (deterministic GK sketch)
      val cuts = slim.stat
        .approxQuantile(idCol, (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .distinct.sorted
      val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
        acc + when(col(idCol).cast("double") > lit(c), 1).otherwise(0)
      }
      val b = df.withColumn("__b", bucket)
      val wLocal = Window.partitionBy(col("__b")).orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // unpartitioned by design, NOT a scale hazard: this window's input
      // is the per-bucket AGGREGATE below — at most `buckets` (32) rows
      // by construction, never corpus rows. (It is exactly what the
      // two-level cumsum exists to avoid on the full data; the WindowExec
      // single-partition warning it triggers is a false alarm.)
      val wOff = Window.orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      val offsets = slim.withColumn("__b", bucket)
        .groupBy(col("__b")).agg(sum(col(tokenCol)).as("__bsum"))
        .select(col("__b"), coalesce(sum(col("__bsum")).over(wOff), lit(0L)).as("__off"))
      b.join(broadcast(offsets), Seq("__b"))
        .withColumn("__cum", sum(col(tokenCol)).over(wLocal) + col("__off"))
        .withColumn("pack_id", floor((col("__cum") - col(tokenCol)) / budget))
        .drop("__cum", "__b", "__off")
  }

  /** Token-budget selection: keep the highest-priority documents whose
    * RUNNING token total stays within `budget` — "the best N tokens of
    * the corpus", the step that turns a scored crawl into a training
    * mix of a target size. Order is (priority DESC, id ASC), fully
    * deterministic; the kept set is the longest prefix of that order
    * with cumulative tokens ≤ budget.
    *
    * The global cumsum uses the same two-level plan as unkeyed
    * `packSequences`: approxQuantile range buckets over the priority
    * (boundaries affect only load balance — any monotone bucketing
    * yields the exact global cumsum), per-bucket window, broadcast
    * per-bucket offsets. No single-partition window at any corpus size.
    */
  def tokenBudgetSelect(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      priorityCol: String,
      budget: Long,
      buckets: Int = 32,
  ): DataFrame = {
    require(df.schema(priorityCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tokenBudgetSelect needs a numeric priority column ('$priorityCol' is " +
        s"${df.schema(priorityCol).dataType.simpleString})")
    // ascending surrogate of (priority DESC): bucket boundaries and the
    // within-bucket sort share it, so bucketing is monotone in the order.
    // NULL priorities sort LAST (SQL DESC semantics — an unscored doc
    // must not crowd out scored ones): they get their own final bucket,
    // past every boundary bucket.
    val ord = -col(priorityCol).cast("double")
    val slim = df.select(col(idCol), col(tokenCol), ord.as("__ord")).localCheckpoint(true)
    val cuts = slim.stat
      .approxQuantile("__ord", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted
    def bucketOf(c: Column) = {
      val boundary = cuts.foldLeft(lit(0)) { (acc, cut) =>
        acc + when(c > lit(cut), 1).otherwise(0)
      }
      when(c.isNull, lit(cuts.length + 1)).otherwise(boundary)
    }
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("__ord").asc_nulls_last, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // unpartitioned by design, NOT a scale hazard: operates on the
    // per-bucket aggregate (<= `buckets` rows), never corpus rows
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = slim.withColumn("__b", bucketOf(col("__ord")))
      .groupBy(col("__b")).agg(sum(col(tokenCol)).as("__bsum"))
      .select(col("__b"), coalesce(sum(col("__bsum")).over(wOff), lit(0L)).as("__off"))
    df.withColumn("__ord", ord).withColumn("__b", bucketOf(col("__ord")))
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum", sum(col(tokenCol)).over(wLocal) + col("__off"))
      .filter(col("__cum") <= budget)
      .drop("__ord", "__b", "__off", "__cum")
  }

  /** Context-window chunking — the dual of `packSequences`: split each
    * document that exceeds `maxTokens` whitespace tokens into overlapping
    * windows of `maxTokens`, stepping by `maxTokens - overlap` (the
    * standard stride trick so no span is ever cut without appearing whole
    * in some chunk). Purely narrow: a per-row transform + explode, no
    * shuffle — at 100 TB chunking happens in the scan stage and only
    * chunk-sized rows flow on. Returns (id, chunk_idx, chunk_text,
    * n_tokens); the final chunk may be short (clamped, never empty).
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0,
  ): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    val ws = split(col(textCol), " ")
    val n = size(ws)
    // smallest m with (m-1)*stride + maxTokens >= n; one chunk when it fits
    val nChunks = when(n <= maxTokens, lit(1L))
      .otherwise(ceil((n - maxTokens).cast("double") / stride).cast("long") + 1L)
    val chunks = transform(sequence(lit(0L), nChunks - 1),
      c => concat_ws(" ", slice(ws, (c * stride + 1).cast("int"), lit(maxTokens))))
    df.select(col(idCol), n.cast("long").as("__n"), posexplode(chunks))
      .select(
        col(idCol),
        col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"),
        least(lit(maxTokens.toLong), col("__n") - col("pos") * stride).cast("long").as("n_tokens"))
  }

  /** Deterministic per-row uniform in [0, 1): 60 bits of
    * md5(seed:id) / 2^60. Stable across runs, cluster sizes, and engines
    * (the md5-hex-prefix trick an external SQL oracle replays exactly) —
    * the acceptance coin for weighted sampling, never `rand()`.
    */
  def uniformHash(id: Column, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id.cast("string"))), 1, 15), 16, 10)
      .cast(org.apache.spark.sql.types.LongType).cast("double") /
      lit(1152921504606846976L).cast("double") // 2^60

  /** Per-domain acceptance rates that shape an observed distribution into
    * a `target` mixture of at most `totalRows` rows:
    * rate(d) = min(1, totalRows * frac(d) / count(d)). A domain whose
    * corpus share falls below its target share saturates at rate 1 (you
    * cannot upsample by filtering); domains absent from `target` get 0.
    * Pure arithmetic over the (tiny) per-domain counts.
    */
  def domainMixRates(
      counts: Map[String, Long],
      target: Map[String, Double],
      totalRows: Long,
  ): Map[String, Double] =
    target.map { case (d, frac) =>
      val c = counts.getOrElse(d, 0L)
      d -> (if (c == 0L) 0.0 else math.min(1.0, totalRows.toDouble * frac / c))
    }

  /** Weighted domain mixing — reshape a corpus toward a target source
    * distribution (the "60% web / 20% code / 20% books" step of every
    * training-data pipeline): one map-side-combined count per domain
    * (returns #domains rows to the driver — the same justified-tiny
    * collect as k-means centroids), then a NARROW deterministic
    * acceptance filter `uniformHash(id) < rate(domain)`. No shuffle of
    * the data itself, stable under reruns and repartitioning, and the
    * md5 coin makes the exact surviving set oracle-replicable.
    */
  def mixDomains(
      df: DataFrame,
      domainCol: String,
      idCol: String,
      target: Map[String, Double],
      totalRows: Long,
      seed: String = "mix",
  ): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = domainMixRates(counts, target, totalRows)
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (d, r)) =>
      when(col(domainCol) === d, lit(r)).otherwise(acc)
    }
    df.filter(uniformHash(col(idCol), seed) < rateCol)
  }

  /** Word n-gram hashes of a text column: the join key for overlap
    * detection. Hashing keeps the shuffled key 8 bytes instead of the
    * n-gram string.
    */
  def ngramHashes(text: Column, n: Int, hashFn: Column => Column = xxhash64(_)): Column = {
    val ws = split(text, " ")
    // guard: sequence(0, negative) would generate a DESCENDING range in
    // Spark — a doc shorter than n grams must yield an empty set instead
    val idx = when(size(ws) >= n, sequence(lit(0), size(ws) - n))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i => hashFn(concat_ws(" ", slice(ws, i + 1, lit(n))))))
  }

  /** Train/eval contamination: for each train document, how many of its
    * distinct word n-grams appear in ANY eval document. The plan is
    * explode → semi-ish aggregate join on the hash — the eval side is
    * usually tiny (benchmarks), so after explode it broadcasts; the train
    * side never shuffles more than its exploded n-grams. Returns (id,
    * n_ngrams, n_contaminated, contamination = fraction of the doc's
    * n-grams seen in eval). Filter `contamination > threshold` to drop
    * leaked documents.
    *
    * The eval-side broadcast is COUNT-GATED (`broadcastRowCap` distinct
    * n-grams): "eval is tiny" is the common case, not a precondition —
    * a decontamination run against a large held-out corpus degrades to a
    * shuffled hash join with identical output instead of dying on the
    * broadcast limit.
    */
  /** Bloom-filter decontamination: same contract shape as `contamination`,
    * but the eval-side membership structure is an m-bit Bloom bitmap — k
    * bit positions per n-gram from j-salted md5 hashes (the standard
    * k-independent-hash Bloom construction) — instead of the gram set
    * itself. The bitmap is m/64 longs, a CONSTANT-size broadcast no
    * matter how large the eval/blocklist corpus grows (where
    * `contamination`'s eval broadcast is count-gated on corpus size); the
    * price is the Bloom false-positive rate, which only ever
    * OVER-counts contamination — the safe direction for decontamination.
    *
    * Fully declarative and codegen-friendly: positions are column
    * expressions, the bitmap is a bit_or aggregate over 64-bit word
    * indices densified once via map_from_entries (one row of m/64
    * longs), and the probe is a broadcast single-row cross join plus a
    * forall over element_at bit tests. Bloom semantics — including
    * false positives — replay exactly in SQL: a gram hits iff every one
    * of its k md5-derived positions is in the eval corpus's set-bit
    * set, so the oracle gate is bit-exact, not approximate. (md5 rather
    * than xxhash64 is what makes the positions replayable in the
    * oracle; a production run can swap any hash in `posFor`.)
    */
  def bloomContamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      mBits: Int = 1 << 20,
      k: Int = 3,
  ): DataFrame = {
    require(mBits >= 64, "mBits must be at least one word")
    require(k >= 1, "k must be positive")
    val nWords = (mBits + 63) / 64
    // j-salted 60-bit md5 positions; values < 2^20 keep the double-typed
    // division in the word/bit split exact
    def posFor(gram: Column): Column = array((0 until k).map { j =>
      pmod(conv(substring(md5(concat(lit(s"$j:"), gram)), 1, 15), 16, 10).cast("long"),
        lit(mBits.toLong))
    }: _*)
    val gramsOf = (c: Column) => ngramHashes(c, n, g => g) // gram STRINGS
    val bitmap = eval
      .select(explode(gramsOf(col(textCol))).as("__g"))
      .select(explode(posFor(col("__g"))).as("__p"))
      .select(floor(col("__p") / 64).cast("long").as("__w"),
        call_function("shiftleft", lit(1L), (col("__p") % 64).cast("int")).as("__b"))
      .groupBy("__w").agg(expr("bit_or(__b)").as("__bits"))
      .agg(map_from_entries(collect_list(struct(col("__w"), col("__bits")))).as("__m"))
      .select(transform(sequence(lit(0L), lit(nWords - 1L)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__bm"))
    val trainGrams = train
      .select(col(idCol), explode(gramsOf(col(textCol))).as("__g"))
    val hits = trainGrams
      .crossJoin(broadcast(bitmap))
      .filter(forall(posFor(col("__g")), p =>
        call_function("shiftright", element_at(col("__bm"), floor(p / 64).cast("int") + 1),
          (p % 64).cast("int")).bitwiseAND(lit(1L)) =!= 0))
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    train
      .select(col(idCol), size(gramsOf(col(textCol))).cast("long").as("n_ngrams"))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_ngrams"))
          .as("contamination"),
      )
  }

  /** Sketch UNION algebra — what makes fixed-size sketches compose at
    * fleet scale: per-corpus (or per-partition, per-day, per-source)
    * sketches built independently merge into the sketch OF THE UNION,
    * exactly. CMS cells add; HLL registers max. Both identities are
    * deterministic here (same hash family, integer state), so
    * merge(sketch(A), sketch(B)) == sketch(A ∪ B) bit-for-bit — pinned
    * by `SketchMergeSpec`, not just approximately true.
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("__cms").as("__a"))
      .crossJoin(b.select(col("__cms").as("__b"))) // both single-row
      .select(zip_with(col("__a"), col("__b"), (x, y) => x + y).as("__cms"))

  /** Per-register max of two [[hllRegisters]] tables = the register
    * table of the union corpus.
    */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("register").agg(max("max_rho").as("max_rho"))

  /** The CMS counter array of a corpus's token stream as a ONE-ROW frame
    * (column `__cms`, length depth×width) — the broadcastable, mergeable
    * ([[cmsMerge]]) representation `cmsTokenCounts` probes.
    */
  def cmsSketch(
      corpus: DataFrame,
      textCol: String,
      width: Int = 1 << 16,
      depth: Int = 3,
  ): DataFrame = {
    require(width >= 2 && depth >= 1, "need at least a 2-wide, 1-deep sketch")
    def posOf(tok: Column, j: Int): Column =
      pmod(conv(substring(md5(concat(lit(s"$j:"), tok)), 1, 15), 16, 10).cast("long"),
        lit(width.toLong))
    corpus.select(explode(split(col(textCol), " ", -1)).as("__t"))
      .select(explode(array((0 until depth).map(j =>
        (lit(j.toLong) * width + posOf(col("__t"), j)).as(s"c$j")): _*)).as("__cell"))
      .groupBy("__cell").agg(count(lit(1)).as("__n"))
      .agg(map_from_entries(collect_list(struct(col("__cell"), col("__n")))).as("__m"))
      .select(transform(sequence(lit(0L), lit(depth.toLong * width - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__cms"))
  }

  /** Count-Min-Sketch token frequencies: estimate every probe token's
    * corpus frequency from a FIXED-memory sketch — depth `d` salted-md5
    * rows × width `w` counters — instead of a corpus-sized frequency
    * table. The classic Cormode–Muthukrishnan bound applies: estimates
    * only ever OVER-count (hash collisions add, never subtract), with
    * error ≤ N/w at confidence 1−(1/2)^d. At 100 TB the sketch is the
    * only corpus-stats structure that broadcasts at constant size — the
    * exact per-token table it replaces is itself corpus-sized.
    *
    * Same declarative construction as `bloomContamination`: counter
    * cells are a (row, position) count aggregate densified once into a
    * single d·w-long array, the probe is a broadcast single-row cross
    * join + `least` over d positioned reads. Everything — including
    * every collision — replays exactly in SQL, so the sketch gates
    * bit-for-bit against the oracle rather than within a tolerance.
    *
    * Returns one row per distinct probe token: (token, est, true_cnt)
    * with est ≥ true_cnt always; the gap IS the measured sketch error.
    */
  /** Weighted Poisson sampling: keep each row independently with
    * inclusion probability min(1, k·w_i / W) — expected sample size k,
    * probabilities proportional to weight (the Horvitz–Thompson
    * primitive behind weighted corpus mixes: sample documents
    * proportional to quality score or token count without a global
    * sort). The "randomness" is a 20-bit md5-uniform of the id — stable
    * across runs and cluster sizes, and the keep decision
    * u · W < k · w · 2^20 is exact integer arithmetic end to end, which
    * is what lets a sampling operator gate bit-for-bit against a SQL
    * oracle at all. The products are computed in DECIMAL(38,0), not
    * BIGINT: u < 2^20, so u·W needs up to 20+63 bits — a corpus
    * weighted by n_chars at the 100 TB scale pushes W past 2^43 and
    * would silently wrap a 64-bit product (corrupting the sample with
    * no error), while 38-digit decimal holds ~126 bits and stays exact.
    * One tiny aggregate for W; the decision itself is a narrow map — no
    * shuffle.
    */
  def weightedPoissonSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      expectedK: Long,
      salt: String = "wps",
  ): DataFrame = {
    require(expectedK > 0, "expectedK must be positive")
    val total = df.agg(coalesce(sum(col(weightCol).cast("long")), lit(0L))).head.getLong(0)
    require(total > 0, "weight total must be positive")
    val u = pmod(conv(substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("long"), lit(1L << 20))
    val dec = "decimal(38,0)"
    df.filter(u.cast(dec) * lit(total).cast(dec) <
      lit(expectedK).cast(dec) * col(weightCol).cast("long").cast(dec) * lit(1L << 20).cast(dec))
  }

  /** Grouped exact quantiles — [[exactQuantiles]] per group key (length
    * distributions per language/source, the standard corpus report).
    * Same machinery with the group key riding every stage: the histogram
    * is (group, value) keyed, the cumulative window partitions by group
    * (never wider than one group's value domain), per-group totals come
    * from the histogram itself, and the percentile lookup is a broadcast
    * join. Returns (groupCol, pct, value).
    */
  def exactQuantilesBy(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      pcts: Seq[Int],
  ): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100), "pcts in [0, 100]")
    val hist = df.select(col(groupCol).as("__grp"), col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__grp", "__v").agg(count(lit(1)).as("__c"))
    val totals = hist.groupBy("__grp").agg(sum("__c").as("__n"))
    val w = Window.partitionBy(col("__grp")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
    val ps = df.sparkSession.createDataFrame(pcts.distinct.sorted.map(Tuple1(_)))
      .toDF("pct").select(col("pct").cast("long").as("pct"))
    cum.join(broadcast(totals), Seq("__grp"))
      .crossJoin(broadcast(ps))
      .filter(col("__cum") * 100L >= col("pct") * col("__n"))
      .groupBy(col("__grp").as(groupCol), col("pct"))
      .agg(min(col("__v")).as("value"))
  }

  /** Grouped HLL registers — [[hllRegisters]] per group key (per-domain
    * vocabulary size at constant memory per group). One map-side-combined
    * groupBy with at most groups × 2^p partial rows per task; group
    * tables merge across corpora with the [[hllMerge]] identity (same
    * register-max, now keyed). Returns (groupCol, register, max_rho) —
    * dense per observed group.
    */
  def hllRegistersBy(
      corpus: DataFrame,
      groupCol: String,
      textCol: String,
      p: Int = 10,
  ): DataFrame = {
    require(p >= 4 && p <= 20, "need 4 <= p <= 20")
    val m = 1L << p
    val maxRho = 60 - p + 1
    val regs = corpus
      .select(col(groupCol).as("__grp"), explode(split(col(textCol), " ")).as("__t"))
      .select(col("__grp"),
        conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long").as("__h"))
      .select(col("__grp"), (col("__h") % m).as("register"), expr(s"__h div ${m}L").as("__v"))
      .select(col("__grp"), col("register"),
        when(col("__v") === 0L, lit(maxRho.toLong))
          .otherwise(length(bin(col("__v").bitwiseAND(-col("__v")))).cast("long"))
          .as("__rho"))
      .groupBy("__grp", "register").agg(max("__rho").as("max_rho"))
    val groups = corpus.select(col(groupCol).as("__grp")).distinct()
    groups
      .crossJoin(corpus.sparkSession.range(m).select(col("id").as("register")))
      .join(regs, Seq("__grp", "register"), "left")
      .select(col("__grp").as(groupCol), col("register"),
        coalesce(col("max_rho"), lit(0L)).as("max_rho"))
  }

  def cmsTokenCounts(
      corpus: DataFrame,
      probe: DataFrame,
      textCol: String,
      width: Int = 1 << 16,
      depth: Int = 3,
  ): DataFrame = {
    require(width >= 2 && depth >= 1, "need at least a 2-wide, 1-deep sketch")
    def posOf(tok: Column, j: Int): Column =
      pmod(conv(substring(md5(concat(lit(s"$j:"), tok)), 1, 15), 16, 10).cast("long"),
        lit(width.toLong))
    // token stream WITH multiplicity (frequencies, not membership)
    val toks = corpus.select(explode(split(col(textCol), " ", -1)).as("__t"))
    val sketch = toks
      .select(explode(array((0 until depth).map(j =>
        (lit(j.toLong) * width + posOf(col("__t"), j)).as(s"c$j")): _*)).as("__cell"))
      .groupBy("__cell").agg(count(lit(1)).as("__n"))
      .agg(map_from_entries(collect_list(struct(col("__cell"), col("__n")))).as("__m"))
      .select(transform(sequence(lit(0L), lit(depth.toLong * width - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("__cms"))
    val probeToks = probe
      .select(explode(array_distinct(split(col(textCol), " ", -1))).as("token"))
      .distinct()
    val estCol =
      if (depth == 1) element_at(col("__cms"), posOf(col("token"), 0).cast("int") + 1)
      else least((0 until depth).map(j =>
        element_at(col("__cms"), (lit(j.toLong) * width + posOf(col("token"), j)).cast("int") + 1)): _*)
    val trueCnt = toks.groupBy(col("__t").as("token")).agg(count(lit(1)).as("true_cnt"))
    probeToks
      .crossJoin(broadcast(sketch))
      .select(col("token"), estCol.as("est"))
      .join(trueCnt, Seq("token"), "left")
      .select(col("token"), col("est"), coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
  }

  /** Exact distributed quantiles of an integer column WITHOUT a global
    * sort: value histogram (one map-side-combined groupBy — the shuffle
    * carries distinct values, not rows) → two-level cumulative count
    * (range-bucketed offsets + within-bucket window, the same
    * decomposition as [[tokenBudgetSelect]], so no single task ever
    * windows the whole domain) → each requested percentile is the
    * smallest value whose cumulative count reaches the integer rank
    * ceil(pct·n/100). Percentiles are INTEGER percents and ranks are
    * integer arithmetic, so results replay exactly in SQL — unlike
    * `approx_percentile`, which is both approximate and
    * implementation-defined. At 100 TB this is THE exact-quantile
    * shape: cost scales with distinct values, not rows; for a
    * near-unique domain, quantize first or accept the sketch error of
    * an approximate method.
    */
  def exactQuantiles(
      df: DataFrame,
      valueCol: String,
      pcts: Seq[Int],
      buckets: Int = 32,
  ): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 100), "pcts in [0, 100]")
    val hist = df.select(col(valueCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy("__v").agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val n = hist.agg(coalesce(sum("__c"), lit(0L))).head.getLong(0)
    val cuts = hist.stat
      .approxQuantile("__v", (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
      .distinct.sorted
    def bucketOf(c: Column) = cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(c > lit(cut), 1).otherwise(0)
    }
    // unpartitioned by design, NOT a scale hazard: operates on the
    // per-bucket aggregate (<= `buckets` rows), never corpus rows
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val bucketed = hist.withColumn("__b", bucketOf(col("__v").cast("double")))
    val offsets = bucketed
      .groupBy(col("__b")).agg(sum(col("__c")).as("__bsum"))
      .select(col("__b"), coalesce(sum(col("__bsum")).over(wOff), lit(0L)).as("__off"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("__cum", sum(col("__c")).over(wLocal) + col("__off"))
    val targets = df.sparkSession.createDataFrame(
      pcts.distinct.sorted.map(p => (p.toLong, (p.toLong * n + 99L) / 100L)))
      .toDF("pct", "__rank")
    cum.crossJoin(broadcast(targets))
      .filter(col("__cum") >= col("__rank"))
      .groupBy(col("pct")).agg(min(col("__v")).as("value"))
      .select(col("pct"), col("value"))
  }

  /** HyperLogLog register table for distinct-token (vocabulary) counting
    * (Flajolet et al. 2007) — the distinct-count companion to
    * [[cmsTokenCounts]]: 2^p registers of "max position of the lowest
    * set bit" over the 60-bit md5 hash stream, built by ONE map-side-
    * combined groupBy whose partial state is at most 2^p rows per task
    * regardless of corpus size. At 100 TB an exact vocabulary count is
    * a corpus-sized shuffle (`countDistinct` over every token); the
    * register table is the constant-size answer with the classic
    * 1.04/sqrt(m) relative error.
    *
    * Register split: bucket = h % 2^p (low p bits), value = h >> p
    * (60-p bits), rho = bit position of the value's lowest set bit
    * (1-indexed; the all-zero value caps at 60-p+1). Every register —
    * including never-touched ones, reported as 0 — is integer-exact
    * and replays bit-for-bit in a SQL oracle; only the final harmonic-
    * mean estimate ([[hllEstimate]]) is floating point.
    */
  def hllRegisters(corpus: DataFrame, textCol: String, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 20, "need 4 <= p <= 20")
    val m = 1L << p
    val maxRho = 60 - p + 1
    val regs = corpus
      .select(explode(split(col(textCol), " ")).as("__t"))
      .select(conv(substring(md5(col("__t")), 1, 15), 16, 10).cast("long").as("__h"))
      .select((col("__h") % m).as("register"), expr(s"__h div ${m}L").as("__v"))
      .select(col("register"),
        when(col("__v") === 0L, lit(maxRho.toLong))
          .otherwise(length(bin(col("__v").bitwiseAND(-col("__v")))).cast("long"))
          .as("__rho"))
      .groupBy("register").agg(max("__rho").as("max_rho"))
    corpus.sparkSession.range(m).select(col("id").as("register"))
      .join(regs, Seq("register"), "left")
      .select(col("register"), coalesce(col("max_rho"), lit(0L)).as("max_rho"))
  }

  /** The standard HLL estimate from a [[hllRegisters]] table: raw
    * alpha_m * m^2 / sum(2^-M_j), with the small-range linear-counting
    * correction when raw <= 2.5m and empty registers remain. Two-double
    * driver reduction of an m-row frame — not a per-row collect.
    */
  def hllEstimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val row = registers.agg(
      sum(pow(lit(2.0), -col("max_rho"))).as("z"),
      sum(when(col("max_rho") === 0L, 1L).otherwise(0L)).as("zeros")).head
    val z = row.getDouble(0)
    val zeros = row.getLong(1)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m.toDouble * m.toDouble / z
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  def contamination(
      train: DataFrame,
      eval: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      hashFn: Column => Column = xxhash64(_),
      broadcastRowCap: Long = 4000000L,
  ): DataFrame = {
    val evalGrams = eval
      .select(explode(ngramHashes(col(textCol), n, hashFn)).as("__g"))
      .distinct()
      .localCheckpoint(true)
    val nEvalGrams = evalGrams.count() // free post-checkpoint
    val gatedEval =
      if (nEvalGrams <= broadcastRowCap) broadcast(evalGrams)
      else evalGrams.hint("shuffle_hash")
    val trainGrams = train
      .select(col(idCol), explode(ngramHashes(col(textCol), n, hashFn)).as("__g"))
    val hits = trainGrams
      .join(gatedEval, Seq("__g"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    train
      .select(col(idCol), size(ngramHashes(col(textCol), n, hashFn)).cast("long").as("n_ngrams"))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        col("n_ngrams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(col("n_ngrams") === 0, lit(0.0))
          .otherwise(coalesce(col("n_contaminated"), lit(0L)).cast("double") / col("n_ngrams"))
          .as("contamination"),
      )
  }
}
