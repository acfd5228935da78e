package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the (huge) corpus: the corpus never shuffles; each task
  * scores its split, a per-(query, partition) partial top-k bounds what
  * leaves the mappers, and the final rank window sees only
  * k × nPartitions rows per query (see `boundedTopK`).
  *
  * Scale path: random-hyperplane LSH bucketing — corpus and queries hash
  * to sign-pattern buckets; only same-bucket pairs are scored. At 100 TB
  * the bucket join is a shuffle on the (short) signature key instead of a
  * cross join.
  *
  * All arithmetic is double, sequential left-fold over the vector — the
  * deterministic order keeps results bit-identical across runs and
  * engines (oracle parity).
  */
object Similarity {

  /** Scale-safe top-k-per-query reduction over a scored candidate frame.
    *
    * A bare `row_number().over(Window.partitionBy(queryId))` funnels EVERY
    * scored candidate of a query into one task — at 100 TB the brute-force
    * variant would shuffle the whole corpus into n_queries partitions and
    * the job IS that task.
    *
    * Long ids (every shipped ANN query) take the native path: a
    * `BoundedTopK` TypedImperativeAggregate whose buffer never exceeds k
    * entries at ANY stage, so map-side partial aggregation bounds what
    * leaves each task at k rows per query and the shuffle carries
    * O(k × mapTasks × queries) bytes, not the scored set. The aggregate
    * emits the top-k best-first, so `posexplode`'s position IS the rank —
    * no rank window at all, one bounded exchange total.
    *
    * Other id types fall back to a declarative two-step with identical
    * semantics: partial top-k per (query, input partition) via
    * `slice(array_sort(collect_list(...), cmp), 1, k)` grouped by
    * (queryId, spark_partition_id()), then the global rank window over
    * ≤ k × nPartitions rows per query. (collect_list partials do ship
    * every candidate through the shuffle — spread across q×p keys, no
    * single hot task — which is why the bounded native path is the
    * default.) Both comparators match the window order (score desc,
    * id asc) exactly, so all paths are bit-identical.
    */
  private[graft] def boundedTopK(
      scored: DataFrame,
      queryId: String,
      corpusId: String,
      scoreCol: String,
      k: Int,
      rankName: String,
  ): DataFrame = {
    if (scored.schema(corpusId).dataType == org.apache.spark.sql.types.LongType) {
      scored
        .groupBy(col(queryId))
        .agg(graft.functions.BoundedTopK.topK(col(scoreCol), col(corpusId), k).as("__top"))
        .select(col(queryId), posexplode(col("__top")))
        .select(col(queryId), (col("pos") + 1).cast("int").as(rankName),
          col("col.i").as(corpusId), col("col.s").as(scoreCol))
    } else {
      val cmp = (l: Column, r: Column) =>
        when(l.getField("s") > r.getField("s"), -1)
          .when(l.getField("s") < r.getField("s"), 1)
          .when(l.getField("i") < r.getField("i"), -1)
          .when(l.getField("i") > r.getField("i"), 1)
          .otherwise(0)
      val partial = scored
        .groupBy(col(queryId), spark_partition_id().as("__pid"))
        .agg(slice(
          array_sort(collect_list(struct(col(scoreCol).as("s"), col(corpusId).as("i"))), cmp),
          1, k).as("__top"))
        .select(col(queryId), explode(col("__top")).as("__t"))
        .select(col(queryId), col("__t.s").as(scoreCol), col("__t.i").as(corpusId))
      val w = Window.partitionBy(col(queryId)).orderBy(col(scoreCol).desc, col(corpusId))
      partial
        .withColumn(rankName, row_number().over(w))
        .filter(col(rankName) <= k)
        .select(col(queryId), col(rankName), col(corpusId), col(scoreCol))
    }
  }

  /** Codegen-native kernels (graft.functions.VectorExpressions): the
    * previous `zip_with`+`aggregate` composition is CodegenFallback —
    * interpreted per element per pair — which the sf10 IVF probe profile
    * showed to be the actual bottleneck (all executor threads inside
    * `ZipWith.eval`). Identical null/shape/IEEE semantics; see the
    * expression scaladoc for the exact contract.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecCosine(a, b)

  /** Per-VECTOR norm for the pre-normed pair-cosine split: `sqrt(dot(v,v))`
    * with zero mapped to NULL. `dot(a,b) / (normOf(a) * normOf(b))` is
    * BIT-identical to `cosine(a, b)` — the kernel computes
    * `d / (sqrt(na) * sqrt(nb))` from the same index-order folds, the same
    * association, and the same NULL contract (zero norm, null element,
    * length mismatch all surface as NULL; a NULL norm rides through the
    * multiply) — but the norm is O(n·d) work attached ONCE per side of a
    * candidate join instead of re-folded for every candidate PAIR. At the
    * sf10 IVF probe (620M pairs) the per-pair fold is 3 multiply-adds per
    * element; the pre-normed split does 1.
    */
  def normOf(v: Column): Column = {
    val n = sqrt(dot(v, v))
    when(n === 0.0, lit(null).cast("double")).otherwise(n)
  }

  /** Attach `normCol = normOf(vecCol)`; pair with [[pairCosine]]. */
  private def withNorm(df: DataFrame, vecCol: String, normCol: String): DataFrame =
    df.withColumn(normCol, normOf(col(vecCol)))

  private def pairCosine(qVec: Column, cVec: Column, qNorm: Column, cNorm: Column): Column =
    dot(qVec, cVec) / (qNorm * cNorm)

  /** Brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine. `queries` must be small (it is broadcast).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int,
  ): DataFrame = {
    val scored = withNorm(corpus, corpusVec, "__cn")
      .crossJoin(broadcast(withNorm(queries, queryVec, "__qn")))
      .withColumn("cosine",
        pairCosine(col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    boundedTopK(scored, queryId, corpusId, "cosine", k, "rank")
  }

  /** Recall@k of an approximate ANN result against the exact baseline:
    * |approx ∩ exact| / |exact| per query, and the mean across queries —
    * THE tuning metric for nBits (LSH) and nProbe (IVF). Both inputs are
    * (queryId, rank, corpusId) frames as produced by the top-k ops.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, queryId: String, corpusId: String): DataFrame = {
    val hits = exact.select(col(queryId), col(corpusId))
      .join(approx.select(col(queryId), col(corpusId)), Seq(queryId, corpusId), "left_semi")
      .groupBy(queryId).agg(count(lit(1)).as("__hits"))
    val totals = exact.groupBy(queryId).agg(count(lit(1)).as("__total"))
    totals.join(hits, Seq(queryId), "left")
      .select(col(queryId),
        (coalesce(col("__hits"), lit(0L)).cast("double") / col("__total")).as("recall"))
  }

  def meanRecall(recalls: DataFrame): Double =
    recalls.agg(avg(col("recall"))).head().getDouble(0)

  /** Deterministic ±1 hyperplanes from a splitmix64 stream — no stored
    * model, same planes on every run/executor. Materialized driver-side
    * once and embedded as array literals so each row's signature is
    * nBits dot products against constants (instead of re-generating the
    * planes per row inside the expression tree).
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Array[Double]] =
    signStream(dim * nBits, seed).grouped(dim).toSeq.map(_.toArray)

  /** Fixed pre-trained IVF quantizer: k deterministic unit-norm ±1/√dim
    * centroids from the same splitmix64 stream. A production index trains
    * centroids with `kmeansCentroids` (build phase); contract queries use
    * this fixed quantizer so query cost reflects probe mechanics, not
    * index build — mirroring how IVF engines separate train from search.
    * The literals are pure JVM (no Spark), so an external oracle can
    * replicate cell assignment bit-for-bit.
    */
  def fixedCentroids(dim: Int, k: Int, seed: Long = 7L): Seq[(Int, Array[Double])] = {
    val s = 1.0 / math.sqrt(dim.toDouble)
    signStream(dim * k, seed).grouped(dim).toSeq.zipWithIndex
      .map { case (v, i) => i -> v.map(_ * s).toArray }
  }

  private def signStream(n: Int, seed: Long): Seq[Double] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(n)(if ((next() & 1L) == 1L) 1.0 else -1.0)
  }

  /** Random-hyperplane signature: bit i = sign(dot(v, plane_i)).
    * nBits buckets the space into 2^nBits cells.
    */
  def hyperplaneSignature(vec: Column, dim: Int, nBits: Int): Column = {
    val bits = hyperplanes(dim, nBits).zipWithIndex.map { case (plane, i) =>
      val d = dot(vec, typedlit(plane.toSeq))
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Coarse k-means centroid training for IVF (Lloyd's iterations, fully
    * distributed): seed with the k lowest-id vectors (deterministic), then
    * alternate (a) nearest-centroid assignment — a narrow map over the
    * corpus against broadcast centroid literals — and (b) per-cell means
    * via posexplode + groupBy(cell, dim): exactly k×dim rows come back to
    * the driver per iteration, never data rows. The mean accumulates in
    * DECIMAL so the aggregate is exact and therefore independent of
    * partial-aggregation order — bit-identical centroids on every run,
    * which keeps downstream assignment and top-k deterministic. An emptied
    * cell keeps its previous centroid.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      maxIter: Int = 5,
  ): Seq[(Int, Array[Double])] = {
    var cents: Seq[(Int, Array[Double])] = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().toSeq.zipWithIndex.map { case (r, i) =>
        i -> r.getSeq[Any](0).map(v => v.asInstanceOf[Number].doubleValue()).toArray
      }
    var it = 0
    var moved = true
    while (moved && it < maxIter) {
      val means = ivfAssign(corpus, vecCol, cents)
        .select(col("__cell"), posexplode(col(vecCol)))
        .groupBy(col("__cell"), col("pos"))
        .agg(avg(col("col").cast("decimal(28,10)")).cast("double").as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) => cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray }
      // spherical k-means: assignment is by inner product, so project each
      // mean back to the unit sphere — otherwise high-norm centroids would
      // swallow neighboring cells
      val next = cents.map { case (cid, old) =>
        val m = means.getOrElse(cid, old)
        val n = math.sqrt(m.map(x => x * x).sum)
        cid -> (if (n > 0) m.map(_ / n) else old)
      }
      moved = next.zip(cents).exists { case ((_, a), (_, b)) => !a.sameElements(b) }
      cents = next
      it += 1
    }
    cents
  }

  /** IVF (inverted-file) ANN: assign corpus vectors to their nearest
    * coarse centroid once; at query time score only the `nProbe` closest
    * cells. Train centroids with `kmeansCentroids` (or pass any fixed
    * seq — the partition/probe mechanics are the same). At 100 TB the cell
    * assignment is a narrow map and the probe is a semi-join on cell id,
    * so the corpus shuffles once (by cell) ever, not per query.
    */
  def ivfAssign(corpus: DataFrame, corpusVec: String, centroids: Seq[(Int, Array[Double])]): DataFrame = {
    val scored = centroids.map { case (cid, cvec) =>
      struct(dot(col(corpusVec), typedlit(cvec.toSeq)).as("sim"), lit(cid).as("cell"))
    }
    corpus.withColumn("__cell", greatest(scored: _*).getField("cell"))
  }

  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      centroids: Seq[(Int, Array[Double])],
      nProbe: Int,
      k: Int,
  ): DataFrame =
    ivfTopKPreAssigned(ivfAssign(corpus, corpusVec, centroids), queries,
      corpusId, corpusVec, queryId, queryVec, centroids, nProbe, k)

  /** As `ivfTopK` but the corpus side already carries its `__cell`
    * assignment (from `ivfAssign`) — the streaming/incremental shape,
    * where the index is assigned (and persisted/checkpointed) ONCE and
    * every micro-batch of queries probes it without re-deriving cells.
    */
  def ivfTopKPreAssigned(
      assigned: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      centroids: Seq[(Int, Array[Double])],
      nProbe: Int,
      k: Int,
      broadcastQueries: Boolean = true,
  ): DataFrame = {
    // per query: the nProbe best cells (driver-free — computed as array expr)
    val cellScores = array(centroids.map { case (cid, cvec) =>
      struct(dot(col(queryVec), typedlit(cvec.toSeq)).as("sim"), lit(cid).as("cell"))
    }: _*)
    val qCells = queries
      .withColumn("__cells", slice(reverse(array_sort(cellScores)), 1, nProbe))
      .withColumn("__cell", explode(expr("transform(__cells, c -> c.cell)")))
      .drop("__cells")
    // The query side is normally tiny (interactive probes / one micro
    // batch) and broadcasts; callers with a potentially LARGE query frame
    // (a backlogged stream's first trigger, a batch backfill) pass
    // broadcastQueries = false after a count-gate and the join degrades
    // to a shuffled hash join — same result, no single-node
    // materialization of the query side.
    val qNormed = withNorm(qCells, queryVec, "__qn")
    val qSide = if (broadcastQueries) broadcast(qNormed) else qNormed.hint("shuffle_hash")
    val scored = withNorm(assigned, corpusVec, "__cn")
      .join(qSide, "__cell")
      .withColumn("cosine",
        pairCosine(col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    boundedTopK(scored, queryId, corpusId, "cosine", k, "rank")
  }

  // ------------------------------------------------------ product quantization

  /** Deterministic PQ codebooks: `m` subspaces of dim/m, `kSub` centroids
    * each, entries ±0.125 from the splitmix64 stream. The uniform ±0.125
    * magnitude is an exact binary fraction (SQL literals round-trip
    * bit-exactly) and cancels out of every argmax/ranking comparison, so
    * only the sign pattern matters — the same train-vs-search split as
    * `fixedCentroids`: production trains per-subspace codebooks with
    * k-means (build phase); search mechanics are identical either way.
    * Returns (subspace, centroidId, subvector) triples.
    */
  def pqCodebooks(dim: Int, m: Int, kSub: Int, seed: Long = 11L): Seq[(Int, Int, Array[Double])] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    signStream(m * kSub * subDim, seed).grouped(subDim).toSeq.zipWithIndex
      .map { case (v, i) => (i / kSub, i % kSub, v.map(_ * 0.125).toArray) }
  }

  /** PQ-encode a vector column: per subspace, the id of the codebook
    * centroid with the largest inner product (ties to the larger id,
    * matching `ivfAssign`). Adds `__code` (array<int>, length m) — the
    * 100 TB index stores (id, cell, code): m bytes of code instead of
    * dim floats, an 8-32× memory cut, which is the entire point of PQ.
    * A narrow map — no shuffle.
    */
  def pqEncode(df: DataFrame, vecCol: String, codebooks: Seq[(Int, Int, Array[Double])]): DataFrame =
    // ONE fused expression (graft.functions.PqEncode), not m*kSub
    // slice+dot subtrees: the composed form generated 128 loops + 128
    // slice copies in one projection — past the JIT method limits, it
    // measured 3.4x SLOWER at sf10 than even the interpreted HOFs it
    // replaced (see the expression scaladoc). The fused loop re-stamped
    // q_ann_ivfpq sf10 from 29.6 s (composed kernels) / 8.5 s (HOFs)
    // down — codes, tie-breaks and NaN ordering bit-identical.
    df.withColumn("__code",
      graft.functions.VectorExpressions.pqEncode(col(vecCol), codebooks))

  /** IVF-PQ search — the memory-bound 100 TB ANN shape: probe `nProbe`
    * coarse cells (equi join, bounded candidates), score candidates by
    * ASYMMETRIC DISTANCE — per query a LUT of kSub inner products per
    * subspace is computed ONCE, and each candidate costs m array lookups
    * instead of a dim-length dot — then exact-cosine rerank only the
    * `shortlist` best per query (FAISS refine step). The rerank joins
    * the (tiny) shortlist back to the corpus by id: the full vectors
    * live only in the corpus table, never in the PQ index.
    */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      centroids: Seq[(Int, Array[Double])],
      codebooks: Seq[(Int, Int, Array[Double])],
      nProbe: Int,
      shortlist: Int,
      k: Int,
  ): DataFrame = {
    val index = pqEncode(ivfAssign(corpus, corpusVec, centroids), corpusVec, codebooks)
      .select(col(corpusId), col("__cell"), col("__code"))
    pqSearch(index, corpus, queries, corpusId, corpusVec, queryId, queryVec,
      centroids, codebooks, nProbe, shortlist, k)
  }

  /** Shared IVF-PQ search core over an (id, __cell, __code) index frame:
    * probe cells, ADC-score (m array lookups per candidate, all inside
    * codegen), exact-cosine rerank of the shortlist with the corpus
    * probed by the TINY broadcast shortlist — only those ids' raw
    * vectors are ever materialized.
    */
  private def pqSearch(
      index: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String,
      centroids: Seq[(Int, Array[Double])],
      codebooks: Seq[(Int, Int, Array[Double])],
      nProbe: Int, shortlist: Int, k: Int,
  ): DataFrame = {
    val subDim = codebooks.head._3.length
    val m = codebooks.map(_._1).max + 1
    // queries: probed cells + the per-subspace LUT (kSub dots per subspace)
    val cellScores = array(centroids.map { case (cid, cvec) =>
      struct(dot(col(queryVec), typedlit(cvec.toSeq)).as("sim"), lit(cid).as("cell"))
    }: _*)
    val lut = array((0 until m).map { j =>
      val sub = slice(col(queryVec), j * subDim + 1, subDim)
      array(codebooks.filter(_._1 == j).sortBy(_._2).map { case (_, _, cv) =>
        dot(sub, typedlit(cv.toSeq))
      }: _*)
    }: _*)
    val qProbe = queries
      .withColumn("__lut", lut)
      .withColumn("__cells", slice(reverse(array_sort(cellScores)), 1, nProbe))
      .withColumn("__cell", explode(expr("transform(__cells, c -> c.cell)")))
      .drop("__cells")
    val approx = (0 until m)
      .map(j => element_at(element_at(col("__lut"), j + 1), element_at(col("__code"), j + 1) + 1))
      .reduce(_ + _)
    // ADC shortlist through the bounded reduction (the index candidate set
    // grows with the corpus at fixed cell count — the same funnel risk as
    // brute force); the query vector is re-attached afterwards from the
    // tiny queries frame so the partial-agg structs stay (score, id) pairs
    // instead of dragging dim floats through collect_list buffers.
    val short = boundedTopK(
      index.join(broadcast(qProbe), "__cell").withColumn("__approx", approx),
      queryId, corpusId, "__approx", shortlist, "__arank")
      .join(broadcast(queries.select(col(queryId), col(queryVec))), queryId)
      .select(col(queryId), col(queryVec), col(corpusId), col("__arank"))
    val wExact = Window.partitionBy(col(queryId)).orderBy(col("cosine").desc, col(corpusId))
    corpus.select(col(corpusId), col(corpusVec))
      .join(broadcast(short), corpusId)
      .withColumn("cosine", cosine(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId), col("cosine"))
  }

  /** Persisted PQ index: the ingest-time product of `ivfAssign` +
    * `pqEncode` — (id, cell, code) rows written once to parquet,
    * partitioned by cell so a probe reads only the probed cells'
    * directories (partition pruning does the cell cut before a single
    * row is materialized). Appending a new batch of vectors is the same
    * narrow map over just that batch — encode cost is paid per vector
    * once, at ingest, exactly how q_ann_ivfpq's per-run encode would
    * amortize in production.
    */
  def writePqIndex(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      centroids: Seq[(Int, Array[Double])],
      codebooks: Seq[(Int, Int, Array[Double])],
      path: String, append: Boolean = false): Unit =
    pqEncode(ivfAssign(corpus, corpusVec, centroids), corpusVec, codebooks)
      .select(col(corpusId), col("__cell").as("cell"), col("__code").as("code"))
      .write.mode(if (append) "append" else "overwrite")
      .partitionBy("cell")
      .parquet(path)

  /** Search a persisted PQ index (same semantics as `ivfPqTopK`, minus
    * the per-run encode): probe cells via partition-pruned index read,
    * ADC-score, rerank the shortlist against the corpus vectors.
    */
  def searchPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      centroids: Seq[(Int, Array[Double])],
      codebooks: Seq[(Int, Int, Array[Double])],
      nProbe: Int,
      shortlist: Int,
      k: Int,
  ): DataFrame = {
    val index = spark.read.parquet(indexPath)
      .select(col(corpusId), col("cell").as("__cell"), col("code").as("__code"))
    pqSearch(index, corpus, queries, corpusId, corpusVec, queryId, queryVec,
      centroids, codebooks, nProbe, shortlist, k)
  }

  /** Deterministic ±1 random-projection planes (Johnson–Lindenstrauss):
    * `dimOut` rows of `dimIn` signs from the splitmix64 stream. The
    * conventional 1/√dimOut scale is omitted — it cancels out of cosine
    * and every ranking, and ±1 literals round-trip exactly in SQL.
    */
  def projectionPlanes(dimIn: Int, dimOut: Int, seed: Long = 21L): Seq[Array[Double]] =
    signStream(dimIn * dimOut, seed).grouped(dimIn).toSeq.map(_.toArray)

  /** Project a vector column to `planes.size` dims: one dot per output
    * dim against constants — a narrow map, the cheap pre-filter that
    * makes a 64-float embedding an 8-float sketch before any pairwise
    * work. Cosine in the projected space approximates cosine in the
    * original (JL), so rank-then-rerank pipelines compose with it.
    */
  def randomProject(vec: Column, planes: Seq[Array[Double]]): Column =
    array(planes.map(p => dot(vec, typedlit(p.toSeq))): _*)

  /** Multi-probe LSH ANN: each query probes its own signature bucket PLUS
    * every bucket at Hamming distance 1 (one hyperplane's sign flipped) —
    * the standard multi-probe trick that buys most of the recall of a
    * second hash table for zero extra index storage. The query side
    * explodes into nBits+1 probe rows (queries are the tiny broadcast
    * side, so the fan-out is free at scale); each corpus point still
    * carries exactly one signature, so (query, corpus) pairs stay unique
    * and the bounded top-k applies unchanged.
    */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      dim: Int,
      nBits: Int,
      k: Int,
  ): DataFrame = {
    val cSig = corpus.withColumn("__sig", hyperplaneSignature(col(corpusVec), dim, nBits))
    val base = hyperplaneSignature(col(queryVec), dim, nBits)
    val probes = array((base +: (0 until nBits).map(b =>
      base.bitwiseXOR(shiftleft(lit(1L), b)))): _*)
    val qSig = withNorm(queries.withColumn("__sig", explode(probes)), queryVec, "__qn")
    val scored = withNorm(cSig, corpusVec, "__cn")
      .join(broadcast(qSig), "__sig")
      .withColumn("cosine",
        pairCosine(col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    boundedTopK(scored, queryId, corpusId, "cosine", k, "rank")
  }

  /** LSH-bucketed ANN: score only same-signature pairs. Recall depends on
    * nBits; `lshTopKMultiProbe` widens each query to Hamming-1 buckets.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      dim: Int,
      nBits: Int,
      k: Int,
  ): DataFrame = {
    val cSig = corpus.withColumn("__sig", hyperplaneSignature(col(corpusVec), dim, nBits))
    val qSig = withNorm(
      queries.withColumn("__sig", hyperplaneSignature(col(queryVec), dim, nBits)),
      queryVec, "__qn")
    val scored = withNorm(cSig, corpusVec, "__cn")
      .join(broadcast(qSig), "__sig")
      .withColumn("cosine",
        pairCosine(col(queryVec), col(corpusVec), col("__qn"), col("__cn")))
    boundedTopK(scored, queryId, corpusId, "cosine", k, "rank")
  }
}
