package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Embedding, Similarity, Dedup}

/** Semantic-dedup cluster-count study: SemDeDup's scale contract is that
  * the coarse-centroid count grows with the corpus so per-cluster
  * membership stays bounded (the paper runs 110k clusters on LAION-440M).
  * This main MEASURES that discipline on a real SF dir: the same corpus
  * deduped at increasing k, timing the within-cell pair phase and
  * reporting drop counts — evidence that the pair space (Σ cellᵢ²)
  * contracts ~linearly in 1/k while the kept/dropped decision stays
  * stable for actual near-duplicates (a true dup pair lands in the same
  * cell at any k that separates the space; only borderline cross-cell
  * pairs fall away as k grows).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf1 sbt "runMain graft.BenchSemantic"
  */
object BenchSemantic {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = Embedding.embedDocuments(
      docs.repartition(spark.sparkContext.defaultParallelism), "doc_id", "text", dim = 32)
      .localCheckpoint(true)
    val nDocs = emb.count()

    val cap = sys.env.getOrElse("SPARK_GRAFT_SEM_CAP", "1000").toInt
    for (k <- Seq(8, 64, 256)) {
      val cents = Similarity.fixedCentroids(dim = 32, k = k)
        .map { case (cid, v) => cid -> v.map(x => if (x > 0) 0.125 else -0.125) }
      // uncapped pair-space size: Σ per-cell C(n,2) — what the dedup join
      // WOULD do without the in-operator cell cap. coalesce guards the
      // empty-frame case (bad SPARK_GRAFT_SF_DIR) against a cryptic NPE.
      val cellSizes = Similarity.ivfAssign(emb, "embedding", cents)
        .groupBy("__cell").count().localCheckpoint(true)
      val rawPairs = cellSizes
        .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0.0)).as("p"))
        .collect()(0).getDouble(0)
      val capped = cellSizes.filter(col("count") > cap).count()
      val t0 = System.nanoTime()
      val dropped = Dedup.semanticDedup(emb, "doc_id", "embedding", cents, threshold = 0.75,
        maxCellSize = cap)
        .filter(col("kept") === 0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[semantic] docs=$nDocs%d k=$k%d rawPairSpace=${rawPairs / 1e6}%.1fM cap=$cap%d cappedCells=$capped%d dropped=$dropped%d secs=$secs%.2f")
    }
    spark.stop()
  }
}
