package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Scratch profiler for q_dedup_pipeline stages (not part of the suite). */
object ScratchProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet").filter(col("doc_id") % 3 === 0)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }

    // warmup
    Dedup.nearDupPairs(docs, "doc_id", "text", 4, 2, 0.8).count()

    for (i <- 1 to 4) time(s"full nearDupPairs $i") {
      Dedup.nearDupPairs(docs, "doc_id", "text", 4, 2, 0.8).count()
    }
    time("full again") {
      Dedup.nearDupPairs(docs, "doc_id", "text", 4, 2, 0.8).count()
    }
    // candidates only (no verify): replicate candidate stage
    time("buckets only") {
      Dedup.lshBuckets(docs, "doc_id", "text", 4, 2).count()
    }
    // no-cap r2-style shape
    time("no-cap pairs") {
      val b = Dedup.lshBuckets(docs, "doc_id", "text", 4, 2)
      val cand = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket_hash") === col("y.bucket_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct()
      val sets = docs.select(col("doc_id"), Dedup.wordSet(col("text")).as("__ws"))
      cand
        .join(sets.select(col("doc_id").as("id_a"), col("__ws").as("ws_a")), "id_a")
        .join(sets.select(col("doc_id").as("id_b"), col("__ws").as("ws_b")), "id_b")
        .filter(size(col("ws_a")).cast("double") >= lit(0.8) * size(col("ws_b")) &&
          size(col("ws_b")).cast("double") >= lit(0.8) * size(col("ws_a")))
        .withColumn("jac", Dedup.jaccardSets(col("ws_a"), col("ws_b")))
        .filter(col("jac") >= 0.8).count()
    }
    // candidates only from current impl (pre-verify)
    time("candidates only (capped)") {
      val b = Dedup.lshBuckets(docs, "doc_id", "text", 4, 2)
      b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket_hash") === col("y.bucket_hash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct().count()
    }
    spark.stop()
  }
}
