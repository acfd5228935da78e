package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Scratch: ANN recall at each SF (not part of the suite). */
object ScratchRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      // LSH split
      val q1 = emb.filter(col("vec_id") < 5).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c1 = emb.filter(col("vec_id") >= 5).select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      val lsh = Similarity.lshTopK(c1, q1, "n_id", "n_vec", "q_id", "q_vec", dim = 64, nBits = 4, k = 5)
      val ex1 = Similarity.bruteForceTopK(c1, q1, "n_id", "n_vec", "q_id", "q_vec", k = 5)
      val r1 = Similarity.recallAtK(lsh, ex1, "q_id", "n_id").orderBy("q_id").collect()
      println(s"$sf lsh recalls: " + r1.map(r => s"${r.get(0)}:${r.getDouble(1)}").mkString(" "))
      // IVF split
      val q2 = emb.filter(col("vec_id") >= 8 && col("vec_id") < 13).select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      val c2 = emb.filter(col("vec_id") >= 13).select(col("vec_id").as("n_id"), col("embedding").as("n_vec"))
      val sample = c2.filter(pmod(col("n_id"), lit(3)) === 0)
      val cents = Similarity.kmeansCentroids(sample, "n_id", "n_vec", k = 8, maxIter = 2)
      val ivf = Similarity.ivfTopK(c2, q2, "n_id", "n_vec", "q_id", "q_vec", cents, nProbe = 2, k = 5)
      val ex2 = Similarity.bruteForceTopK(c2, q2, "n_id", "n_vec", "q_id", "q_vec", k = 5)
      val r2 = Similarity.recallAtK(ivf, ex2, "q_id", "n_id").orderBy("q_id").collect()
      println(s"$sf ivf recalls: " + r2.map(r => s"${r.get(0)}:${r.getDouble(1)}").mkString(" "))
    }
    spark.stop()
  }
}
