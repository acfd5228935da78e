package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Merge-strategy micro-benchmark: applies a small update batch to a large
  * merge table via (a) whole-table staged overwrite and (b) the hash-
  * bucketed layout, printing one JSON line with both timings. The gap is
  * the evidence for BucketedMerge's O(touched buckets) claim — at real
  * scale the ratio is the table-to-batch size ratio, bounded by bucket
  * granularity.
  */
object BenchMerge {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "64").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val updKeys = sys.env.getOrElse("SPARK_GRAFT_UPD_KEYS", "10").toInt
    // replicate the table scaleX× so the full rewrite has real weight —
    // the crossover vs per-bucket cost is the point of the measurement
    val scaleX = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "1").toInt
    val li0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val li = li0.crossJoin(spark.range(scaleX).withColumnRenamed("id", "replica"))
      .withColumn("pk", concat_ws("-", col("l_orderkey"), col("l_linenumber"), col("replica")))
    // a CDC-shaped batch: few distinct order keys → few touched buckets.
    // (A batch with ≥`buckets` distinct uniformly-hashed keys touches every
    // bucket and the layout can't prune — measured and documented.)
    val updates = li.filter(col("l_orderkey").isin(
      li.select("l_orderkey").distinct().limit(updKeys).collect().map(_.getLong(0)).toSeq: _*))
      .withColumn("l_quantity", col("l_quantity") + 1.0)
    val hints = TableHints("t", Disposition.Merge, primaryKey = Seq("pk"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val root = java.nio.file.Files.createTempDirectory("bench_merge").toString

    // (a) whole-table staged overwrite
    TableWriter.write(spark, li, root, hints.copy(tableName = "flat"))
    // convert to merge table state: first write materialized it; now time the merge
    val flatMerge = timed {
      TableWriter.write(spark, updates, root, hints.copy(tableName = "flat"))
    }

    // (b) bucketed layout — bucketed by the entity id updates cluster on
    // (l_orderkey), not the full pk, so K entities touch ≤ K buckets
    val bucketKeys = Seq("l_orderkey")
    BucketedMerge.replace(spark, li, s"$root/bucketed", hints, buckets, bucketKeys)
    val bucketedMerge = timed {
      BucketedMerge.merge(spark, updates, s"$root/bucketed", hints, buckets, bucketKeys)
    }

    val nRows = li.count()
    val nUpd = updates.count()
    println(s"""{"metric":"merge_strategies","rows":$nRows,"update_rows":$nUpd,"buckets":$buckets,""" +
      s""""full_rewrite_sec":$flatMerge,"bucketed_sec":$bucketedMerge,"sf":"$sfDir"}""")
    spark.stop()
  }
}
