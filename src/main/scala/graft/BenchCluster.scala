package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Connected-components crossover micro-benchmark: times clusterPairs'
  * driver union-find path against the distributed alternating-star path on
  * synthetic edge sets of increasing size — the evidence behind the
  * `driverMaxEdges` default (below it, log n shuffle rounds cost more than
  * one collect; above it, the driver path would stop fitting and the star
  * rounds win by construction).
  */
object BenchCluster {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // edge generator: ring chains of length ~8 plus random cross links —
    // mixed shallow/deep components like a real near-dup graph
    def edges(n: Long) = spark.range(n).select(
      col("id").as("id_a"),
      when(pmod(col("id"), lit(8)) === 7, col("id") - lit(7L)) // close the chain
        .otherwise(col("id") + 1).as("id_b"))

    val sizes = sys.env.getOrElse("SPARK_GRAFT_EDGE_SIZES", "100000,1000000,4000000")
      .split(",").map(_.trim.toLong)
    val results = sizes.map { n =>
      val e = edges(n).cache()
      e.count()
      val tDriver = timed(Dedup.clusterPairs(e, driverMaxEdges = Long.MaxValue).count())
      val tDist = timed(Dedup.clusterPairs(e, driverMaxEdges = 0L).count())
      e.unpersist()
      s""""$n":{"driver_sec":${f"$tDriver%.2f"},"distributed_sec":${f"$tDist%.2f"}}"""
    }
    println(s"""{"metric":"cluster_crossover","sizes":{${results.mkString(",")}}}""")
    spark.stop()
  }
}
