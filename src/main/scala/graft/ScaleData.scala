package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-proof data generator: tiles an existing sf dir K× into `dst`
  * with per-copy id shifts, so the scale-sensitive operator family can
  * be exercised at 10× the largest driver-provided SF
  * (`runMain graft.ScaleData /root/testdata/sf0.1 /tmp/sf1 10`).
  *
  * Copies beyond the first get a per-copy suffix token appended to the
  * document text: cross-copy duplicates are then NEAR-dups (minhash
  * finds them, digests do not), which stresses the LSH cap/refinement
  * and incremental-index paths rather than just the exact-digest
  * groupBy. n_chars is recomputed to stay consistent with the text.
  * Events keep their raw ts column verbatim in whatever parquet encoding
  * the source dir carries (ns-long or µs-NTZ — `EventTime.readTable`
  * normalizes at read time); embedding vectors
  * repeat unchanged (ANN ties across copies break deterministically by
  * id on both engines).
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, kStr) = args
    val k = kStr.toInt
    require(k >= 1, "k >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val OFF = 100000000L // per-copy id shift, far above any fixture id

    def tile(name: String, idCol: String, withText: Boolean): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      val copies = (0 until k).map { i =>
        val shifted = base.withColumn(idCol, col(idCol) + lit(i * OFF))
        if (withText && i > 0)
          shifted.withColumn("text", concat(col("text"), lit(s" copy$i")))
        else shifted
      }
      val all = copies.reduce(_.unionByName(_))
      val out = if (withText) all.withColumn("n_chars", length(col("text")).cast("long")) else all
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scale] $name: ${base.count()} -> ${out.count()} rows")
    }

    tile("documents", "doc_id", withText = true)
    tile("embeddings", "vec_id", withText = false)
    tile("events", "event_id", withText = false)
    spark.stop()
  }
}
