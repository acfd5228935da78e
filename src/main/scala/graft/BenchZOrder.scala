package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{EventTime, ZOrder}

/** Z-order layout benefit study: the same events table written (a) in
  * natural ingest order and (b) z-ordered on (user_id, event_id), then
  * probed with the same selective 2-D box predicate. What's measured is
  * the layout contract, not Spark magic: with disjoint per-file z ranges
  * every file is a tight box in BOTH dimensions, so parquet row-group
  * min/max stats reject almost all of the scan; the natural layout has
  * every file spanning the full user_id range and prunes nothing.
  * Reports bytes-read-proxy (rows scanned via a count over the pushed
  * filter) and wall seconds, min-of-2 each.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ZTILE=10 sbt "runMain graft.BenchZOrder"
  */
object BenchZOrder {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tile = sys.env.getOrElse("SPARK_GRAFT_ZTILE", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m") // several row groups/splits even at local scale
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = EventTime.readTable(spark, s"$sfDir/events.parquet")
      .select("event_id", "user_id", "event_type", "value")
    // tile volume WITHOUT shifting the key space: the point is row-group
    // pruning inside one id domain, not disjoint tile domains
    val events = (0 until tile).map(_ => base.toDF())
      .reduce(_ unionByName _)
      .localCheckpoint(true)
    val n = events.count()
    val st = events.agg(min("user_id"), max("user_id"), min("event_id"), max("event_id")).head
    val (uLo, uHi, eLo, eHi) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))

    val natural = "/tmp/zbench/natural"
    val zed = "/tmp/zbench/zordered"
    val files = 64
    events.repartition(files).write.mode("overwrite").parquet(natural)
    ZOrder.writeZOrdered(events, Seq("user_id", "event_id"), zed, bits = 16, numFiles = files)

    // selective 2-D box: ~1/16 of users x ~1/16 of event ids ≈ 0.4%
    val uSpan = math.max((uHi - uLo + 1) / 16, 1L)
    val eSpan = math.max((eHi - eLo + 1) / 16, 1L)
    val pred = col("user_id").between(uLo, uLo + uSpan - 1) &&
      col("event_id").between(eLo, eLo + eSpan - 1)
    // scanned = scan-node output rows = rows in row groups that SURVIVED
    // parquet min/max pruning (Spark's residual filter runs after the
    // reader, so this is the honest I/O-pruning measure; wall time at
    // this local scale is task-overhead-dominated either way)
    def timed(path: String): (Double, Long, Long) = {
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(path).filter(pred).agg(count(lit(1))).head
        (System.nanoTime() - t0) / 1e9
      }.min
      val df = spark.read.parquet(path).filter(pred)
      val rows = df.collect().length.toLong // executes THIS plan instance so its scan metrics populate
      val scanned = df.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (secs, rows, scanned)
    }
    val (tN, rN, sN) = timed(natural)
    val (tZ, rZ, sZ) = timed(zed)
    require(rN == rZ, s"layouts disagree: $rN vs $rZ")
    println(f"""[zorder] {"rows": $n, "hit_rows": $rN, "files": $files, """ +
      f""""scanned_natural": $sN, "scanned_zorder": $sZ, """ +
      f""""natural_sec": $tN%.3f, "zorder_sec": $tZ%.3f, """ +
      f""""scan_reduction": ${sN.toDouble / math.max(sZ, 1L)}%.1f}""")
    spark.stop()
  }
}
