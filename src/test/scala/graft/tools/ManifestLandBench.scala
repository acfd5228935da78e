package graft.tools

import graft.core.{Disposition, TableHints, TableManifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement backing the BASELINE "manifest land at G
  * generations" row (r16 verdict wrong #1): the old `Publish.land`
  * summed the table's row count with ONE SPARK COUNT JOB PER COMMITTED
  * GENERATION on every land — an append-heavy table with G generations
  * paid G jobs per land, O(G²) across a run of appends. The fix derives
  * counts from parquet footer metadata (zero jobs) and commits them in
  * the manifest, so land is O(1) jobs at any G.
  *
  * Builds G append generations (one publish each, the realistic pipeline
  * rhythm), then times (a) the LIVE land at depth G and (b) what the old
  * per-generation count pass costs at that depth (spark.read.count per
  * committed dir — the exact work the old return statement ran).
  *
  * Run: `sbt "Test/runMain graft.tools.ManifestLandBench <sfDir> <gens>"`
  */
object ManifestLandBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gens = args.lift(1).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("manifest-land-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, gens)
    finally spark.stop()
  }

  private def run(spark: SparkSession, sfDir: String, gens: Int): Unit = {
    val dest = java.nio.file.Files.createTempDirectory("graft_mlb").toString
    val events = graft.core.EventTime.readTable(spark, s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("value")).localCheckpoint(true)
    val total = events.count()
    val slice = math.max(1L, total / gens)
    val hints = TableHints("logs", Disposition.Append)
    val manifest = new TableManifest(spark, dest)
    def batch(g: Int) = events
      .filter(col("event_id") >= g * slice && col("event_id") < (g + 1) * slice)

    println(s"[mlb] appending $gens generations (~$slice rows each) via manifest publishes")
    var lastLandMs = 0.0
    var firstLandMs = 0.0
    var commitMsSum = 0.0
    val tAll = System.nanoTime()
    (0 until gens).foreach { g =>
      val pub = manifest.publish()
      val t0 = System.nanoTime()
      val rows = pub.land(batch(g), hints)
      val ms = (System.nanoTime() - t0) / 1e6
      val tC = System.nanoTime()
      pub.commit()
      commitMsSum += (System.nanoTime() - tC) / 1e6
      if (g == 0) firstLandMs = ms
      if (g == gens - 1) {
        lastLandMs = ms
        println(f"[mlb] land at G=${g + 1}%d: $ms%.0f ms (returned $rows rows)")
      }
    }
    val allMs = (System.nanoTime() - tAll) / 1e6
    println(f"[mlb] land at G=1: $firstLandMs%.0f ms; land at G=$gens%d: $lastLandMs%.0f ms " +
      f"(flat = O(1) jobs holds)")
    // prices the per-table lease + _manifest critical section added in
    // r18: each cycle = table-lease acquire + land + commit-lock +
    // read-merge-write flip + lease release
    println(f"[mlb] mean commit (lease flip incl.): ${commitMsSum / gens}%.1f ms; " +
      f"whole $gens%d-publish run: $allMs%.0f ms")

    // the OLD return statement's work at depth G, priced in isolation:
    // one spark.read.parquet(...).count() per committed generation
    val t0 = System.nanoTime()
    val oldSum = manifest.gens("logs").map(g =>
      spark.read.parquet(s"$dest/logs/$g").count()).sum
    val oldMs = (System.nanoTime() - t0) / 1e6
    println(f"[mlb] OLD per-generation count pass at G=$gens%d: $oldMs%.0f ms " +
      f"($oldSum rows, ${manifest.gens("logs").size} count jobs) — paid on EVERY land before the fix")
  }
}
