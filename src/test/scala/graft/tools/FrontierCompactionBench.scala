package graft.tools

import graft.core.StateStore
import graft.ops.UrlFrontier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement backing the BASELINE "frontier compaction" row:
  * price the small-files growth a recurring crawl accumulates (one seen
  * generation dir per wave) against the compacted single-generation
  * anti-join.
  *
  * Builds N waves over disjoint slices of the events table (each wave's
  * seen generation lands with the wave's natural shuffle-partition file
  * count), then times a NO-NEW-URLS probe wave — pure seen-set anti-join
  * cost — before and after `UrlFrontier.compactSeen`.
  *
  * Run: `sbt "Test/runMain graft.tools.FrontierCompactionBench <sfDir> <waves>"`
  */
object FrontierCompactionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val waves = args.lift(1).map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("frontier-compaction-bench").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, sfDir, waves)
    finally spark.stop()
  }

  private def run(spark: SparkSession, sfDir: String, waves: Int): Unit = {
    val dest = java.nio.file.Files.createTempDirectory("graft_fcb").toString
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val events = graft.core.EventTime.readTable(spark, s"$sfDir/events.parquet")
      .select(col("event_id")).localCheckpoint(true)
    val total = events.count()
    val slice = math.max(1L, total / waves)
    def listing(w: Int): DataFrame = events
      .filter(col("event_id") >= w * slice && col("event_id") < (w + 1) * slice)
      .select(concat(lit("http://h"), col("event_id") % 1000,
        lit(".example.com/p/"), col("event_id")).as("url"))
    def fetch(todo: DataFrame): DataFrame = todo
    println(s"[fcb] building $waves waves over $total events ($slice urls/wave)")
    (0 until waves).foreach(w => UrlFrontier.runWave(spark, dest, state, listing(w), "url")(fetch))

    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def seenFiles: Int = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/seen"))
      .map(d => fs.listStatus(d.getPath).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))).sum
    // the probe wave re-lists EVERY url: zero unseen, so its cost is the
    // canonicalize + distinct + anti-join against the seen generations.
    // Built as ONE frame (not a waves-way union) so the probe's plan cost
    // doesn't scale with the wave count and mask the seen-set side.
    def probe(): (Double, Long) = {
      val all = events.filter(col("event_id") < waves * slice)
        .select(concat(lit("http://h"), col("event_id") % 1000,
          lit(".example.com/p/"), col("event_id")).as("url"))
      val t0 = System.nanoTime()
      var n = -1L
      val canon = all.select(graft.ops.Url.canonicalize(col("url")).as("url_canon")).distinct()
      n = canon.join(UrlFrontier.seenSet(spark, dest, state), Seq("url_canon"), "left_anti").count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val filesBefore = seenFiles
    val (warm, _) = probe() // warm the JVM/page cache once
    val (before1, n1) = probe(); val (before2, _) = probe()
    val before = math.min(before1, before2)
    val tc0 = System.nanoTime()
    val gens = UrlFrontier.compactSeen(spark, dest, state)
    val compactSec = (System.nanoTime() - tc0) / 1e9
    // compaction retains superseded dirs for reader grace; sweep them
    // here (no readers in flight) so filesAfter reports the live set
    UrlFrontier.gc(spark, dest, state)
    val filesAfter = seenFiles
    val (after1, n2) = probe(); val (after2, _) = probe()
    val after = math.min(after1, after2)
    require(n1 == 0 && n2 == 0, s"probe waves must find zero unseen, got $n1/$n2")
    println(f"[fcb] waves=$waves seen_files_before=$filesBefore seen_files_after=$filesAfter " +
      f"gens_after=${gens.size} probe_before=${before}%.2fs (warm $warm%.2f) " +
      f"probe_after=${after}%.2fs compact_cost=${compactSec}%.2fs speedup=${before / after}%.2fx")

    // pages-archive side: the same small-files argument on the much
    // bigger half of the frontier — price a full committedPages scan
    // before/after `UrlFrontier.compactPages` bin-packs one-dir-per-wave
    // into sized files
    def pagesFiles: Int = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/pages"))
      .map(d => fs.listStatus(d.getPath).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))).sum
    def scanPages(): Double = {
      val t0 = System.nanoTime()
      UrlFrontier.committedPages(spark, dest, state).count()
      (System.nanoTime() - t0) / 1e9
    }
    val pFilesBefore = pagesFiles
    scanPages() // warm
    val pBefore = math.min(scanPages(), scanPages())
    val tp0 = System.nanoTime()
    val pGens = UrlFrontier.compactPages(spark, dest, state)
    val pagesCompactSec = (System.nanoTime() - tp0) / 1e9
    UrlFrontier.gc(spark, dest, state) // sweep superseded dirs (no readers in flight)
    val pFilesAfter = pagesFiles
    val pAfter = math.min(scanPages(), scanPages())
    println(f"[fcb] pages_files_before=$pFilesBefore pages_files_after=$pFilesAfter " +
      f"pages_gens_after=${pGens.size} pages_scan_before=${pBefore}%.2fs " +
      f"pages_scan_after=${pAfter}%.2fs pages_compact_cost=${pagesCompactSec}%.2fs " +
      f"speedup=${pBefore / pAfter}%.2fx")
  }
}
