package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.core.StateStore

/** Cross-run batch URL frontier — the recurring-crawl shape of the
  * reference's seen-archives pattern (sources/chess/__init__.py:95-124:
  * plan the whole range, drop already-fetched archives via the seen set,
  * fetch only the remainder), lifted to URL granularity for a web
  * pipeline: run N lists candidate URLs, canonicalizes them
  * ([[Url.canonicalize]]), anti-joins the committed seen-set, and fetches
  * only never-seen pages.
  *
  * Scale posture: a crawl frontier at corpus scale holds billions of
  * canonical keys, so the seen SET lives columnar — parquet generation
  * dirs under `dest/seen/g<N>` — and membership is a distributed
  * `left_anti` join, never a driver-side collection. The driver-side
  * [[StateStore]] holds only the committed GENERATION LIST: a wave writes
  * its landed pages and its seen additions to fresh generation dirs
  * FIRST and commits the state pointer LAST (StateStore.commit is
  * write-temp + atomic move), so a crash mid-wave leaves orphan
  * uncommitted dirs that no future run ever reads — the landing and the
  * seen-set advance atomically, together.
  */
object UrlFrontier {
  private val GenKey = "frontier.generations"

  /** Numeric suffix of a generation name ("g12" -> 12). */
  private def genNum(g: String): Long = g.dropWhile(!_.isDigit).toLong

  /** Next generation name: monotonic over the committed MAX, not the list
    * size — compaction shrinks the list to one element, and a size-based
    * name would then re-target a committed dir.
    */
  private def nextGen(gens: Seq[String]): String =
    s"g${if (gens.isEmpty) 1L else gens.map(genNum).max + 1L}"

  /** Committed seen-set of canonical keys: the union of committed
    * generations (empty single-column frame before the first commit).
    */
  def seenSet(spark: SparkSession, dest: String, state: StateStore): DataFrame = {
    val gens = state.getList(GenKey)
    if (gens.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("url_canon", StringType))))
    else spark.read.parquet(gens.map(g => s"$dest/seen/$g"): _*)
  }

  /** One crawl wave. `planned` carries raw candidate URLs in `urlCol`
    * (surface-form duplicates welcome — canonicalization collapses them);
    * `fetch` maps the deduped unseen frame (single `url_canon` column) to
    * the landed page rows and must keep `url_canon`. Pages land in
    * `dest/pages/g<N>`, the wave's seen additions in `dest/seen/g<N>`,
    * and the generation pointer commits last. Returns the landed frame.
    *
    * Single-writer per frontier, ENFORCED: the generation list is
    * read-modify-write state, so a wave racing another wave (or a
    * compaction) could commit a list built from a stale read — dropping
    * the other writer's generation or resurrecting superseded dirs. The
    * whole wave runs under the frontier root's [[graft.core.TableLock]]
    * lease (auto-renewed, so an arbitrarily long fetch is never exposed
    * to stale takeover); a concurrent writer fails fast with
    * LockHeldException instead of corrupting the pointer.
    */
  def runWave(spark: SparkSession, dest: String, state: StateStore,
      planned: DataFrame, urlCol: String)(fetch: DataFrame => DataFrame): DataFrame =
    graft.core.TableLock.withLock(spark, dest, s"url-frontier-wave:${java.util.UUID.randomUUID()}") {
      runWaveLocked(spark, dest, state, planned, urlCol)(fetch)
    }

  private def runWaveLocked(spark: SparkSession, dest: String, state: StateStore,
      planned: DataFrame, urlCol: String)(fetch: DataFrame => DataFrame): DataFrame = {
    val canon = planned.select(Url.canonicalize(col(urlCol)).as("url_canon")).distinct()
    val todo = canon.join(seenSet(spark, dest, state), Seq("url_canon"), "left_anti")
    val fetched = fetch(todo)
    require(fetched.columns.contains("url_canon"),
      "fetch must keep the url_canon column — it is the frontier key")
    val gens = state.getList(GenKey)
    val gen = nextGen(gens)
    // overwrite: a crash between landing and commit leaves orphan dirs
    // for this SAME generation name — the retry must replace them, not
    // fail on path-exists (committed generations are never re-targeted,
    // so overwrite can only ever hit uncommitted orphans)
    fetched.write.mode("overwrite").parquet(s"$dest/pages/$gen")
    // derive the seen additions from the LANDED files, not by re-running
    // the fetch plan — one fetch per URL, ever
    val landed = spark.read.parquet(s"$dest/pages/$gen")
    // distinct: fetch may legally emit many rows per page (one per
    // extracted item) — the seen generation stores each frontier KEY once,
    // or the build side of every future wave's anti-join inflates
    // unboundedly at corpus scale
    landed.select("url_canon").distinct()
      .write.mode("overwrite").parquet(s"$dest/seen/$gen")
    state.putList(GenKey, gens :+ gen)
    state.commit()
    landed
  }

  /** Bin-pack ALL committed seen generations into one. A recurring crawl
    * accumulates one parquet dir per wave, so [[seenSet]] unions an
    * ever-wider dir list with an ever-worse small-files profile at the
    * anti-join's build side; the reference rewrites its seen-archives
    * list wholesale each run (sources/chess/__init__.py:95-124) — this is
    * the columnar variant's explicit equivalent. Same crash discipline as
    * a wave: the merged generation lands FIRST under a fresh monotonic
    * name, the pointer (now a single-element list) commits LAST. The
    * superseded dirs are NOT deleted here: a reader that resolved the old
    * generation list may still be scanning them, so deletion is deferred
    * to the unreferenced-dir sweep that runs at the START of the next
    * compaction (a full compaction interval of grace) or to an explicit
    * [[gcSeen]] once in-flight readers have drained. The same sweep also
    * reclaims crash leftovers: a compaction that dies before its commit
    * leaves an orphan merged dir the next wave targeting that number
    * simply overwrites, and one that dies after the commit leaves
    * unreferenced old dirs no run ever reads again (numbers are monotonic
    * over the committed max, so they can never be re-targeted).
    *
    * Output file count is sized off the real input bytes at
    * `targetFileBytes` per file, so hundreds of small wave files become a
    * handful of full scan-friendly ones. Returns the new generation list.
    */
  def compactSeen(spark: SparkSession, dest: String, state: StateStore,
      targetFileBytes: Long = 128L << 20): Seq[String] =
    // same enforced single-writer discipline as a wave: compaction
    // rewrites the generation list, so it must never interleave with a
    // wave's read-modify-write of the same pointer
    graft.core.TableLock.withLock(spark, dest, s"url-frontier-compact:${java.util.UUID.randomUUID()}") {
      compactSeenLocked(spark, dest, state, targetFileBytes)
    }

  private def compactSeenLocked(spark: SparkSession, dest: String, state: StateStore,
      targetFileBytes: Long): Seq[String] = {
    // sweep FIRST (under the same lease): everything unreferenced by the
    // committed list is garbage — generations a previous compaction
    // superseded (left for reader grace, see scaladoc) and crash orphans.
    // Sweeping only one's own inputs after the commit would leak the
    // whole old seen-set on a crash between commit and delete, forever.
    gcSeenLocked(spark, dest, state)
    val gens = state.getList(GenKey)
    if (gens.size <= 1) return gens
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = gens.map(g => new org.apache.hadoop.fs.Path(s"$dest/seen/$g"))
    val totalBytes = dirs.flatMap(d => fs.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen)).sum
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val gen = nextGen(gens)
    // distinct is defensive (committed generations partition the key
    // space by construction). Sizing: repartition, NOT coalesce — a
    // coalesce here would collapse the distinct's final aggregation
    // itself to nFiles tasks (the most expensive part of a corpus-scale
    // compaction), whereas one extra exchange of the already-deduped
    // keys is cheap and keeps the aggregation at full parallelism.
    seenSet(spark, dest, state).distinct().repartition(nFiles)
      .write.mode("overwrite").parquet(s"$dest/seen/$gen")
    state.putList(GenKey, Seq(gen))
    state.commit()
    Seq(gen)
  }

  /** Delete every seen dir not in the committed generation list: crash
    * leftovers from landed-but-uncommitted waves/compactions, and
    * generations superseded by a compaction (retained by [[compactSeen]]
    * so readers that resolved the old list keep their files — call this
    * once in-flight readers have drained, or rely on the sweep the next
    * compaction performs on entry). Runs under the frontier lease.
    * Returns the names of the deleted dirs.
    */
  def gcSeen(spark: SparkSession, dest: String, state: StateStore): Seq[String] =
    graft.core.TableLock.withLock(spark, dest, s"url-frontier-gc:${java.util.UUID.randomUUID()}") {
      gcSeenLocked(spark, dest, state)
    }

  private def gcSeenLocked(spark: SparkSession, dest: String, state: StateStore): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val seenRoot = new org.apache.hadoop.fs.Path(s"$dest/seen")
    if (!fs.exists(seenRoot)) return Nil
    val committed = state.getList(GenKey).toSet
    val garbage = fs.listStatus(seenRoot).toSeq.map(_.getPath)
      .filter(p => !committed.contains(p.getName))
    garbage.foreach(p => fs.delete(p, true))
    garbage.map(_.getName)
  }
}
