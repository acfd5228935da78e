package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** All-or-nothing multi-table commit — closes the one crash window the
  * per-table staged swap leaves open: a run loading N tables swaps each
  * individually, so a crash BETWEEN two swaps exposes table A's new data
  * next to table B's old data until the re-run (recovery relied on merge
  * idempotence; SURVEY §7.4 hard part 4, the reference's
  * commit-on-success contract at sources/chess/__init__.py:96-97 commits
  * state once after ALL loads).
  *
  * Discipline is the [[graft.ops.UrlFrontier]] pattern generalized to
  * tables: every table's new content LANDS FIRST in a fresh monotonic
  * generation dir (`<root>/<table>/g<N>` — never read by anyone until
  * referenced), and ONE manifest commit LAST (`<root>/_manifest.json`,
  * [[StateStore]]'s write-temp + atomic-move) flips every table's
  * committed generation list together. A crash anywhere before the
  * commit leaves only orphan dirs no reader ever resolves; after it,
  * every table is new. Readers go through [[TableManifest.read]] — the
  * manifest, not a directory glob, is the table.
  *
  * Generation lists let append stay O(batch): an append lands a DELTA
  * dir and the new list is `old :+ delta`; merge/replace/scd2 land a
  * full rewrite and the list shrinks to one entry. Unreferenced dirs
  * (crash orphans, superseded generations) are swept PER TABLE at the
  * next publish's first land into that table, under the table's lease —
  * a full publish interval of reader grace (the frontier's compaction
  * sweep policy), and never a concurrent publisher's uncommitted
  * landings (its tables are leased).
  */
final class TableManifest(spark: SparkSession, root: String) {
  import TableManifest._

  // the manifest file rides java.nio atomic-rename and the generation
  // dirs ride Hadoop FileSystem — on a non-local root (hdfs://, s3a://)
  // those would silently split state, and object stores don't give the
  // atomic rename the commit guarantee rests on. Refuse loudly.
  private val rootUri = new org.apache.hadoop.fs.Path(root).toUri
  require(rootUri.getScheme == null || rootUri.getScheme == "file",
    s"manifestCommit supports local filesystem roots only (got '$root'): the atomic " +
      "manifest flip is a local rename — use the per-table staged-swap path for remote roots")
  private val localRoot =
    if (rootUri.getScheme == null) root else java.nio.file.Paths.get(rootUri).toString

  private val state = new StateStore(java.nio.file.Paths.get(localRoot, "_manifest.json"))

  /** Every touch of the SHARED StateStore serializes on this monitor —
    * two in-flight [[Publish]] objects from one TableManifest instance
    * share `state`, and without the monitor publish B's lease-time
    * `rollback()` could interleave publish A's commit overlay (rollback +
    * putList + commit run under the `_manifest` FILE lock, but that lock
    * only excludes other processes' stores, not this JVM object's other
    * users), wiping A's staged lists before A writes them. The monitor
    * holds for microseconds (map reads, one JSON read/write); lock order
    * is always TableLock -> stateLock, never the reverse, so it cannot
    * deadlock against the file leases.
    */
  private val stateLock = new Object

  /** Tables with a committed generation list. */
  def tables: Seq[String] = stateLock.synchronized {
    state.keys.filter(_.startsWith(Prefix)).map(_.stripPrefix(Prefix))
  }

  /** Committed generation dirs of one table (empty = table unknown). */
  def gens(name: String): Seq[String] = stateLock.synchronized(state.getList(Prefix + name))

  /** Committed per-generation row counts, aligned with [[gens]]; None =
    * unknown (a pre-counts manifest) — callers fall back to footer reads.
    */
  private def committedCounts(name: String): Option[Seq[Long]] = {
    val c = stateLock.synchronized(state.getList(CountsPrefix + name))
    if (c.nonEmpty && c.size == gens(name).size && c.forall(s => s.nonEmpty && s.forall(_.isDigit)))
      Some(c.map(_.toLong))
    else None
  }

  /** Row count of one generation dir from parquet FOOTER metadata —
    * driver-side metadata reads, ZERO Spark jobs. This is what keeps
    * [[Publish.land]] O(1) jobs on an append-heavy table: the old
    * per-generation `spark.read.parquet(...).count()` cost G jobs per
    * land, O(G²) per run across appends.
    */
  private def footerRowCount(dir: String): Long =
    ParquetFooters.rowCount(spark, dir)

  /** The committed table, resolved THROUGH the manifest. mergeSchema:
    * append deltas may carry evolved (added-column) schemas.
    */
  def read(name: String): Option[DataFrame] = {
    val gs = gens(name)
    if (gs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(gs.map(g => s"$root/$name/$g"): _*))
  }

  /** One all-or-nothing publish cycle over any number of tables. Callers
    * [[Publish.land]] each table's updates (any disposition) as the run
    * progresses (thread-safe — Pipeline's level-parallel mode lands from
    * several threads), then [[Publish.commit]] once — the single point
    * where ANY of it becomes visible.
    *
    * CONCURRENCY (per-table, not per-root): the first land into a table
    * takes that TABLE's lease (`<root>/<table>__lock.e<N>`), held through
    * commit — so two pipelines landing DISJOINT tables under one root run
    * fully concurrently, while a second writer touching the SAME table
    * fails fast with LockHeldException at its first land (lands are
    * read-modify-write of that table's generation list). The shared
    * manifest file itself is flipped inside a millisecond-scale critical
    * section (`<root>/_manifest__lock`): re-read the on-disk manifest,
    * overlay ONLY this publish's tables, one atomic write — so commits of
    * disjoint publishes serialize for the flip, not for the run, and
    * neither can lose the other's tables. Overlapping table sets landed
    * in opposite orders cannot deadlock: lease acquisition is fail-fast,
    * so one writer errors instead of waiting.
    */
  final class Publish private[TableManifest] (owner: String) {
    // table -> the generation list to commit (replaces the committed one)
    private val pending = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    // table -> per-generation row counts aligned with pending(table)
    private val pendingCounts = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Long]]
    // "<table>/<gen>" -> rows, memoized footer reads (for committed
    // generations of pre-counts manifests)
    private val countCache = scala.collection.mutable.Map.empty[String, Long]
    private var committed = false
    // table -> its held lease (first land through commit/abort)
    private val leases = scala.collection.mutable.LinkedHashMap.empty[String, TableLock.Lease]
    // renew every held lease well inside staleness — a publish is often
    // data-dependent-long (a big merge rewrite) and must not be exposed
    // to stale takeover mid-landing
    @volatile private var renewer: Thread = null

    /** First touch of a table in this publish: take the table lease, then
      * refresh the committed view from disk (under OUR lease this table's
      * committed list is now stable — only lease holders change it) and
      * sweep the table's crash orphans before their numbers can be
      * re-minted (the frontier's entry-sweep rule, now per table so it
      * can never delete a CONCURRENT publisher's uncommitted landings —
      * those sit under tables whose leases the other writer holds).
      */
    private def leaseTable(name: String): Unit = if (!leases.contains(name)) {
      val l = TableLock.acquire(spark, s"$localRoot/$name", s"manifest-publish:$owner")
      leases.synchronized { leases(name) = l }
      if (renewer == null) {
        renewer = new Thread(() => {
          try while (true) {
            Thread.sleep(5L * 60 * 1000 / 3)
            leases.synchronized(leases.values.toSeq).foreach { l =>
              try l.renew() catch { case _: java.io.IOException => () } // keep beating
            }
          } catch { case _: InterruptedException => () }
        }, s"graft-manifest-lease-renewer:$owner")
        renewer.setDaemon(true)
        renewer.start()
      }
      stateLock.synchronized(state.rollback())
      sweepTable(name)
    }

    private def sweepTable(table: String): Unit = {
      val dir = new org.apache.hadoop.fs.Path(s"$root/$table")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) return
      val keep = (gens(table) ++ pending.getOrElse(table, Nil)).toSet
      fs.listStatus(dir).filter(_.isDirectory).foreach { g =>
        val gen = g.getPath.getName
        if (gen.matches("^g[0-9]+$") && !keep.contains(gen)) fs.delete(g.getPath, true)
      }
    }

    private def releaseAll(): Unit = {
      if (renewer != null) { renewer.interrupt(); renewer = null }
      leases.synchronized {
        leases.values.foreach(_.release())
        leases.clear()
      }
    }

    /** Release every table lease WITHOUT committing — the failed run's
      * landed dirs become orphans the next lease holder sweeps. No-op
      * after commit (which releases on its own).
      */
    def abort(): Unit = synchronized { if (!committed) releaseAll() }

    private def currentDirs(name: String): Seq[String] =
      pending.getOrElse(name, gens(name))

    private def readCurrent(name: String): Option[DataFrame] = {
      val dirs = currentDirs(name)
      if (dirs.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(dirs.map(g => s"$root/$name/$g"): _*))
    }

    private def nextGen(name: String): String = {
      val nums = (gens(name) ++ pending.getOrElse(name, Nil))
        .map(g => g.stripPrefix("g").toLong)
      s"g${if (nums.isEmpty) 1L else nums.max + 1L}"
    }

    private def genCount(name: String, gen: String): Long =
      countCache.getOrElseUpdate(s"$name/$gen", footerRowCount(s"$root/$name/$gen"))

    /** Per-generation counts of the table's CURRENT content (pending if
      * landed this publish, else committed counts, else one footer sweep).
      */
    private def currentCounts(name: String): Seq[Long] =
      pendingCounts.getOrElse(name,
        committedCounts(name).getOrElse(gens(name).map(genCount(name, _))))

    /** Land one table's updates under its disposition; nothing becomes
      * reader-visible until [[commit]]. Returns the table's row count as
      * of this landing (committed + pending content), derived from
      * parquet footer metadata — O(1) Spark jobs per land regardless of
      * how many generations the table has accumulated.
      */
    def land(updates: DataFrame, hints: TableHints): Long = synchronized {
      require(!committed, "publish already committed")
      require(hints.bucketCount.isEmpty,
        "bucketed merge commits per-bucket in place and cannot ride a manifest publish — " +
          "use bucketCount = None for manifest-committed tables")
      val name = Naming.normalize(hints.tableName)
      leaseTable(name)
      val gen = nextGen(name)
      val genPath = s"$root/$name/$gen"
      // overwrite: a crashed publish's orphan with the same number was
      // swept at cycle start, but a racing retry inside one JVM could
      // still leave one — committed generations are never re-targeted
      def landFull(df: DataFrame): Unit = {
        df.write.mode("overwrite").parquet(genPath)
        pending(name) = Seq(gen)
        pendingCounts(name) = Seq(genCount(name, gen))
      }
      hints.disposition match {
        case Disposition.Append =>
          readCurrent(name) match {
            case None => landFull(updates)
            case Some(existing) =>
              val target = MergeEngine.mergedSchema(existing.schema, updates.schema)
              val widened = existing.schema.fields.exists(f => target(f.name).dataType != f.dataType)
              if (widened) landFull(MergeEngine.unionEvolved(existing, updates))
              else {
                // O(batch): the delta lands alone and JOINS the list
                val baseCounts = currentCounts(name)
                MergeEngine.alignTo(updates, target).write.mode("overwrite").parquet(genPath)
                pending(name) = currentDirs(name) :+ gen
                pendingCounts(name) = baseCounts :+ genCount(name, gen)
              }
          }
        case Disposition.Replace =>
          landFull(updates)
        case Disposition.Merge =>
          landFull(MergeEngine.mergePlan(readCurrent(name), updates, hints))
        case Disposition.Scd2 =>
          // NO wall-clock default here: a manifest-committed scd2 table
          // must be byte-identical when re-run from the same inputs
          val loadTs = hints.scd2LoadTs.getOrElse(throw new IllegalArgumentException(
            s"manifest-committed scd2 table '$name' requires hints.scd2LoadTs — a " +
              "wall-clock default would make identical runs land different valid_from stamps"))
          landFull(MergeEngine.scd2Apply(readCurrent(name), updates, hints.keyColumns, loadTs))
      }
      pendingCounts(name).sum
    }

    /** Flip every landed table's committed pointer in ONE atomic manifest
      * write. Before this call, readers see the previous state of EVERY
      * table; after it, the new state of every table. Per-generation row
      * counts commit alongside the lists, so future publishes never
      * re-derive them.
      *
      * The flip runs inside the root's `_manifest` critical section:
      * re-read the on-disk manifest (a concurrent DISJOINT publish may
      * have committed since we last read), overlay only THIS publish's
      * tables, write once — a read-merge-write that would otherwise lose
      * the other writer's tables to last-write-wins. The section is
      * milliseconds (one JSON read + write), so contenders poll-wait
      * rather than fail: the 60 s bound is ~4 orders of magnitude above
      * the section's cost and exists only to surface a wedged filesystem
      * loudly.
      */
    def commit(): Unit = synchronized {
      require(!committed, "publish already committed")
      TableLock.withLock(spark, s"$localRoot/_manifest",
        s"manifest-commit:$owner", waitMs = 60000L) {
        stateLock.synchronized {
          state.rollback()
          pending.foreach { case (name, list) => state.putList(Prefix + name, list) }
          pendingCounts.foreach { case (name, cs) =>
            state.putList(CountsPrefix + name, cs.map(_.toString))
          }
          state.commit()
        }
      }
      committed = true
      releaseAll()
    }
  }

  /** Start a publish cycle. Re-reads the on-disk committed manifest
    * FIRST: a long-lived Pipeline alternating with another writer
    * process would otherwise sweep the other writer's committed
    * generation dirs (absent from its stale cached lists) and commit
    * stale lists over theirs — silent data loss. (Each table's view is
    * re-read AGAIN under its lease at first land, and the whole manifest
    * once more inside the commit critical section — this early read just
    * keeps [[Publish]] helpers honest between those points.)
    */
  def publish(): Publish = {
    stateLock.synchronized(state.rollback())
    new Publish(java.util.UUID.randomUUID().toString.take(8))
  }
}

object TableManifest {
  private val Prefix = "tables."
  private val CountsPrefix = "rowcounts."
}

/** Row counts from parquet FOOTER metadata — driver-side metadata reads,
  * ZERO Spark jobs. Shared by the manifest land path (its O(1)-jobs
  * guarantee) and the pipeline's non-manifest LoadResult counting, which
  * previously paid a full-table scan job per table per run just to
  * report a row count. File count per table dir is bounded by the
  * write's own partitioning, so the listing stays a cheap driver read
  * at scale — the same defense as [[TableManifest.Publish.land]].
  */
private[graft] object ParquetFooters {
  def rowCount(spark: org.apache.spark.sql.SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    // recurse into partition subdirs (bucketed tables land _bucket=N/
    // dirs); skip hidden/marker paths by Spark's own convention — a
    // leading '_' or '.' is hidden unless it's a partition dir ("=")
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if ((n.startsWith("_") || n.startsWith(".")) && !n.contains("=")) Nil
        else if (st.isDirectory) walk(st.getPath)
        else if (n.endsWith(".parquet")) Seq(st)
        else Nil
      }
    val files = walk(root)
    // a table dir that was just written should hold at least one parquet
    // file — the old scan path failed loudly on a missing/misrouted
    // table, so don't let that failure class silently become rows=0
    if (files.isEmpty)
      System.err.println(s"[graft] ParquetFooters: no parquet files under $dir — " +
        "reporting rows=0 (misrouted or failed write?)")
    files.map { st =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
