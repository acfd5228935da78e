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
  * (crash orphans, superseded generations) are swept at the START of the
  * next publish — a full publish interval of reader grace, same policy
  * as the frontier's compaction sweep.
  */
final class TableManifest(spark: SparkSession, root: String) {
  import TableManifest._

  private val state = new StateStore(java.nio.file.Paths.get(root, "_manifest.json"))

  /** Tables with a committed generation list. */
  def tables: Seq[String] = state.keys.filter(_.startsWith(Prefix)).map(_.stripPrefix(Prefix))

  /** Committed generation dirs of one table (empty = table unknown). */
  def gens(name: String): Seq[String] = state.getList(Prefix + name)

  /** The committed table, resolved THROUGH the manifest. mergeSchema:
    * append deltas may carry evolved (added-column) schemas.
    */
  def read(name: String): Option[DataFrame] = {
    val gs = gens(name)
    if (gs.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(gs.map(g => s"$root/$name/$g"): _*))
  }

  /** Sweep every `<root>/<table>/g*` dir not referenced by a committed
    * list (and not in `alsoKeep` — the current publish's own landings).
    */
  private def sweepUnreferenced(alsoKeep: Map[String, Seq[String]]): Unit = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return
    fs.listStatus(rootPath).filter(_.isDirectory).foreach { t =>
      val table = t.getPath.getName
      val keep = (gens(table) ++ alsoKeep.getOrElse(table, Nil)).toSet
      fs.listStatus(t.getPath).filter(_.isDirectory).foreach { g =>
        val gen = g.getPath.getName
        if (gen.matches("^g[0-9]+$") && !keep.contains(gen)) fs.delete(g.getPath, true)
      }
    }
  }

  /** One all-or-nothing publish cycle over any number of tables. Callers
    * [[Publish.land]] each table's updates (any disposition) as the run
    * progresses (thread-safe — Pipeline's level-parallel mode lands from
    * several threads), then [[Publish.commit]] once — the single point
    * where ANY of it becomes visible. Single-writer per root is the CALLER's
    * responsibility (Pipeline holds the root's TableLock for the run).
    */
  final class Publish private[TableManifest] () {
    // table -> the generation list to commit (replaces the committed one)
    private val pending = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
    private var committed = false

    // crash orphans from previous failed publishes die before their
    // numbers can be re-minted (the frontier's entry-sweep rule)
    sweepUnreferenced(Map.empty)

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

    /** Land one table's updates under its disposition; nothing becomes
      * reader-visible until [[commit]]. Returns the table's row count as
      * of this landing (committed + pending content).
      */
    def land(updates: DataFrame, hints: TableHints): Long = synchronized {
      require(!committed, "publish already committed")
      require(hints.bucketCount.isEmpty,
        "bucketed merge commits per-bucket in place and cannot ride a manifest publish — " +
          "use bucketCount = None for manifest-committed tables")
      val name = Naming.normalize(hints.tableName)
      val gen = nextGen(name)
      val genPath = s"$root/$name/$gen"
      // overwrite: a crashed publish's orphan with the same number was
      // swept at cycle start, but a racing retry inside one JVM could
      // still leave one — committed generations are never re-targeted
      def landFull(df: DataFrame): Unit = {
        df.write.mode("overwrite").parquet(genPath)
        pending(name) = Seq(gen)
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
                MergeEngine.alignTo(updates, target).write.mode("overwrite").parquet(genPath)
                pending(name) = currentDirs(name) :+ gen
              }
          }
        case Disposition.Replace =>
          landFull(updates)
        case Disposition.Merge =>
          landFull(MergeEngine.mergePlan(readCurrent(name), updates, hints))
        case Disposition.Scd2 =>
          val loadTs = hints.scd2LoadTs
            .getOrElse(new java.sql.Timestamp(System.currentTimeMillis()))
          landFull(MergeEngine.scd2Apply(readCurrent(name), updates, hints.keyColumns, loadTs))
      }
      pending(name).map(g => spark.read.parquet(s"$root/$name/$g").count()).sum
    }

    /** Flip every landed table's committed pointer in ONE atomic manifest
      * write. Before this call, readers see the previous state of EVERY
      * table; after it, the new state of every table.
      */
    def commit(): Unit = synchronized {
      require(!committed, "publish already committed")
      pending.foreach { case (name, list) => state.putList(Prefix + name, list) }
      state.commit()
      committed = true
    }
  }

  def publish(): Publish = new Publish()
}

object TableManifest {
  private val Prefix = "tables."
}
