package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.functions._
import graft.core._

/** Resource: a named lazy DataFrame builder with table hints — the Spark
  * equivalent of `@dlt.resource` (SURVEY §1.1). `parentName` marks a
  * transformer fed by another resource's output
  * (`@dlt.transformer`, sources/pipedrive/__init__.py:95-101).
  * `selected=false` resources run (e.g. to build state) but do not load
  * (sources/pipedrive/__init__.py:70-72 create_state).
  * `routingColumn` splits one extracted stream into N tables by value
  * (SURVEY §2.8).
  */
final case class ResourceDef(
    name: String,
    hints: TableHints,
    build: PipelineContext => DataFrame,
    parentName: Option[String] = None,
    selected: Boolean = true,
    routingColumn: Option[String] = None,
    incremental: Option[(Incremental, String)] = None, // (cursor, cursor column for state)
    /** Per-variant hint overrides — the `dlt.mark.with_hints(...,
      * create_table_variant=True)` surface (reference
      * sources/pg_replication/helpers.py:781-790: per-routed-table
      * disposition/columns computed at runtime). Keys are matched against
      * BOTH the raw routed/variant value and the final normalized table
      * name; a hit replaces `hints` for that table (its `tableName` is
      * still overwritten with the routed name). Two ways rows reach a
      * variant:
      *  - `routingColumn` fan-out: the routed value picks the variant;
      *  - no routing column, but the extract marks rows with
      *    [[Pipeline.HintVariantCol]]: NULL-marked rows land in the base
      *    table under `hints`; a non-null variant value `v` lands in
      *    table `v` (normalized) under `hintVariants(v)` — one extract,
      *    several tables with DIFFERENT merge keys/dispositions.
      */
    hintVariants: Map[String, TableHints] = Map.empty,
)

/** Source: a group of resources sharing config and state — `@dlt.source`. */
final case class SourceDef(name: String, resources: Seq[ResourceDef])

/** What each resource sees while building: the session, committed state,
  * and the DataFrames of already-built parent resources.
  */
final class PipelineContext(
    val spark: SparkSession,
    val state: StateStore,
    val parents: Map[String, DataFrame],
)

final case class LoadResult(table: String, rows: Long)

object Pipeline {
  /** Well-known column an extract adds to mark rows for a table variant
    * (`dlt.mark.with_hints(..., create_table_variant=True)`): NULL = the
    * resource's base table under its own hints; a non-null value `v` =
    * table `v` under `ResourceDef.hintVariants(v)`. Consumed (dropped)
    * by the pipeline before normalization.
    */
  val HintVariantCol = "_graft_hint_variant"
}

/** The pipeline driver: extract → normalize → write → state commit
  * (SURVEY §3.1). Resources run parents-first; cursors and custom state
  * commit only after every write succeeded (crash before commit = clean
  * re-run from the previous cursor, mirroring the reference's
  * commit-on-success contract, sources/chess/__init__.py:96-97).
  */
final class Pipeline(
    spark: SparkSession,
    pipelineName: String,
    destRoot: String,
    stateDir: String,
    /** >1 loads independent resources of the same dependency level
      * concurrently (Spark schedules the jobs in parallel; tables are
      * independent paths so writes don't conflict). Transformer ordering
      * still holds: a level only starts after its parents' level finished.
      */
    parallelism: Int = 1,
    /** All-or-nothing multi-table commit: every table's new content lands
      * in a fresh generation dir first and ONE manifest write flips every
      * pointer together ([[graft.core.TableManifest]]) — a crash between
      * two tables' finalizes is invisible to manifest readers, where the
      * default per-table staged swap would expose table A new / table B
      * old until the re-run. Data commits BEFORE cursors: a crash between
      * the two commits re-runs the batch against already-new tables, the
      * property-tested idempotent-merge path — never the reverse (cursors
      * advanced past data that never landed = silent loss). Readers must
      * resolve tables through the manifest, not `destRoot/<table>`.
      */
    manifestCommit: Boolean = false,
) {

  /** The destination manifest (only meaningful with `manifestCommit`). */
  lazy val manifest: TableManifest = new TableManifest(spark, destRoot)

  def run(source: SourceDef): Seq[LoadResult] =
    if (!manifestCommit) runInner(source)
    else {
      // exclusion is PER TABLE, taken inside the publish at each table's
      // first land and held through the commit flip — two pipelines
      // landing disjoint tables under one root run concurrently; a
      // same-table writer fails fast with LockHeldException (the commit
      // itself merges into the shared manifest inside a millisecond
      // critical section, so neither writer can lose the other's tables)
      val pub = manifest.publish()
      currentPublish = Some(pub)
      try runInner(source)
      finally {
        currentPublish = None
        pub.abort() // releases leases iff the run died before commit
      }
    }

  private var currentPublish: Option[TableManifest#Publish] = None

  private def runInner(source: SourceDef): Seq[LoadResult] = {
    // load id stamped on every row of this run (dlt's _dlt_load_id):
    // monotonically increasing, recorded in state for lineage
    val loadId = java.util.UUID.randomUUID().toString.take(8) + "-" + System.currentTimeMillis()
    currentLoadId = Some(loadId)
    val state = StateStore(stateDir, s"$pipelineName.${source.name}")
    state.put("last_load_id", loadId)
    val ordered = topoOrder(source.resources)
    val built = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
    val results = scala.collection.mutable.ArrayBuffer.empty[LoadResult]
    val pendingCursor = scala.collection.mutable.ArrayBuffer.empty[(String, String)]

    def process(res: ResourceDef): Seq[LoadResult] = {
      val ctx = new PipelineContext(spark, state,
        scala.jdk.CollectionConverters.MapHasAsScala(built).asScala.toMap)
      var df = res.build(ctx)
      res.incremental.foreach { case (inc, _) =>
        df = inc.apply(df, state, cursorKey(source, res))
      }
      built.put(res.name, df)
      if (!res.selected) Nil
      else {
        // incremental high-water mark, computed on the filtered batch but
        // committed only after all writes succeed. NOT committed while an
        // external scheduler window is active: a backfill run over an old
        // interval must leave the committed cursor where it was — advancing
        // it to the interval's max would regress the high-water mark and
        // re-ingest everything after the interval on the next normal run
        // (the gap-free/re-runnable property orchestrator windows exist for).
        res.incremental.foreach { case (inc, _) =>
          if (!inc.externalWindowActive) {
            inc.nextCursor(df).foreach { v =>
              pendingCursor.synchronized { pendingCursor += (cursorKey(source, res) -> v) }
            }
          }
        }
        writeRouted(df, res)
      }
    }

    if (parallelism <= 1) {
      ordered.foreach(res => results ++= process(res))
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
      try {
        dependencyLevels(ordered).foreach { level =>
          val futures = level.map(res => pool.submit(new java.util.concurrent.Callable[Seq[LoadResult]] {
            override def call(): Seq[LoadResult] = process(res)
          }))
          futures.foreach(f => results ++= f.get()) // propagate failures, barrier per level
        }
      } finally pool.shutdown()
    }

    // manifest mode: flip every table's pointer in ONE commit, BEFORE the
    // cursor commit (crash between = idempotent re-run over new tables)
    currentPublish.foreach(_.commit())
    pendingCursor.foreach { case (k, v) => state.put(k, v) }
    state.commit()
    results.toSeq
  }

  /** Group the topo order into levels: level n contains resources whose
    * parents all sit in levels < n.
    */
  private def dependencyLevels(ordered: Seq[ResourceDef]): Seq[Seq[ResourceDef]] = {
    val level = scala.collection.mutable.Map.empty[String, Int]
    ordered.foreach { r =>
      level(r.name) = r.parentName.map(p => level(p) + 1).getOrElse(0)
    }
    ordered.groupBy(r => level(r.name)).toSeq.sortBy(_._1).map(_._2)
  }

  private def cursorKey(source: SourceDef, res: ResourceDef): String =
    s"${source.name}.${res.name}.cursor"

  /** Parents before children (transformer DAG ordering — state producers
    * must run before consumers, SURVEY §3.3).
    */
  private def topoOrder(resources: Seq[ResourceDef]): Seq[ResourceDef] = {
    val byName = resources.map(r => r.name -> r).toMap
    val visiting = scala.collection.mutable.Set.empty[String]
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(r: ResourceDef): Unit = {
      if (done.contains(r.name)) return
      if (!visiting.add(r.name))
        throw new IllegalArgumentException(s"resource cycle at ${r.name}")
      r.parentName.foreach { p =>
        visit(byName.getOrElse(p,
          throw new IllegalArgumentException(s"resource ${r.name} references unknown parent $p")))
      }
      visiting.remove(r.name)
      done += r.name
    }
    resources.foreach(visit)
    done.toSeq.map(byName)
  }

  /** Routed writes are SINGLE-PASS over the source: the batch is staged
    * once, parquet-partitioned by the routing value (dir per table), and
    * each table finalizes from its pruned staged partition. The previous
    * shape — one filtered scan per routed value — made a Slack/Kafka-style
    * fan-out to hundreds of tables hundreds of source scans; this is one
    * source scan + one bounded stage, and the per-table reads are
    * partition-pruned to their own directory. Rows with a null routing
    * value are dropped (they name no table). No routing column = single
    * table, no stage.
    */
  private def writeRouted(df: DataFrame, res: ResourceDef): Seq[LoadResult] = {
    res.routingColumn match {
      case None if df.columns.contains(Pipeline.HintVariantCol) =>
        // item-level variant marks (create_table_variant): NULL-marked
        // rows are the base table; marked rows fan out to the variant's
        // own table+hints. Same single-pass staged split as routing — the
        // base table is just one more staged partition (sentinel-keyed),
        // so the source is still scanned exactly once.
        val vc = Pipeline.HintVariantCol
        val keyed = df.withColumn(vc,
          coalesce(col(vc).cast("string"), lit(BaseVariantSentinel)))
        stagedFanOut(keyed, vc, res, dropNulls = false) { v =>
          if (v == BaseVariantSentinel) res.hints
          else variantHints(res, v, Naming.normalize(v)).copy(tableName = Naming.normalize(v))
        }
      case None =>
        writeNormalized(df, res.hints)
      case Some(rc) =>
        stagedFanOut(df, rc, res, dropNulls = true) { v =>
          val routeName = if (v == EmptyRouteSentinel) "" else v
          val name = Naming.normalize(s"${res.hints.tableName}_$routeName")
          variantHints(res, routeName, name).copy(tableName = name)
        }
    }
  }

  /** Variant lookup: raw routed/variant value first, then the final
    * normalized table name; default = the resource's own hints.
    */
  private def variantHints(res: ResourceDef, raw: String, name: String): TableHints =
    res.hintVariants.getOrElse(raw, res.hintVariants.getOrElse(name, res.hints))

  /** Single-pass staged split of `df` by `keyCol`: the batch is staged
    * once, parquet-partitioned by the key (dir per table), and each table
    * finalizes from its pruned staged partition under `hintsFor(value)`.
    * The previous shape — one filtered scan per routed value — made a
    * Slack/Kafka-style fan-out to hundreds of tables hundreds of source
    * scans; this is one source scan + one bounded stage, and the
    * per-table reads are partition-pruned to their own directory.
    */
  private def stagedFanOut(df: DataFrame, keyCol: String, res: ResourceDef,
      dropNulls: Boolean)(hintsFor: String => TableHints): Seq[LoadResult] = {
    val stage = s"$destRoot/__stage/${Naming.normalize(res.hints.tableName)}_" +
      currentLoadId.getOrElse("run")
    val hconf = spark.sparkContext.hadoopConfiguration
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    val fs = stagePath.getFileSystem(hconf)
    try {
      // empty-string routing values would land in the writer's
      // __HIVE_DEFAULT_PARTITION__ alongside genuine nulls (Spark
      // treats "" as the default partition) and silently vanish — map
      // them to a sentinel so they stage as their own partition and
      // keep routing to the bare `<table>_` name
      val in = if (dropNulls) df.filter(col(keyCol).isNotNull) else df
      in.withColumn(keyCol,
          when(col(keyCol).cast("string") === "", lit(EmptyRouteSentinel))
            .otherwise(col(keyCol).cast("string")))
        .write.mode("overwrite").partitionBy(keyCol).parquet(stage)
      // enumerate tables from the staged directory names — a driver FS
      // listing, not a Spark job over the data
      val values = fs.listStatus(stagePath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith(s"$keyCol="))
        .map(n => ExternalCatalogUtils.unescapePathName(n.substring(keyCol.length + 1)))
        .filter(_ != "__HIVE_DEFAULT_PARTITION__")
      // explicit schema (key as string) so partition-type inference can't
      // retype numeric routing values and defeat the pruning filter
      val stagedSchema = org.apache.spark.sql.types.StructType(
        df.schema.fields.filterNot(_.name == keyCol) :+
          org.apache.spark.sql.types.StructField(keyCol, org.apache.spark.sql.types.StringType))
      val staged = spark.read.schema(stagedSchema).parquet(stage)
      values.sorted.flatMap { v =>
        val sub = staged.filter(col(keyCol) === v).drop(keyCol)
        writeNormalized(sub, hintsFor(v))
      }
    } finally fs.delete(stagePath, true)
  }

  private val BaseVariantSentinel = "__graft_base__"

  private val EmptyRouteSentinel = "__graft_empty__"

  private var currentLoadId: Option[String] = None

  /** Normalize (parent + child tables), then apply the disposition to each
    * produced table. Child tables always merge on `_dlt_id` when the root
    * merges (re-runs replace children deterministically since ids are
    * content-derived). Every row carries `_dlt_load_id` for run lineage
    * (the dlt framework column).
    */
  private def writeNormalized(df0: DataFrame, hints: TableHints): Seq[LoadResult] = {
    val df = currentLoadId match {
      case Some(id) if !df0.columns.contains("_dlt_load_id") =>
        df0.withColumn("_dlt_load_id", lit(id))
      case _ => df0
    }
    val tables = Normalize.normalize(df, hints)
    tables.toSeq.map { case (name, tdf) =>
      val childHints =
        if (name == Naming.normalize(hints.tableName)) hints.copy(tableName = name)
        else hints.copy(tableName = name, primaryKey = Seq(Normalize.DltId), dedupSort = None, hardDeleteCol = None)
      currentPublish match {
        case Some(pub) =>
          // manifest mode: LAND only — nothing is reader-visible until the
          // run's single pointer flip in run()
          LoadResult(name, pub.land(tdf, childHints))
        case None =>
          TableWriter.write(spark, tdf, destRoot, childHints)
          // footer metadata, not a scan: the old full-table count() here
          // was one extra whole-table job per table per run
          LoadResult(name, graft.core.ParquetFooters.rowCount(spark, s"$destRoot/$name"))
      }
    }
  }
}
