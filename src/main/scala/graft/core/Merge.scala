package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The merge/upsert plan builder — the engine's one true custom "physical"
  * operator (SURVEY §2.4, §7.3): join-based MERGE with batch dedup, hard
  * deletes and schema evolution, since no Delta jar ships with the image.
  *
  * Reference semantics implemented:
  *   - `merge` + primary_key = upsert, last-write-wins
  *     (sources/hubspot/__init__.py:298);
  *   - in-batch dedup via `dedup_sort` column, e.g. pick max lsn
  *     (sources/pg_replication/helpers.py:765-767);
  *   - `merge` + merge_key = delete-insert by key set
  *     (sources/bing_webmaster/__init__.py:38-43);
  *   - `hard_delete`: non-null marker column deletes the key
  *     (sources/pg_replication/helpers.py:768-773,839-841);
  *   - pk-less merge degrades to append (sources/google_analytics/__init__.py:98-100).
  *
  * All steps are declarative DataFrame transforms: the upsert anti-join
  * shuffles both sides by the pk hash (at 100 TB the update batch is
  * typically ≪ the base table, so AQE turns the anti-join into a broadcast
  * of the update keys — no full-table shuffle).
  */
object MergeEngine {

  /** In-batch dedup: one row per key, picked by the dedup_sort order with a
    * deterministic tiebreak on the remaining columns.
    */
  def dedupeBatch(updates: DataFrame, keys: Seq[String], dedupSort: Option[(String, Boolean)]): DataFrame = {
    if (keys.isEmpty) updates
    else {
      val orderCols: Seq[Column] = dedupSort match {
        case Some((c, desc)) => Seq(if (desc) col(c).desc_nulls_last else col(c).asc_nulls_last)
        case None            => Seq(monotonically_increasing_id().desc)
      }
      val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
      updates
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  /** Pure merge plan: the state of the table after applying `updates` to
    * `existing` under `hints`. No I/O — callers write the result.
    */
  def mergePlan(existing: Option[DataFrame], updates: DataFrame, hints: TableHints): DataFrame = {
    val keys = hints.keyColumns
    val deduped = dedupeBatch(updates, hints.primaryKey, hints.dedupSort)

    val (liveUpdates, deleteKeys) = hints.hardDeleteCol match {
      case Some(dc) if deduped.columns.contains(dc) =>
        (deduped.filter(col(dc).isNull).drop(dc), Some(deduped.filter(col(dc).isNotNull).select(keys.map(col): _*)))
      case _ => (deduped, None)
    }

    existing match {
      case None => liveUpdates
      case Some(base) if keys.isEmpty => unionEvolved(base, liveUpdates)
      case Some(base) =>
        // survivors: base rows whose key is in neither the update set nor
        // the delete set. No broadcast hint on purpose: update batches are
        // usually small (AQE converts the anti-join to broadcast at
        // runtime from observed sizes), but a full-reload batch can be as
        // large as the table — a forced broadcast would OOM at scale.
        val updKeys = deduped.select(keys.map(col): _*).distinct()
        val survivors = alignTo(base, mergedSchema(base.schema, liveUpdates.schema))
          .join(updKeys, keys, "left_anti")
        unionEvolved(survivors, liveUpdates)
    }
  }

  /** Schema evolution by column union + type widening: new columns appear
    * nullable-backfilled; int→long→decimal→double→string widening mirrors
    * the reference's inferred-schema evolution (SURVEY §7.4.2).
    */
  def mergedSchema(a: StructType, b: StructType): StructType = {
    val bMap = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bMap.get(fa.name) match {
        case Some(fb) => StructField(fa.name, widen(fa.dataType, fb.dataType), fa.nullable || fb.nullable)
        case None     => fa.copy(nullable = true)
      }
    }
    val aNames = a.fieldNames.toSet
    StructType(merged ++ b.fields.filterNot(f => aNames(f.name)).map(_.copy(nullable = true)))
  }

  private val intTypes: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
  private def isInt(dt: DataType): Boolean = intTypes(dt)

  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if isInt(x) && isInt(y) =>
      if (x.defaultSize >= y.defaultSize) x else y
    case (x, d: DecimalType) if isInt(x) => d
    case (d: DecimalType, y) if isInt(y) => d
    case (x, DoubleType) if isInt(x) => DoubleType
    case (DoubleType, y) if isInt(y) => DoubleType
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (_: DecimalType, DoubleType) | (DoubleType, _: DecimalType) => DoubleType
    case (d1: DecimalType, d2: DecimalType) =>
      val s = math.max(d1.scale, d2.scale)
      val i = math.max(d1.precision - d1.scale, d2.precision - d2.scale)
      DecimalType(math.min(38, i + s), s)
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType
  }

  /** SCD2 snapshot merge — dlt-core's third merge strategy (`scd2`): the
    * incoming batch is a FULL snapshot of the source; a key whose payload
    * changed closes its current validity window at `loadTs` and opens a new
    * one, a departed key just closes, a new key just opens, an unchanged
    * key's open row rides through untouched. Row identity is an md5 over
    * the payload columns (null-safe, field-separated). One full-outer join
    * on the key per snapshot — the plan scales like any keyed join and
    * history rows (closed windows) are streamed through untouched.
    */
  def scd2Apply(
      existing: Option[DataFrame],
      snapshot: DataFrame,
      keys: Seq[String],
      loadTs: java.sql.Timestamp,
      validFrom: String = "_valid_from",
      validTo: String = "_valid_to",
  ): DataFrame = {
    require(keys.nonEmpty, "scd2 requires a key")
    val payloadCols = snapshot.columns.filterNot(keys.contains).toSeq
    // lineage columns (_dlt_load_id etc.) change every run by design — they
    // ride along but must not count as a payload change, or every load
    // would close and reopen every row
    val hashCols = payloadCols.filterNot(_.startsWith("_dlt"))
    def hashOf(cols: Seq[Column]): Column =
      md5(concat_ws("\u0001", cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

    existing match {
      case None =>
        snapshot
          .withColumn(validFrom, lit(loadTs))
          .withColumn(validTo, lit(null).cast("timestamp"))
      case Some(base) =>
        val history = base.filter(col(validTo).isNotNull)
        val open = base.filter(col(validTo).isNull)
        val o = open.select(
          keys.map(col) ++ payloadCols.map(c => col(c).as(s"__o_$c")) :+ col(validFrom).as("__o_vf"): _*)
          .withColumn("__h_old", hashOf(hashCols.map(c => col(s"__o_$c"))))
        val n = snapshot.withColumn("__h_new", hashOf(hashCols.map(col)))
        val j = o.join(n, keys, "full_outer")

        val stillOpen = j.filter(col("__h_old") === col("__h_new"))
          .select(keys.map(col) ++ payloadCols.map(c => col(s"__o_$c").as(c)) ++
            Seq(col("__o_vf").as(validFrom), lit(null).cast("timestamp").as(validTo)): _*)
        val closedNow = j.filter(col("__h_old").isNotNull &&
            (col("__h_new").isNull || col("__h_new") =!= col("__h_old")))
          .select(keys.map(col) ++ payloadCols.map(c => col(s"__o_$c").as(c)) ++
            Seq(col("__o_vf").as(validFrom), lit(loadTs).as(validTo)): _*)
        val openedNow = j.filter(col("__h_new").isNotNull &&
            (col("__h_old").isNull || col("__h_new") =!= col("__h_old")))
          .select(keys.map(col) ++ payloadCols.map(col) ++
            Seq(lit(loadTs).as(validFrom), lit(null).cast("timestamp").as(validTo)): _*)

        history.unionByName(stillOpen).unionByName(closedNow).unionByName(openedNow)
    }
  }

  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val present = df.columns.toSet
    val cols = target.fields.toSeq.map { f =>
      if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }

  def unionEvolved(a: DataFrame, b: DataFrame): DataFrame = {
    val target = mergedSchema(a.schema, b.schema)
    alignTo(a, target).unionByName(alignTo(b, target))
  }

}

/** Disposition engine over parquet tables with staged, swap-on-success
  * commits (SURVEY §7.4.1: overwrite-with-staging; crash leaves either the
  * old or the new table, never a half-written one).
  */
object TableWriter {

  def write(spark: SparkSession, updates: DataFrame, tableRoot: String, hints: TableHints): Unit = {
    val name = Naming.normalize(hints.tableName)
    val path = s"$tableRoot/$name"
    // cross-writer exclusion: a second pipeline (or a concurrent
    // compaction) on the same table fails fast instead of interleaving
    // with the staged swap — see TableLock. The owner is unique PER
    // INVOCATION: same-owner reacquire must never let two batch writers
    // with the same table name steal each other's live lease (a crashed
    // batch writer's lease is reclaimed by the stale-age path instead —
    // only stable singleton identities like a streaming checkpoint use
    // the reacquire).
    TableLock.withLock(spark, path,
      owner = s"writer:$name:${java.util.UUID.randomUUID()}") {
      writeLocked(spark, updates, path, hints)
    }
  }

  private def writeLocked(spark: SparkSession, updates: DataFrame, path: String, hints: TableHints): Unit = {
    hints.disposition match {
      case Disposition.Append =>
        readIfExists(spark, path) match {
          case Some(existing) =>
            val target = MergeEngine.mergedSchema(existing.schema, updates.schema)
            val widened = existing.schema.fields.exists(f => target(f.name).dataType != f.dataType)
            if (widened)
              // a batch WIDENED an existing column's type (int→double, …):
              // parquet footer merging cannot reconcile that, so migrate
              // the table once to the widened schema — dlt's ALTER COLUMN
              // analog. Added-columns-only evolution takes the cheap path
              // below (mergeSchema reads) and stays O(batch).
              stagedOverwrite(spark, MergeEngine.unionEvolved(existing, updates), path)
            else
              MergeEngine.alignTo(updates, target).write.mode(SaveMode.Append).parquet(path)
          case None =>
            updates.write.mode(SaveMode.Append).parquet(path)
        }
      case Disposition.Replace =>
        stagedOverwrite(spark, updates, path)
      case Disposition.Merge =>
        hints.bucketCount match {
          case Some(n) if hints.keyColumns.nonEmpty =>
            BucketedMerge.merge(spark, updates, path, hints, n)
          case _ =>
            val existing = readIfExists(spark, path)
            val merged = MergeEngine.mergePlan(existing, updates, hints)
            stagedOverwrite(spark, merged, path)
        }
      case Disposition.Scd2 =>
        val existing = readIfExists(spark, path)
        val loadTs = hints.scd2LoadTs
          .getOrElse(new java.sql.Timestamp(System.currentTimeMillis()))
        val merged = MergeEngine.scd2Apply(existing, updates, hints.keyColumns, loadTs)
        stagedOverwrite(spark, merged, path)
    }
  }

  def readIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mergeSchema: appended batches may carry evolved schemas (new nullable
    // columns); the default single-footer schema would silently DROP them.
    // Merge/replace paths rewrite to one schema, so the cost is paid only
    // on tables that actually evolved.
    if (fs.exists(p)) Some(spark.read.option("mergeSchema", "true").parquet(path)) else None
  }

  /** Write to `<path>__stage`, then swap directories. The swap is two
    * renames — not atomic across both, but the stage dir always holds a
    * complete copy, so recovery is possible from either side.
    */
  def stagedOverwrite(spark: SparkSession, df: DataFrame, path: String): Unit =
    stagedOverwriteWith(spark, df.write, path)

  /** Staged swap for a caller-configured writer (e.g. carrying parquet
    * bloom-filter options) — same rename protocol as [[stagedOverwrite]].
    */
  def stagedOverwriteWith(spark: SparkSession,
      writer: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row],
      path: String): Unit = {
    val stage = new org.apache.hadoop.fs.Path(path + "__stage")
    val dest = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(stage)) fs.delete(stage, true)
    writer.mode(SaveMode.Overwrite).parquet(stage.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dest)) fs.rename(dest, old)
    fs.rename(stage, dest)
    if (fs.exists(old)) fs.delete(old, true)
  }
}
