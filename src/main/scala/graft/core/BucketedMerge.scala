package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed merge writer — the 100 TB path for `merge` dispositions.
  *
  * `TableWriter.stagedOverwrite` rewrites the WHOLE table per merge; fine
  * for small dimension tables, fatal at scale (a 1 TB table with a 100 MB
  * CDC batch would rewrite 1 TB per batch). Here the destination is laid
  * out as `_bucket=<i>/` partitions keyed by a stable hash of the pk, and
  * a merge:
  *
  *   1. computes the distinct buckets present in the update batch;
  *   2. reads ONLY those partitions of the base table (partition pruning
  *      on `_bucket` — untouched buckets are never scanned);
  *   3. merges per bucket (dedup_sort, upsert anti-join, hard delete — the
  *      same MergeEngine plan) and overwrites only those partition dirs
  *      (dynamic partition overwrite).
  *
  * Rewrite cost per batch is O(touched buckets × bucket size), not
  * O(table). With uniformly-hashed pks and B buckets, a batch touching K
  * distinct keys rewrites ≤ min(K, B)/B of the table. The bucket column
  * doubles as a co-location key: two tables bucketed the same way join
  * bucket-to-bucket without a full shuffle of the big side.
  */
object BucketedMerge {

  val BucketCol = "_bucket"

  def bucketExpr(keys: Seq[String], numBuckets: Int) =
    pmod(xxhash64(keys.map(c => col(c).cast("string")): _*), lit(numBuckets)).cast("int")

  /** Bucket key choice matters more than bucket count: hash the columns
    * update batches CLUSTER by (the entity id a CDC stream keys on), not
    * the full pk — a batch of N distinct full-pk rows touches ~min(N, B)
    * buckets, while the same batch clustered on K entities bucketed by
    * entity id touches ≤ K. Must be a subset of (or functionally
    * determined by) the merge key so a key's rows never migrate buckets.
    */
  private def bucketKeysOf(hints: TableHints, bucketKeys: Seq[String]): Seq[String] =
    if (bucketKeys.nonEmpty) bucketKeys else hints.keyColumns

  /** Initialize or fully replace a bucketed table. */
  def replace(spark: SparkSession, df: DataFrame, path: String, hints: TableHints, numBuckets: Int,
      bucketKeys: Seq[String] = Nil): Unit = {
    val keys = bucketKeysOf(hints, bucketKeys)
    require(keys.nonEmpty, "bucketed layout requires a key")
    df.withColumn(BucketCol, bucketExpr(keys, numBuckets))
      .repartition(col(BucketCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(path)
  }

  /** Merge an update batch, rewriting only the touched buckets. */
  def merge(spark: SparkSession, updates: DataFrame, path: String, hints: TableHints, numBuckets: Int,
      bucketKeys: Seq[String] = Nil): Unit = {
    val keys = bucketKeysOf(hints, bucketKeys)
    require(hints.keyColumns.nonEmpty, "bucketed merge requires a key")
    val exists = TableWriter.readIfExists(spark, path).isDefined
    if (!exists) { replace(spark, updates, path, hints, numBuckets, bucketKeys); return }

    val bucketed = updates.withColumn(BucketCol, bucketExpr(keys, numBuckets))
    // distinct buckets in this batch: tiny driver-side list (≤ numBuckets)
    val touched = bucketed.select(BucketCol).distinct().collect().map(_.getInt(0)).sorted
    if (touched.isEmpty) return

    // mergeSchema: only touched buckets get rewritten per merge, so after a
    // schema-evolving batch the bucket files legitimately differ in schema
    val base = spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col(BucketCol).isin(touched.toSeq: _*)) // partition-pruned scan
    val merged = MergeEngine.mergePlan(Some(base.drop(BucketCol)), bucketed.drop(BucketCol), hints)
      .withColumn(BucketCol, bucketExpr(keys, numBuckets))

    // stage the merged buckets, then swap each touched bucket dir. A
    // bucket emptied by hard deletes has no staged dir and is removed —
    // dynamic partition overwrite alone would silently leave it behind.
    val stagePath = path + "__stage"
    merged
      .repartition(col(BucketCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol)
      .parquet(stagePath)

    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // per-bucket swap mirrors stagedOverwrite's guarantee: the old copy is
    // RENAMED aside (outside the table dir, so partition discovery never
    // sees it) before the staged dir moves in, and deleted only after —
    // a crash mid-swap leaves either the old or the new bucket recoverable,
    // never neither.
    val oldRoot = new org.apache.hadoop.fs.Path(path + "__old")
    repairFromCrash(fs, path, oldRoot)
    fs.mkdirs(oldRoot)
    touched.foreach { b =>
      val dest = new org.apache.hadoop.fs.Path(s"$path/$BucketCol=$b")
      val staged = new org.apache.hadoop.fs.Path(s"$stagePath/$BucketCol=$b")
      val old = new org.apache.hadoop.fs.Path(s"${path}__old/$BucketCol=$b")
      if (fs.exists(dest)) fs.rename(dest, old)
      if (fs.exists(staged)) fs.rename(staged, dest)
      if (fs.exists(old)) fs.delete(old, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(stagePath), true)
    fs.delete(oldRoot, true)
  }

  /** Recover from a crash mid-swap. A crash between `rename(dest, old)` and
    * `rename(staged, dest)` leaves a bucket's ONLY copy under `__old`;
    * deleting the sibling wholesale would lose every base row of that
    * bucket not present in the interrupted batch. So: any `__old` bucket
    * whose destination is absent is renamed BACK into the table first
    * (the interrupted merge never committed, so the pre-merge state is the
    * correct one to resurrect); buckets whose destination exists were
    * already swapped and their old copy is safe to drop.
    */
  private def repairFromCrash(fs: org.apache.hadoop.fs.FileSystem, path: String,
      oldRoot: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(oldRoot)) return
    fs.listStatus(oldRoot).foreach { st =>
      val dest = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
      if (!fs.exists(dest)) fs.rename(st.getPath, dest)
    }
    fs.delete(oldRoot, true)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path).drop(BucketCol)

  /** Point-lookup read — the read-side payoff of the bucketed layout: the
    * scan touches ONLY the `_bucket=` partitions the requested keys hash
    * to (partition pruning on the directory column), then a semi-join
    * keeps exactly the requested keys. At a 256-bucket terabyte table a
    * 5-entity lookup reads ≤5/256 of the data.
    */
  def readForKeys(spark: SparkSession, path: String, keyCols: Seq[String],
      numBuckets: Int, lookup: DataFrame): DataFrame = {
    val wanted = lookup
      .select(bucketExpr(keyCols, numBuckets).as(BucketCol) +: keyCols.map(col): _*)
      .distinct()
    val buckets = wanted.select(BucketCol).distinct().collect().map(_.getInt(0)).toSeq
    spark.read.option("mergeSchema", "true").parquet(path)
      .filter(col(BucketCol).isin(buckets: _*)) // partition-pruned
      .join(wanted.drop(BucketCol).distinct(), keyCols, "left_semi")
      .drop(BucketCol)
  }
}
