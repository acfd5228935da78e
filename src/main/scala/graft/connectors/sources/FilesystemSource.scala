package graft.connectors.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.StateStore

/** Filesystem source with incremental file tracking (SURVEY §2.1 row 7:
  * dlt-core `filesystem` — fsspec listing + readers). Spark's readers do
  * the heavy lifting; the connector-level behavior added here is the
  * seen-file state: each run lists the glob, anti-joins against the seen
  * set (the chess seen-archives pattern, sources/chess/__init__.py:95-124),
  * reads ONLY new files, and commits the enlarged set after load.
  */
object FilesystemSource {

  final case class FileFormat(name: String, options: Map[String, String] = Map.empty)
  val Parquet: FileFormat = FileFormat("parquet")
  val Csv: FileFormat = FileFormat("csv", Map("header" -> "true", "inferSchema" -> "true"))
  val Jsonl: FileFormat = FileFormat("json")

  def seenKey(name: String) = s"filesystem.seen.$name"

  /** List files under `dir` (non-recursive glob by suffix). */
  def listFiles(spark: SparkSession, dir: String, suffix: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Nil
    else
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(suffix))
        .map(_.getPath.toString)
        .sorted
  }

  /** Read only files not yet in the seen set. Returns the frame and the
    * new full seen list to commit after a successful load (None frame =
    * nothing new).
    */
  def readNew(
      spark: SparkSession,
      name: String,
      dir: String,
      format: FileFormat,
      suffix: String,
      state: StateStore,
  ): (Option[DataFrame], Seq[String]) = {
    val all = listFiles(spark, dir, suffix)
    val seen = state.getList(seenKey(name)).toSet
    val fresh = all.filterNot(seen)
    if (fresh.isEmpty) (None, all)
    else {
      var reader = spark.read.format(format.name)
      format.options.foreach { case (k, v) => reader = reader.option(k, v) }
      (Some(reader.load(fresh: _*)), all)
    }
  }

  def commitSeen(state: StateStore, name: String, seen: Seq[String]): Unit = {
    state.putList(seenKey(name), seen)
    state.commit()
  }
}
