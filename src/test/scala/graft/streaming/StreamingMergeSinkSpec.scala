package graft.streaming

import graft.SparkTestBase
import graft.core.{Disposition, StateStore, TableHints}
import graft.connectors.sources.FilesystemSource
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingMergeSinkSpec extends SparkTestBase {
  import spark.implicits._

  case class Upd(id: Long, ver: Long, s: String)

  test("streaming merge sink upserts per micro-batch") {
    implicit val sq = spark.sqlContext
    val dest = tmpDir("smerge-dest")
    val ckpt = tmpDir("smerge-ckpt")
    val hints = TableHints("t", Disposition.Merge, primaryKey = Seq("id"), dedupSort = Some(("ver", true)))

    val input = MemoryStream[Upd]
    input.addData(Upd(1, 1, "a"), Upd(2, 1, "b"))
    val q1 = StreamingMergeSink.start(input.toDF(), dest, hints, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(s"$dest/t").count() == 2)

    // second micro-batch: update id=2, insert id=3
    input.addData(Upd(2, 2, "b2"), Upd(3, 1, "c"))
    val q2 = StreamingMergeSink.start(input.toDF(), dest, hints, ckpt)
    q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(s"$dest/t")
      .select("id", "s").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("filesystem source reads only unseen files across runs") {
    val dir = tmpDir("fs-src")
    val stateDir = tmpDir("fs-state")
    val state = StateStore(stateDir, "fs")
    Seq((1L, "x")).toDF("id", "v").coalesce(1).write.json(s"$dir/batch1")
    // flatten: move part file up as a .json file
    val f1 = FilesystemSource.listFiles(spark, s"$dir/batch1", ".json").head
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(f1), new org.apache.hadoop.fs.Path(s"$dir/a.json"))

    val (df1, seen1) = FilesystemSource.readNew(spark, "t", dir, FilesystemSource.Jsonl, ".json", state)
    assert(df1.get.count() == 1 && seen1.size == 1)
    FilesystemSource.commitSeen(state, "t", seen1)

    // run 2: nothing new
    val (df2, _) = FilesystemSource.readNew(spark, "t", dir, FilesystemSource.Jsonl, ".json", state)
    assert(df2.isEmpty)

    // a new file appears → only it is read
    Seq((2L, "y"), (3L, "z")).toDF("id", "v").coalesce(1).write.json(s"$dir/batch2")
    val f2 = FilesystemSource.listFiles(spark, s"$dir/batch2", ".json").head
    fs.rename(new org.apache.hadoop.fs.Path(f2), new org.apache.hadoop.fs.Path(s"$dir/b.json"))
    val (df3, seen3) = FilesystemSource.readNew(spark, "t", dir, FilesystemSource.Jsonl, ".json",
      StateStore(stateDir, "fs"))
    assert(df3.get.count() == 2 && seen3.size == 2)
  }
}
