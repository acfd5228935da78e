package graft.core

import graft.SparkTestBase
import org.apache.hadoop.fs.Path

class TableLockSpec extends SparkTestBase {
  import spark.implicits._

  test("second writer on a held table fails fast; release reopens it") {
    val table = s"${tmpDir("lock")}/t"
    val a = TableLock.acquire(spark, table, "pipeline-a")
    val e = intercept[TableLock.LockHeldException] {
      TableLock.acquire(spark, table, "pipeline-b")
    }
    assert(e.getMessage.contains("pipeline-a"))
    a.release()
    TableLock.acquire(spark, table, "pipeline-b").release()
  }

  test("same-owner identity retakes its own crashed lease immediately") {
    val table = s"${tmpDir("lock_reown")}/t"
    // "crash": lease never released, still fresh
    TableLock.acquire(spark, table, "stream:ckpt-A")
    // the reincarnated holder (same stable identity) gets back in at once
    val back = TableLock.acquire(spark, table, "stream:ckpt-A", staleMs = Long.MaxValue / 2)
    assert(back.owner == "stream:ckpt-A")
    // a different pipeline is still excluded
    intercept[TableLock.LockHeldException] {
      TableLock.acquire(spark, table, "stream:ckpt-B", staleMs = Long.MaxValue / 2)
    }
    back.release()
  }

  test("two batch writers on the same table name exclude each other (no same-owner bypass)") {
    // batch-writer owners are unique per invocation precisely so the
    // same-owner reacquire can never let a second pipeline with the same
    // table name steal a live lease
    val root = tmpDir("lock_two_writers")
    val hints = TableHints(tableName = "t", disposition = Disposition.Replace)
    val other = TableLock.acquire(spark, s"$root/t",
      "writer:t:00000000-aaaa-bbbb-cccc-000000000000")
    intercept[TableLock.LockHeldException] {
      TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"), root, hints)
    }
    other.release()
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"), root, hints)
  }

  test("stale lease is taken over; fresh lease is not") {
    val table = s"${tmpDir("lock_stale")}/t"
    val dead = TableLock.acquire(spark, table, "crashed-writer")
    // age the lease beyond staleMs without releasing it
    dead.fs.setTimes(dead.path, System.currentTimeMillis() - 60000, -1)
    val taker = TableLock.acquire(spark, table, "taker", staleMs = 1000)
    assert(taker.owner == "taker")
    taker.release()
    // a renewed (fresh) lease survives the same attempt
    val live = TableLock.acquire(spark, table, "live-writer")
    live.renew()
    intercept[TableLock.LockHeldException] {
      TableLock.acquire(spark, table, "taker2", staleMs = 60000)
    }
    live.release()
  }

  test("a write cannot interleave with a compaction holding the table, and vice versa") {
    val root = tmpDir("lock_e2e")
    val hints = TableHints(tableName = "t", disposition = Disposition.Replace)
    val path = s"$root/t"
    TableWriter.write(spark, Seq((1L, "a")).toDF("id", "v"), root, hints)

    // compaction in flight (lease held) → the writer must NOT start a swap
    val compacting = TableLock.acquire(spark, path, "compaction")
    intercept[TableLock.LockHeldException] {
      TableWriter.write(spark, Seq((2L, "b")).toDF("id", "v"), root, hints)
    }
    // and the table is untouched by the refused write
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSeq == Seq(1L))
    compacting.release()

    // writer in flight → compaction must refuse
    val writing = TableLock.acquire(spark, path, "writer:t")
    intercept[TableLock.LockHeldException] {
      TableMaintenance.compact(spark, path)
    }
    writing.release()

    // both released: write and compact proceed normally
    TableWriter.write(spark, Seq((2L, "b")).toDF("id", "v"), root, hints)
    assert(spark.read.parquet(path).select("id").as[Long].collect().toSeq == Seq(2L))
    TableMaintenance.compact(spark, path)
    // no lease left behind
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(path + "__lock")))
  }
}
