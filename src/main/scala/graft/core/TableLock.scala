package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Cross-writer exclusion for a parquet table: a lease file CREATED
  * atomically (`create(overwrite = false)` — one winner on HDFS and
  * object-store FS shims) next to the table directory. The engine's
  * dispositions assume a single writer per table (staged swaps and
  * compaction markers are private to the maintainer); the lease makes
  * that assumption enforced instead of hoped: a second pipeline trying to
  * write or compact the same table fails fast with `LockHeldException`
  * rather than interleaving a directory swap with a compaction rewrite —
  * an interleaving that could resurrect replaced files or delete
  * originals out from under a swap.
  *
  * The lease lives NEXT TO the table dir (`<path>__lock`), not inside it:
  * `stagedOverwrite` renames the whole directory, and a lock inside would
  * be swapped away with it.
  *
  * Stale-lease takeover: a crashed writer never releases. A lease older
  * than `staleMs` (file modification time) is deleted and re-acquired;
  * the atomic create arbitrates if two takers race. Long-running holders
  * renew by touching the lease (`renew`).
  */
object TableLock {

  final class LockHeldException(msg: String) extends RuntimeException(msg)

  final case class Lease(fs: FileSystem, path: Path, owner: String, token: String) {
    /** Refresh the lease mtime so a long maintenance job isn't taken over. */
    def renew(): Unit = fs.setTimes(path, System.currentTimeMillis(), -1)
    def release(): Unit = {
      // best-effort ownership check: never delete someone else's lease
      val mine = try {
        val in = fs.open(path)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        s.contains(token)
      } catch { case _: java.io.IOException => false }
      if (mine) fs.delete(path, false)
      ()
    }
  }

  private def lockPath(tablePath: String) = new Path(tablePath + "__lock")

  def acquire(
      spark: SparkSession,
      tablePath: String,
      owner: String,
      staleMs: Long = 15L * 60 * 1000,
  ): Lease = {
    val p = lockPath(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (p.getParent != null) fs.mkdirs(p.getParent)
    val token = java.util.UUID.randomUUID().toString

    def tryCreate(): Option[Lease] =
      try {
        val out = fs.create(p, false) // atomic one-winner create
        try out.write(s"owner=$owner\ntoken=$token\n".getBytes(StandardCharsets.UTF_8))
        finally out.close()
        Some(Lease(fs, p, owner, token))
      } catch { case _: java.io.IOException => None }

    tryCreate().getOrElse {
      // same-owner reacquire: a holder identity that survives process
      // death (e.g. a streaming query's checkpoint dir) can always retake
      // its own lease — the platform guarantees one active instance per
      // such identity, so the previous holder is necessarily dead. Without
      // this, a crashed-and-restarted pipeline would be blocked by its own
      // corpse until staleMs elapsed.
      val sameOwner = try {
        val in = fs.open(p)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        s.linesIterator.contains(s"owner=$owner")
      } catch { case _: java.io.IOException => false }
      val stale = sameOwner || (try {
        System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > staleMs
      } catch { case _: java.io.IOException => true }) // vanished between attempts
      if (stale) {
        // takeover: drop the dead lease and race the create; the atomic
        // create picks exactly one winner among concurrent takers
        fs.delete(p, false)
        tryCreate().getOrElse(throw new LockHeldException(
          s"lost takeover race for $tablePath"))
      } else {
        val holder = try {
          val in = fs.open(p)
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
        throw new LockHeldException(
          s"table $tablePath is locked by another writer ($holder); " +
            "concurrent write/compaction would corrupt the staged-swap protocol")
      }
    }
  }

  /** Run `f` under the table lease; always released, even on failure. */
  def withLock[T](spark: SparkSession, tablePath: String, owner: String,
      staleMs: Long = 15L * 60 * 1000)(f: => T): T = {
    val lease = acquire(spark, tablePath, owner, staleMs)
    try f finally lease.release()
  }
}
