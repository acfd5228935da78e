package graft.connectors.streams

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.{BlockingQueue, LinkedBlockingQueue, TimeUnit}

/** Producer/consumer bridge from a threaded producer (crawler, webhook
  * listener, device feed) into batched DataFrames — the scraping host's
  * bounded-queue pattern (sources/scraping/queue.py:25-91: batch_size=10,
  * read_timeout=1 s; threading host runner.py:99-265). The producer runs
  * on its own thread; `drainBatches` pulls size- and time-bounded batches
  * and hands each to a loader callback.
  */
final class QueueBridge[T](capacity: Int = 1000) {

  private val queue: BlockingQueue[Option[T]] = new LinkedBlockingQueue[Option[T]](capacity)
  @volatile private var closed = false
  @volatile private var eosSeen = false

  /** Producer side: blocks when the consumer lags (backpressure). */
  def put(item: T): Unit = {
    require(!closed, "bridge is closed")
    queue.put(Some(item))
  }

  /** Signal end-of-stream; consumers drain what remains then stop. */
  def close(): Unit = {
    closed = true
    queue.put(None)
  }

  /** Pull one batch: up to `batchSize` items or until `readTimeoutMs`
    * passes with the queue idle. Returns None at end-of-stream.
    */
  def nextBatch(batchSize: Int = 10, readTimeoutMs: Long = 1000): Option[Seq[T]] = {
    if (eosSeen) return None
    val buf = scala.collection.mutable.ArrayBuffer.empty[T]
    var waiting = true
    while (buf.size < batchSize && waiting && !eosSeen) {
      queue.poll(readTimeoutMs, TimeUnit.MILLISECONDS) match {
        case null        => waiting = buf.isEmpty // idle timeout: emit what we have
        case Some(item)  => buf += item
        case None        => eosSeen = true
      }
    }
    if (buf.isEmpty && eosSeen) None else Some(buf.toSeq)
  }

  /** Consume the whole stream as DataFrame batches (JSON rows → inferred
    * schema), invoking `load` per batch — extract/load interleave exactly
    * like the reference's pipeline-on-a-thread.
    *
    * Schema is inferred on the FIRST batch only and locked in for the
    * rest of the drain (the same contract every streaming source imposes:
    * one schema per run). Per-batch re-inference doubles the Spark jobs —
    * an extra full pass over every batch — for a guarantee nothing
    * downstream can use anyway, since a mid-drain schema change would
    * break the loader's union/merge target regardless.
    */
  def drainBatches(spark: SparkSession, batchSize: Int = 10, readTimeoutMs: Long = 1000)(
      toJson: T => String)(load: DataFrame => Unit): Int = {
    import spark.implicits._
    var batches = 0
    var schema: Option[org.apache.spark.sql.types.StructType] = None
    var next = nextBatch(batchSize, readTimeoutMs)
    while (next.isDefined) {
      val items = next.get
      if (items.nonEmpty) {
        val ds = spark.createDataset(items.map(toJson))
        val df = schema match {
          case Some(sch) => spark.read.schema(sch).json(ds)
          case None =>
            val first = spark.read.json(ds)
            schema = Some(first.schema)
            first
        }
        load(df)
        batches += 1
      }
      next = nextBatch(batchSize, readTimeoutMs)
    }
    batches
  }
}
