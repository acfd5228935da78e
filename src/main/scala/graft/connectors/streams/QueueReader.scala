package graft.connectors.streams

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.StateStore

/** Kafka-style message: numeric offsets per integer partition. */
final case class QueueMessage(
    partition: Int,
    offset: Long,
    key: String,
    value: Array[Byte],
    timestampMs: Long,
)

/** Pluggable broker client (no kafka jar ships with the image): real
  * implementations wrap a consumer; tests inject an in-memory broker.
  */
trait QueueClient extends Serializable {
  def partitions(topic: String): Seq[Int]
  /** Exclusive end offset per partition at call time (the watermark). */
  def endOffsets(topic: String): Map[Int, Long]
  def fetch(topic: String, partition: Int, fromOffset: Long, untilOffset: Long, max: Int): Seq[QueueMessage]
}

/** Kafka-like bounded micro-batch reader (SURVEY §2.1 row 3): reads every
  * partition up to the watermark captured at batch start — "up to current
  * partition length, not waiting for new messages"
  * (sources/kafka/__init__.py:2-5,102-106) — with per-partition offsets in
  * pipeline state (OffsetTracker, sources/kafka/helpers.py:54-219).
  *
  * Partitions fetch in parallel on executors (one task per broker
  * partition — Spark's native strength replaces the reference's
  * single-process loop). Offsets commit AFTER a successful load; crash
  * before commit re-reads the batch, and the digest128-style message id
  * (sha2(topic|partition|offset|key), mirroring sources/kafka/helpers.py:50)
  * makes the retry idempotent under merge.
  */
object QueueReader {

  val envelopeSchema: StructType = StructType(Seq(
    StructField("_queue_topic", StringType),
    StructField("_queue_partition", IntegerType),
    StructField("_queue_offset", LongType),
    StructField("_queue_key", StringType),
    StructField("_queue_ts", TimestampType),
    StructField("data", StringType),
  ))

  def offsetsKey(topic: String): String = s"queue.offsets.$topic"

  /** One bounded batch: [committed offsets, current end offsets). Returns
    * the batch DataFrame and the offsets to commit after load.
    */
  def readBatch(
      spark: SparkSession,
      client: QueueClient,
      topic: String,
      state: StateStore,
      maxPerPartition: Int = 3000, // reference batch_size, sources/kafka/__init__.py:35
  ): (DataFrame, Map[Int, Long]) = {
    val committed: Map[Int, Long] =
      state.getMap(offsetsKey(topic)).map { case (k, v) => k.toInt -> v.toLong }
    val end = client.endOffsets(topic)
    val ranges = client.partitions(topic).map { p =>
      val from = committed.getOrElse(p, 0L)
      val until = math.min(end.getOrElse(p, 0L), from + maxPerPartition)
      (p, from, until)
    }.filter { case (_, f, u) => u > f }

    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(ranges.size, 1))
      .flatMap { case (p, from, until) =>
        client.fetch(topic, p, from, until, Int.MaxValue).iterator.map { m =>
          Row(topic, m.partition, m.offset, m.key,
            new java.sql.Timestamp(m.timestampMs),
            new String(m.value, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    val df = spark.createDataFrame(rdd, envelopeSchema)
      .withColumn("_queue_msg_id",
        sha2(concat_ws("|", col("_queue_topic"), col("_queue_partition"),
          col("_queue_offset"), coalesce(col("_queue_key"), lit(""))), 256))
    val newOffsets = committed ++ ranges.map { case (p, _, until) => p -> until }.toMap
    (df, newOffsets)
  }

  /** Commit offsets to state (call after the load succeeded). */
  def commitOffsets(state: StateStore, topic: String, offsets: Map[Int, Long]): Unit = {
    state.putMap(offsetsKey(topic), offsets.map { case (k, v) => k.toString -> v.toString })
    state.commit()
  }
}

/** Kinesis-style shard cursor: opaque string sequence numbers per shard,
  * shard list can grow (resharding → child shards)
  * (sources/kinesis/__init__.py:72-78, helpers.py:8-43).
  */
final case class ShardMessage(
    shardId: String,
    sequenceNumber: String,
    partitionKey: String,
    data: Array[Byte],
    arrivalTs: Long,
)

trait ShardClient extends Serializable {
  def listShards(stream: String): Seq[String]
  /** Records strictly after `afterSeq` (None = TRIM_HORIZON). */
  def getRecords(stream: String, shardId: String, afterSeq: Option[String], max: Int): Seq[ShardMessage]
}

object ShardReader {

  def cursorKey(stream: String): String = s"shards.cursor.$stream"

  /** Bounded batch across all shards; per-shard max-sequence map is the
    * dict-valued incremental cursor (sources/kinesis/helpers.py:46-63).
    */
  def readBatch(
      spark: SparkSession,
      client: ShardClient,
      stream: String,
      state: StateStore,
      chunkSize: Int = 1000, // reference chunk, sources/kinesis/__init__.py:29
  ): (DataFrame, Map[String, String]) = {
    val committed = state.getMap(cursorKey(stream))
    val shards = client.listShards(stream)

    val rdd = spark.sparkContext
      .parallelize(shards, math.max(shards.size, 1))
      .flatMap { shard =>
        client.getRecords(stream, shard, committed.get(shard), chunkSize).iterator.map { m =>
          Row(stream, m.shardId, m.sequenceNumber, m.partitionKey,
            new java.sql.Timestamp(m.arrivalTs),
            new String(m.data, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    val schema = StructType(Seq(
      StructField("_stream_name", StringType),
      StructField("_shard_id", StringType),
      StructField("_seq_no", StringType),
      StructField("_partition_key", StringType),
      StructField("_arrival_ts", TimestampType),
      StructField("data", StringType),
    ))
    val df = spark.createDataFrame(rdd, schema)
      .withColumn("_shard_msg_id",
        sha2(concat_ws("|", col("_shard_id"), col("_seq_no")), 256))

    // new cursor: per-shard max sequence seen in this batch (one grouped
    // aggregate; opaque sequence numbers compare by (length, lexicographic)
    // so numeric strings of different widths order correctly)
    val maxSeq = df.groupBy("_shard_id")
      .agg(max(struct(length(col("_seq_no")), col("_seq_no"))).as("m"))
      .select(col("_shard_id"), col("m._seq_no"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    (df, committed ++ maxSeq)
  }

  def commitCursor(state: StateStore, stream: String, cursor: Map[String, String]): Unit = {
    state.putMap(cursorKey(stream), cursor)
    state.commit()
  }
}
