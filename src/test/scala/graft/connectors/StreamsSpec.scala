package graft.connectors.streams

import graft.SparkTestBase
import graft.core.StateStore

/** In-memory broker with fixed messages per partition. */
class FakeBroker(msgs: Map[Int, Seq[String]]) extends QueueClient {
  override def partitions(topic: String): Seq[Int] = msgs.keys.toSeq.sorted
  override def endOffsets(topic: String): Map[Int, Long] =
    msgs.map { case (p, m) => p -> m.size.toLong }
  override def fetch(topic: String, partition: Int, from: Long, until: Long, max: Int): Seq[QueueMessage] =
    msgs(partition).zipWithIndex
      .slice(from.toInt, until.toInt)
      .map { case (v, i) => QueueMessage(partition, i.toLong, s"k$i", v.getBytes("UTF-8"), 1700000000000L + i) }
}

class FakeShards(shards: Map[String, Seq[String]]) extends ShardClient {
  override def listShards(stream: String): Seq[String] = shards.keys.toSeq.sorted
  override def getRecords(stream: String, shardId: String, afterSeq: Option[String], max: Int): Seq[ShardMessage] = {
    val all = shards(shardId).zipWithIndex.map { case (v, i) =>
      ShardMessage(shardId, (i + 1).toString, s"pk$i", v.getBytes("UTF-8"), 1700000000000L)
    }
    val after = afterSeq.map(s => s.toInt).getOrElse(0)
    all.filter(_.sequenceNumber.toInt > after).take(max)
  }
}

class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  test("queue reader: first batch reads all, offsets commit, second batch reads delta") {
    val dir = tmpDir("queue-state")
    val state = StateStore(dir, "q")
    val broker = new FakeBroker(Map(0 -> Seq("a", "b"), 1 -> Seq("c")))

    val (df1, off1) = QueueReader.readBatch(spark, broker, "t1", state)
    assert(df1.count() == 3)
    assert(off1 == Map(0 -> 2L, 1 -> 1L))
    QueueReader.commitOffsets(state, "t1", off1)

    val (df2, _) = QueueReader.readBatch(spark, broker, "t1", state)
    assert(df2.count() == 0) // nothing new

    // message ids stable across reads
    val (df3, _) = QueueReader.readBatch(spark, broker, "t1", StateStore(dir, "other"))
    val ids1 = df1.select("_queue_msg_id").as[String].collect().toSet
    val ids3 = df3.select("_queue_msg_id").as[String].collect().toSet
    assert(ids1 == ids3 && ids1.size == 3)
  }

  test("queue reader caps batch at maxPerPartition") {
    val broker = new FakeBroker(Map(0 -> (1 to 10).map(_.toString)))
    val state = StateStore(tmpDir("queue-state2"), "q")
    val (df, off) = QueueReader.readBatch(spark, broker, "t", state, maxPerPartition = 4)
    assert(df.count() == 4)
    assert(off(0) == 4L)
  }

  test("crash before offset commit is idempotent: merge on msg id absorbs the re-read") {
    import graft.core.{Disposition, MergeEngine, TableHints}
    val dir = tmpDir("queue-retry")
    val state = StateStore(dir, "q")
    val broker = new FakeBroker(Map(0 -> Seq("a", "b", "c")))
    val hints = TableHints("msgs", Disposition.Merge, primaryKey = Seq("_queue_msg_id"))

    // run 1: read + load, then CRASH before commitOffsets
    val (batch1, off1) = QueueReader.readBatch(spark, broker, "t", state)
    val table1 = MergeEngine.mergePlan(None, batch1, hints)
    assert(table1.count() == 3)
    // (no commit — offsets in state still empty)

    // run 2 after restart: same messages come back; merge dedups on msg id
    val (batch2, off2) = QueueReader.readBatch(spark, broker, "t", StateStore(dir, "q"))
    assert(batch2.count() == 3) // re-read happened
    val table2 = MergeEngine.mergePlan(Some(table1), batch2, hints)
    assert(table2.count() == 3) // no duplicates
    QueueReader.commitOffsets(state, "t", off2)
    assert(off1 == off2)

    // run 3: offsets committed → empty batch
    val (batch3, _) = QueueReader.readBatch(spark, broker, "t", StateStore(dir, "q"))
    assert(batch3.count() == 0)
  }

  test("shard reader: map-valued cursor advances per shard") {
    val dir = tmpDir("shard-state")
    val state = StateStore(dir, "s")
    val client = new FakeShards(Map("shard-0" -> Seq("a", "b"), "shard-1" -> Seq("c", "d", "e")))

    val (df1, cur1) = ShardReader.readBatch(spark, client, "st", state)
    assert(df1.count() == 5)
    assert(cur1 == Map("shard-0" -> "2", "shard-1" -> "3"))
    ShardReader.commitCursor(state, "st", cur1)

    val (df2, cur2) = ShardReader.readBatch(spark, client, "st", state)
    assert(df2.count() == 0)
    assert(cur2 == cur1) // cursor survives empty batches
  }

  test("shard cursor orders numeric strings by (length, lex)") {
    val client = new FakeShards(Map("s" -> (1 to 12).map(i => s"v$i")))
    val state = StateStore(tmpDir("shard-state2"), "s")
    val (_, cur) = ShardReader.readBatch(spark, client, "st", state)
    assert(cur("s") == "12") // not "9" (lexicographic max)
  }
}
