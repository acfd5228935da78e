package graft.connectors.streams

/** Reference in-memory QueueClient: fixed message payloads per partition,
  * offsets = list positions. Used by specs and the driver-verified
  * end-to-end queries; doubles as the template for a real broker client.
  */
final case class InMemoryBroker(messages: Map[Int, Seq[String]], baseTsMs: Long = 1700000000000L)
    extends QueueClient {
  override def partitions(topic: String): Seq[Int] = messages.keys.toSeq.sorted
  override def endOffsets(topic: String): Map[Int, Long] =
    messages.map { case (p, m) => p -> m.size.toLong }
  override def fetch(topic: String, partition: Int, fromOffset: Long, untilOffset: Long, max: Int): Seq[QueueMessage] =
    messages(partition).zipWithIndex
      .slice(fromOffset.toInt, untilOffset.toInt)
      .take(max)
      .map { case (v, i) =>
        QueueMessage(partition, i.toLong, s"$partition-$i", v.getBytes("UTF-8"), baseTsMs + i)
      }
}
