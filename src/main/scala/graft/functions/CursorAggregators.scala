package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregators for cursor maintenance — the custom `last_value_func`
  * surface (SURVEY §2.10): the reference's Kinesis reducer keeps a dict of
  * shard → max sequence (sources/kinesis/helpers.py:46-63). The grouped
  * `max_by` path covers most cases; this Aggregator computes the WHOLE map
  * in one pass (partial maps merged associatively), which matters when the
  * group count is large enough that a collect of grouped rows hurts.
  */
object CursorAggregators {

  /** Opaque sequence-number ordering: numeric strings of any width order
    * correctly ((length, lexicographic) — same rule as ShardReader).
    */
  def seqGreater(a: String, b: String): Boolean =
    a.length > b.length || (a.length == b.length && a > b)

  /** (shard, seq) rows → Map(shard → max seq), mergeable map-side. */
  val maxSeqPerShard: Aggregator[(String, String), Map[String, String], Map[String, String]] =
    new Aggregator[(String, String), Map[String, String], Map[String, String]] {
      override def zero: Map[String, String] = Map.empty
      override def reduce(acc: Map[String, String], row: (String, String)): Map[String, String] = {
        val (shard, seq) = row
        acc.get(shard) match {
          case Some(cur) if !seqGreater(seq, cur) => acc
          case _                                  => acc + (shard -> seq)
        }
      }
      override def merge(a: Map[String, String], b: Map[String, String]): Map[String, String] =
        b.foldLeft(a) { case (acc, (shard, seq)) =>
          acc.get(shard) match {
            case Some(cur) if !seqGreater(seq, cur) => acc
            case _                                  => acc + (shard -> seq)
          }
        }
      override def finish(acc: Map[String, String]): Map[String, String] = acc
      override def bufferEncoder: Encoder[Map[String, String]] = Encoders.kryo
      override def outputEncoder: Encoder[Map[String, String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  def maxSeqPerShardColumn: TypedColumn[(String, String), Map[String, String]] =
    maxSeqPerShard.toColumn
}
