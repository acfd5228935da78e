package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-key selection of the k lexicographically-smallest strings —
  * the string-keyed cousin of [[BoundedTopK]] (which holds (score, id)
  * doubles/longs). Built for the URL frontier's per-host politeness cap:
  * selecting "at most k URLs per host per wave" must never materialize a
  * host's full URL list, so the aggregation buffer holds at most k strings
  * and partial buffers merge associatively — map-side combine bounds the
  * shuffle to k rows per host per map partition regardless of how many
  * candidate URLs a hot host has (the behavior class is the reference's
  * per-connector rate discipline, sources/chess/helpers.py retry/backoff).
  *
  * Selection is DETERMINISTIC (smallest k in string order), which is what
  * makes a politeness wave oracle-replayable: rank-within-host in plain
  * SQL reproduces exactly which URLs each wave fetches.
  */
object MinK {

  /** Sorted-ascending buffer of at most k elements. */
  def minKAgg(k: Int): Aggregator[String, Vector[String], Seq[String]] = {
    require(k > 0, s"minK requires k > 0, got $k")
    new Aggregator[String, Vector[String], Seq[String]] {
      private def insert(b: Vector[String], s: String): Vector[String] = {
        if (b.length >= k && s >= b.last) b
        else {
          val i = b.indexWhere(_ > s) match { case -1 => b.length; case x => x }
          val w = b.patch(i, Seq(s), 0)
          if (w.length > k) w.dropRight(1) else w
        }
      }
      override def zero: Vector[String] = Vector.empty
      override def reduce(b: Vector[String], s: String): Vector[String] = insert(b, s)
      override def merge(a: Vector[String], b: Vector[String]): Vector[String] =
        b.foldLeft(a)(insert)
      override def finish(b: Vector[String]): Seq[String] = b
      override def bufferEncoder: Encoder[Vector[String]] = Encoders.kryo
      override def outputEncoder: Encoder[Seq[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
  }

  def minK(k: Int): TypedColumn[String, Seq[String]] = minKAgg(k).toColumn
}
