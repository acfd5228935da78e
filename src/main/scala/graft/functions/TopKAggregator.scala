package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Native bounded top-k aggregate: the k best (score, id) pairs under
  * (score desc, id asc), kept in a k-BOUNDED buffer at every stage of the
  * aggregation. This is what makes ANN top-k reductions truly map-side
  * bounded: a `collect_list`-based partial aggregation accumulates every
  * candidate row into its buffers and ships them all through the shuffle
  * (the slice only applies after the merge); this aggregate's partial
  * buffers never exceed k entries, so the shuffle carries
  * O(k × mapTasks × queries) bytes instead of O(candidates) — at corpus
  * scale the difference between a bounded exchange and shuffling the
  * whole scored set.
  *
  * Ordering parity with `row_number().over(orderBy(score.desc, id))`:
  * -0.0 is normalized to 0.0 before comparison (Spark sorts them equal;
  * raw `Double.compare` would not) and NaN sorts greatest = best, same
  * as Spark's descending sort. Null scores are skipped. Merging bounded
  * buffers is associative and commutative because (score, id) pairs are
  * unique per group, so the result is independent of partition order.
  *
  * Result: array<struct<s: double, i: bigint>> sorted best-first —
  * `posexplode` turns the position directly into the rank, eliminating
  * the rank window entirely.
  */
final case class BoundedTopK(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[BoundedTopK.Buffer] with ImplicitCastInputTypes {

  require(k > 0 && k <= (1 << 20), "1 <= k <= 2^20")

  // Declared input types make the analyzer insert implicit casts (INT score
  // or id in a SQL graft_top_k call) or reject the call at analysis time,
  // instead of update()'s casts dying executor-side mid-job.
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.ColumnBridge.AbstractType] =
    Seq(DoubleType, LongType)

  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(score = newChildren(0), id = newChildren(1))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("s", DoubleType), StructField("i", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"

  override def createAggregationBuffer(): BoundedTopK.Buffer = new BoundedTopK.Buffer(k)

  override def update(buf: BoundedTopK.Buffer, input: InternalRow): BoundedTopK.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BoundedTopK.Buffer, other: BoundedTopK.Buffer): BoundedTopK.Buffer = {
    other.foreach((s, i) => buf.offer(s, i))
    buf
  }

  override def eval(buf: BoundedTopK.Buffer): Any =
    new GenericArrayData(buf.sortedBestFirst.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: BoundedTopK.Buffer): Array[Byte] = {
    val entries = buf.entries
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BoundedTopK.Buffer(k)
    var j = 0
    while (j < n) { buf.offer(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
}

object BoundedTopK {

  /** -0.0 → 0.0 so comparison matches Spark sort semantics (which treat
    * them equal); NaN passes through and compares greatest = best.
    */
  @inline private def norm(x: Double): Double = if (x == 0.0) 0.0 else x

  /** True iff (sa, ia) ranks strictly better than (sb, ib) under
    * (score desc, id asc).
    */
  @inline private def better(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(norm(sa), norm(sb))
    if (c != 0) c > 0 else ia < ib
  }

  /** k-bounded buffer: a binary min-heap keyed by "badness" — the root is
    * the WORST kept entry, so an incoming candidate either replaces the
    * root (if better) or is dropped in O(1)/O(log k). Never exceeds k
    * entries at any point of update/merge — the boundedness the shuffle
    * relies on.
    */
  final class Buffer(k: Int) {
    // grow-on-demand up to k: an aggregation hash map holds one buffer
    // PER GROUP, and most groups see far fewer than k rows — eager
    // Array(k) would cost groups x k x 16 B regardless of data
    private var scores = new Array[Double](math.min(k, 16))
    private var ids = new Array[Long](math.min(k, 16))
    private var n = 0

    @inline private def ensure(cap: Int): Unit =
      if (cap > scores.length) {
        val next = math.min(k, math.max(cap, scores.length * 2))
        scores = java.util.Arrays.copyOf(scores, next)
        ids = java.util.Arrays.copyOf(ids, next)
      }

    // heap order: parent is WORSE than children (min-heap on quality)
    @inline private def worse(a: Int, b: Int): Boolean =
      !better(scores(a), ids(a), scores(b), ids(b))

    def offer(s: Double, i: Long): Unit = {
      if (n < k) {
        ensure(n + 1)
        scores(n) = s; ids(n) = i; n += 1
        var c = n - 1
        while (c > 0 && worse(c, (c - 1) / 2)) { swap(c, (c - 1) / 2); c = (c - 1) / 2 }
      } else if (better(s, i, scores(0), ids(0))) {
        scores(0) = s; ids(0) = i
        var p = 0
        var done = false
        while (!done) {
          val l = 2 * p + 1; val r = l + 1
          var worst = p
          if (l < n && worse(l, worst)) worst = l
          if (r < n && worse(r, worst)) worst = r
          if (worst == p) done = true else { swap(p, worst); p = worst }
        }
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    def entries: Array[(Double, Long)] = Array.tabulate(n)(j => (scores(j), ids(j)))

    def sortedBestFirst: Array[(Double, Long)] =
      entries.sortWith { case ((sa, ia), (sb, ib)) => better(sa, ia, sb, ib) }
  }

  /** Column API: array of the k best (s, i) structs per group, best first. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      BoundedTopK(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
  }
}
