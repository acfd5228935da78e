package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression computing a k-wide MinHash signature over a
  * string array in ONE pass: each element is xxhash64'd once, then k
  * signature lanes derive via splitmix64 remixing — no per-permutation
  * re-traversal, no md5 hex strings, no UDF boxing. Stays inside
  * whole-stage codegen via `doGenCode`.
  *
  * This is the performance-grade variant of `Dedup.minhash` (the md5 form
  * is kept for oracle parity — DuckDB can replicate md5, not xxhash64).
  * At 100 TB the difference is k array traversals + k string md5s per row
  * versus one traversal + k long mixes.
  */
final case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  require(k > 0 && k <= 512, "1 <= k <= 512")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        val h = XxHash64Function.hash(w, StringType, 42L)
        var lane = 0
        var z = h
        while (lane < k) {
          // splitmix64 stream seeded by the word hash: lane j value = mix_j(h)
          z += 0x9e3779b97f4a7c15L
          var m = z
          m = (m ^ (m >>> 30)) * 0xbf58476d1ce4e5b9L
          m = (m ^ (m >>> 27)) * 0x94d049bb133111ebL
          m = m ^ (m >>> 31)
          if (m < mins(lane)) mins(lane) = m
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val lane = ctx.freshName("lane")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      val m = ctx.freshName("m")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    UTF8String $w = $arr.getUTF8String($i);
         |    final long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
         |      $w, org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |    long $z = $h;
         |    for (int $lane = 0; $lane < $k; $lane++) {
         |      $z += 0x9e3779b97f4a7c15L;
         |      long $m = $z;
         |      $m = ($m ^ ($m >>> 30)) * 0xbf58476d1ce4e5b9L;
         |      $m = ($m ^ ($m >>> 27)) * 0x94d049bb133111ebL;
         |      $m = $m ^ ($m >>> 31);
         |      if ($m < $mins[$lane]) $mins[$lane] = $m;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |""".stripMargin
    })
  }
}

object MinHashSignature {
  /** Column API: k-lane minhash signature of a string-array column. */
  def minhashSignature(wordsCol: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSignature(org.apache.spark.sql.graftbridge.ColumnBridge.expression(wordsCol), k))
}
