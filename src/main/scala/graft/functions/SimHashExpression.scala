package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native 64-bit SimHash over a string array: one pass, 64 int counters
  * per row. Produces BIT-IDENTICAL fingerprints to `Dedup.simhash` (same
  * xxhash64 seed 42, same bit rule `sign(Σ ±1) > 0`), but the HOF form
  * allocates a 64-element array per WORD (zip_with inside aggregate) —
  * this expression allocates one counter array per ROW and stays in
  * whole-stage codegen. The difference is the per-row cost that matters
  * when fingerprinting billions of documents.
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.freshName("counters")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counters = new int[64];
         |final int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
         |      $arr.getUTF8String($i), org.apache.spark.sql.types.DataTypes.StringType, 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counters[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
         |""".stripMargin
    })
  }
}

object SimHash64 {
  def simhash64(wordsCol: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.ColumnBridge.expression(wordsCol)))
}
