package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst vector kernels for the ANN/dedup similarity paths.
  *
  * The previous kernels composed `zip_with` + `aggregate`: correct, but
  * both are `CodegenFallback` higher-order functions, so every candidate
  * pair paid an interpreted per-element lambda eval plus an allocated
  * intermediate product array. Profiling the sf10 IVF probe showed 32/32
  * executor threads inside `ZipWith.eval`/`ArrayAggregate.eval` — at
  * ~6x10^8 candidate pairs the interpreter, not the arithmetic, was the
  * bottleneck. These expressions run the same folds as a tight generated
  * loop inside whole-stage codegen, and `CosineSimilarity` computes the
  * dot product and both norms in ONE traversal instead of three.
  *
  * Null/shape semantics replicate the `zip_with`+`aggregate` composition
  * bit-for-bit (the DuckDB oracles hash scores, not just ranks):
  *   - either array NULL, a length mismatch (zip_with pads with null),
  *     or any NULL element => NULL result;
  *   - accumulation is the same left-to-right IEEE double fold;
  *   - cosine divides by `sqrt(dot(a,a)) * sqrt(dot(b,b))` in exactly
  *     that association (NOT `sqrt(na*nb)`), preserving every ULP of the
  *     previous formula.
  *
  * ONE deliberate divergence: a zero-norm input. The `/` operator under
  * Spark 4's default ANSI mode raises DIVIDE_BY_ZERO, so the HOF cosine
  * turned a single degenerate vector into a job abort — unacceptable at
  * corpus scale. This kernel returns NULL for a zero-norm side instead
  * (NOT NaN: Spark orders NaN above every double, so NaN would WIN
  * descending top-k slots): NULL sorts last under `ORDER BY score DESC`,
  * fails every `>= threshold` gate, and is skipped by aggregates, so
  * degenerate vectors drop out quietly. No contract query ever produced
  * a zero-norm vector, so no oracle hash moves.
  */
private[functions] trait VectorPairExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null can arise from a length mismatch or null element even when both
  // child arrays are non-null
  override def nullable: Boolean = true

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def isSupported(t: DataType): Boolean = t match {
    case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
    case _: DecimalType => true // converted via Decimal.toDouble, like the
                                // zip_with+aggregate composition's implicit
                                // numeric cast did
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if isSupported(l) && isSupported(r) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two arrays of numeric elements, " +
          s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  protected def getD(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType  => arr.getDouble(i)
    case FloatType   => arr.getFloat(i).toDouble
    case LongType    => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case ShortType   => arr.getShort(i).toDouble
    case ByteType    => arr.getByte(i).toDouble
    case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  /** Java source for "element value as double": primitive cast for the
    * primitive types, `Decimal.toDouble()` for decimals.
    */
  protected def toDoubleJava(code: String, t: DataType): String = t match {
    case _: DecimalType => s"($code).toDouble()"
    case _              => s"(double)($code)"
  }
}

/** `sum_i a(i) * b(i)` as one generated loop; see trait scaladoc for the
  * exact null/shape contract.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += getD(x, i, lt) * getD(y, i, rt)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val la = toDoubleJava(CodeGenerator.getValue(a, elemType(left), i), elemType(left))
      val rb = toDoubleJava(CodeGenerator.getValue(b, elemType(right), i), elemType(right))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $la * $rb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
         |""".stripMargin
    })
}

/** `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` with all three folds in
  * a single traversal; see trait scaladoc for the exact null/shape and
  * IEEE-association contract.
  */
final case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorPairExpression {

  override def prettyName: String = "vec_cosine"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var d = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = getD(x, i, lt)
      val yv = getD(y, i, rt)
      d += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else d / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val la = toDoubleJava(CodeGenerator.getValue(a, elemType(left), i), elemType(left))
      val rb = toDoubleJava(CodeGenerator.getValue(b, elemType(right), i), elemType(right))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xv = $la;
         |    final double $yv = $rb;
         |    $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  if (!${ev.isNull}) {
         |    if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |    else { ${ev.value} = $d / (Math.sqrt($na) * Math.sqrt($nb)); }
         |  }
         |}
         |""".stripMargin
    })
}

object VectorExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: codegen dot product of two numeric-array columns. */
  def vecDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API: codegen one-pass cosine similarity. */
  def vecCosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))
}
