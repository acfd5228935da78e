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

/** Fused PQ encoder: per subspace `j`, the codebook centroid id with the
  * largest inner product against the vector's `j`-th sub-slice (ties to
  * the LARGER id — `java.lang.Double.compare` ordering, so NaN outranks
  * every finite sim, both matching the `greatest(struct(sim, cid))`
  * composition this replaces). Output: array<int> of length `m`.
  *
  * Why fused: the composed form was m*kSub separate `slice`+`dot`
  * subtrees (128 at the shipped m=8/kSub=16) — as CodegenFallback HOFs
  * that was 128 interpreted evals per row, and naively swapping in the
  * codegen `vec_dot` kernel made it 128 GENERATED loops plus 128
  * generated slice copies in one projection, whose bytecode blows past
  * the JIT method limits — measured 3.4x SLOWER than the interpreted
  * HOFs at sf10 (8.5 s -> 29.6 s q_ann_ivfpq). This expression is one
  * small triple loop over a flattened codebook reference array: no
  * slices, no intermediate arrays, one JIT-friendly method.
  *
  * Null/shape contract: NULL input, a vector whose length differs from
  * m*subDim, or any NULL element => NULL result (the composed form
  * produced per-subspace null sims in those cases, feeding `greatest`
  * null-struct edge semantics nothing downstream consumed; this kernel
  * is uniformly conservative instead). Element types: double/float.
  */
final case class PqEncode(child: Expression, codebooks: Array[Double],
    m: Int, kSub: Int, subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(codebooks.length == m * kSub * subDim,
    s"codebooks length ${codebooks.length} != m*kSub*subDim = ${m * kSub * subDim}")

  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<double|float>, got ${other.catalogString}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() != m * subDim) return null
    val isFloat = elemType == FloatType
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestSim = Double.NegativeInfinity
      var best = -1
      var c = 0
      while (c < kSub) {
        var s = 0.0
        val base = j * subDim
        val cb = (j * kSub + c) * subDim
        var i = 0
        while (i < subDim) {
          if (arr.isNullAt(base + i)) return null
          val x = if (isFloat) arr.getFloat(base + i).toDouble else arr.getDouble(base + i)
          s += x * codebooks(cb + i)
          i += 1
        }
        if (java.lang.Double.compare(s, bestSim) >= 0) { bestSim = s; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cbs = ctx.addReferenceObj("pqCodebooks", codebooks, "double[]")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val bestSim = ctx.freshName("bestSim")
      val best = ctx.freshName("best")
      val base = ctx.freshName("base")
      val cb = ctx.freshName("cb")
      val x = CodeGenerator.getValue(a, elemType, s"$base + $i")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$m];
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $m && !$bad; $j++) {
         |    double $bestSim = Double.NEGATIVE_INFINITY;
         |    int $best = -1;
         |    for (int $c = 0; $c < $kSub && !$bad; $c++) {
         |      double $s = 0.0;
         |      final int $base = $j * $subDim;
         |      final int $cb = ($j * $kSub + $c) * $subDim;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        if ($a.isNullAt($base + $i)) { $bad = true; break; }
         |        $s += (double)($x) * $cbs[$cb + $i];
         |      }
         |      if (!$bad && java.lang.Double.compare($s, $bestSim) >= 0) {
         |        $bestSim = $s; $best = $c;
         |      }
         |    }
         |    if (!$bad) { $out[$j] = $best; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} =
         |      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
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

  /** Column API: fused PQ encode — `codebooks` as (subspace, centroidId,
    * subvector) triples, the [[graft.ops.Similarity.pqCodebooks]] shape.
    */
  def pqEncode(vec: Column, codebooks: Seq[(Int, Int, Array[Double])]): Column = {
    val subDim = codebooks.head._3.length
    val m = codebooks.map(_._1).max + 1
    val kSub = codebooks.count(_._1 == 0)
    val flat = new Array[Double](m * kSub * subDim)
    codebooks.foreach { case (j, c, v) =>
      System.arraycopy(v, 0, flat, (j * kSub + c) * subDim, subDim)
    }
    column(PqEncode(expression(vec), flat, m, kSub, subDim))
  }
}
