package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The codegen vector kernels must be BIT-identical to the zip_with +
  * aggregate compositions they replaced — oracle hashes cover scores,
  * not just ranks, so even one ULP of drift is a correctness break.
  */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  // the previous interpreted formulation, kept here as the parity oracle
  private def hofDot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v,
    )
  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

  private def bits(d: java.lang.Double): java.lang.Long =
    if (d == null) null else java.lang.Double.doubleToRawLongBits(d)

  test("dot and cosine are bit-identical to the HOF composition on doubles") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(48)
      (i.toLong,
        Seq.fill(n)(rnd.nextGaussian()),
        Seq.fill(n)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      VectorExpressions.vecDot($"a", $"b").as("d"),
      VectorExpressions.vecCosine($"a", $"b").as("c"),
      hofDot($"a", $"b").as("hd"),
      hofCosine($"a", $"b").as("hc"),
    ).collect()
    got.foreach { r =>
      assert(bits(r.getAs[java.lang.Double]("d")) == bits(r.getAs[java.lang.Double]("hd")))
      assert(bits(r.getAs[java.lang.Double]("c")) == bits(r.getAs[java.lang.Double]("hc")))
    }
  }

  test("float arrays match the HOF cast-to-double path bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 100).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextFloat()), Seq.fill(16)(rnd.nextFloat()))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select(
      VectorExpressions.vecCosine($"a", $"b").as("c"),
      hofCosine($"a", $"b").as("hc"),
    ).collect()
    got.foreach(r =>
      assert(bits(r.getAs[java.lang.Double]("c")) == bits(r.getAs[java.lang.Double]("hc"))))
  }

  test("decimal arrays are accepted and match the HOF cast-to-double path") {
    // the replaced zip_with+aggregate composition accepted any castable
    // numeric element (including decimal); the kernels must not narrow
    // the public Similarity.dot/cosine surface
    val df = spark.sql(
      """SELECT array(CAST(1.25 AS DECIMAL(10,4)), CAST(-2.5 AS DECIMAL(10,4))) AS a,
        |       array(CAST(3.75 AS DECIMAL(10,4)), CAST(0.5  AS DECIMAL(10,4))) AS b""".stripMargin)
    val got = df.select(
      VectorExpressions.vecDot($"a", $"b").as("d"),
      VectorExpressions.vecCosine($"a", $"b").as("c"),
      hofDot($"a", $"b").as("hd"),
      hofCosine($"a", $"b").as("hc"),
    ).head()
    assert(bits(got.getAs[java.lang.Double]("d")) == bits(got.getAs[java.lang.Double]("hd")))
    assert(bits(got.getAs[java.lang.Double]("c")) == bits(got.getAs[java.lang.Double]("hc")))
    assert(got.getAs[java.lang.Double]("d") == 1.25 * 3.75 + (-2.5) * 0.5)
  }

  test("zero-norm and empty vectors yield NULL cosine, not an ANSI abort and not NaN") {
    // the HOF form raised DIVIDE_BY_ZERO here under ANSI mode (job
    // abort); NaN would WIN descending top-k (Spark orders NaN above
    // every double) — NULL is the only value that drops out quietly
    val df = Seq(
      (1L, Seq(0.0, 0.0), Seq(1.0, -1.0)),
      (2L, Seq.empty[Double], Seq.empty[Double]),
      (3L, Seq(1.0, 2.0), Seq(0.0, 0.0)),
    ).toDF("id", "a", "b")
    val got = df.select($"id", VectorExpressions.vecCosine($"a", $"b").as("c")).collect()
    got.foreach(r => assert(r.isNullAt(1), s"id=${r.getLong(0)} gave ${r.get(1)}"))
    // dot itself stays total: 0.0, not null
    val d = df.filter($"id" === 1L)
      .select(VectorExpressions.vecDot($"a", $"b")).head.getDouble(0)
    assert(d == 0.0)
  }

  test("null array, null element, and length mismatch all yield NULL (as zip_with did)") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = Seq(
      org.apache.spark.sql.Row(null, Seq(1.0, 2.0)),
      org.apache.spark.sql.Row(Seq(1.0, null), Seq(1.0, 2.0)),
      org.apache.spark.sql.Row(Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)),
    )
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val got = df.select(
      VectorExpressions.vecDot($"a", $"b").as("d"),
      VectorExpressions.vecCosine($"a", $"b").as("c"),
      hofDot($"a", $"b").as("hd"),
      hofCosine($"a", $"b").as("hc"),
    ).collect()
    got.foreach { r =>
      assert(r.isNullAt(0) && r.isNullAt(1), s"native not null: $r")
      assert(r.isNullAt(2) && r.isNullAt(3), s"hof oracle changed: $r")
    }
  }

  test("generated code path (GenerateUnsafeProjection, no fallback) agrees with eval") {
    val at = ArrayType(DoubleType, containsNull = true)
    val dot = DotProduct(BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))
    val cos = CosineSimilarity(BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))
    // throws if doGenCode emits uncompilable Java — no interpreted fallback here
    val proj = GenerateUnsafeProjection.generate(Seq(dot, cos))
    val rnd = new scala.util.Random(43)
    (0 until 50).foreach { _ =>
      val n = 1 + rnd.nextInt(20)
      val a = new GenericArrayData(Array.fill(n)(rnd.nextGaussian()))
      val b = new GenericArrayData(Array.fill(n)(rnd.nextGaussian()))
      val row = InternalRow(a, b)
      val out = proj(row)
      assert(bits(out.getDouble(0)) == bits(dot.eval(row).asInstanceOf[Double]))
      assert(bits(out.getDouble(1)) == bits(cos.eval(row).asInstanceOf[Double]))
    }
    // mismatch + null element through the generated path
    val out1 = proj(InternalRow(new GenericArrayData(Array(1.0)), new GenericArrayData(Array(1.0, 2.0))))
    assert(out1.isNullAt(0) && out1.isNullAt(1))
    val withNull = new GenericArrayData(Array[Any](1.0, null))
    val out2 = proj(InternalRow(withNull, new GenericArrayData(Array(1.0, 2.0))))
    assert(out2.isNullAt(0) && out2.isNullAt(1))
  }

  test("decimal element type compiles through codegen and agrees with eval") {
    import org.apache.spark.sql.types.Decimal
    val at = ArrayType(DecimalType(10, 4), containsNull = true)
    val dot = DotProduct(BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))
    val cos = CosineSimilarity(BoundReference(0, at, nullable = true), BoundReference(1, at, nullable = true))
    val proj = GenerateUnsafeProjection.generate(Seq(dot, cos))
    def dec(s: String) = Decimal(new java.math.BigDecimal(s), 10, 4)
    val a = new GenericArrayData(Array[Any](dec("1.2500"), dec("-2.5000")))
    val b = new GenericArrayData(Array[Any](dec("3.7500"), dec("0.5000")))
    val row = InternalRow(a, b)
    val out = proj(row)
    assert(bits(out.getDouble(0)) == bits(dot.eval(row).asInstanceOf[Double]))
    assert(bits(out.getDouble(1)) == bits(cos.eval(row).asInstanceOf[Double]))
    assert(out.getDouble(0) == 1.25 * 3.75 + (-2.5) * 0.5)
  }

  test("pre-normed pair cosine (dot / (normOf*normOf)) is bit-identical to vec_cosine") {
    // the pair-scoring sites split the cosine into per-vector norms +
    // per-pair dot (O(n*d) norms instead of O(pairs*d) folds); every ULP
    // must survive the split, including the zero-norm->NULL and
    // null-element->NULL edges
    import graft.ops.Similarity
    val rnd = new scala.util.Random(47)
    val rows = (0 until 200).map { i =>
      val v: Seq[java.lang.Double] =
        if (i == 0) Seq.fill(8)(java.lang.Double.valueOf(0.0))           // zero norm
        else if (i == 1) Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
        else Seq.fill(8)(java.lang.Double.valueOf(rnd.nextGaussian()))
      (i.toLong, v, Seq.fill(8)(java.lang.Double.valueOf(rnd.nextGaussian())))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
      VectorExpressions.vecCosine($"a", $"b").as("kernel"),
      (VectorExpressions.vecDot($"a", $"b") /
        (Similarity.normOf($"a") * Similarity.normOf($"b"))).as("split"))
      .collect()
    got.foreach { r =>
      assert(bits(r.getAs[java.lang.Double]("kernel")) == bits(r.getAs[java.lang.Double]("split")),
        s"id ${r.getLong(0)}")
    }
  }

  // ------------------------------------------------------------ pq_encode

  /** The composed form pq_encode replaces — m*kSub slice+dot trees into
    * greatest(struct(sim, cid)) — kept as the parity oracle.
    */
  private def composedPqEncode(vec: Column, codebooks: Seq[(Int, Int, Array[Double])]): Column = {
    val subDim = codebooks.head._3.length
    val m = codebooks.map(_._1).max + 1
    val codes = (0 until m).map { j =>
      val sub = slice(vec, j * subDim + 1, subDim)
      val scored = codebooks.filter(_._1 == j).map { case (_, cid, cv) =>
        struct(VectorExpressions.vecDot(sub, typedlit(cv.toSeq)).as("sim"), lit(cid).as("cid"))
      }
      greatest(scored: _*).getField("cid")
    }
    array(codes: _*)
  }

  test("pq_encode codes equal the composed slice+dot+greatest form on random vectors") {
    val cbs = graft.ops.Similarity.pqCodebooks(dim = 16, m = 4, kSub = 8)
    val rnd = new scala.util.Random(43)
    val df = (0 until 300).map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian())))
      .toDF("id", "v")
    val got = df.select($"id",
      VectorExpressions.pqEncode($"v", cbs).as("fused"),
      composedPqEncode($"v", cbs).as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2), s"id ${r.getLong(0)}")
    }
  }

  test("pq_encode ties break to the larger centroid id, like greatest(struct)") {
    // a zero vector dots to 0.0 against EVERY codebook entry: all ties
    val cbs = graft.ops.Similarity.pqCodebooks(dim = 8, m = 2, kSub = 4)
    val df = Seq((1L, Seq.fill(8)(0.0))).toDF("id", "v")
    val r = df.select(VectorExpressions.pqEncode($"v", cbs).as("c"),
      composedPqEncode($"v", cbs).as("e")).head()
    assert(r.getSeq[Int](0) == Seq(3, 3))
    assert(r.getSeq[Int](0) == r.getSeq[Int](1))
  }

  test("pq_encode: null input, null element, and wrong length all yield NULL") {
    val cbs = graft.ops.Similarity.pqCodebooks(dim = 8, m = 2, kSub = 4)
    val df = Seq(
      (1L, Option.empty[Seq[java.lang.Double]]),
      (2L, Some(Seq[java.lang.Double](1.0, null, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))),
      (3L, Some(Seq[java.lang.Double](1.0, 2.0, 3.0))),
    ).toDF("id", "v")
    val out = df.select($"id", VectorExpressions.pqEncode($"v", cbs).as("c"))
      .orderBy("id").collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("pq_encode codegen agrees with eval") {
    val cbs = graft.ops.Similarity.pqCodebooks(dim = 8, m = 2, kSub = 4)
    val subDim = cbs.head._3.length
    val flat = new Array[Double](2 * 4 * subDim)
    cbs.foreach { case (j, c, v) => System.arraycopy(v, 0, flat, (j * 4 + c) * subDim, subDim) }
    val at = ArrayType(DoubleType, containsNull = true)
    val e = PqEncode(BoundReference(0, at, nullable = true), flat, 2, 4, 4)
    val proj = GenerateUnsafeProjection.generate(Seq(e))
    val rnd = new scala.util.Random(7)
    (0 until 50).foreach { _ =>
      val v = new GenericArrayData(Array.fill[Any](8)(rnd.nextGaussian()))
      val row = InternalRow(v)
      val fromGen = proj(row).getArray(0).toIntArray().toSeq
      val fromEval = e.eval(row).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray().toSeq
      assert(fromGen == fromEval)
    }
    // null element through codegen too
    val withNull = new GenericArrayData(Array[Any](1.0, null, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0))
    assert(proj(InternalRow(withNull)).isNullAt(0))
  }
}
