package graft.core

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Z-order layout: hand-checked interleave, quantization edges, and the
  * layout guarantee — per-file z ranges disjoint, row groups sorted.
  */
class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleave round-robins bits: (x=0b11, y=0b01) at 2 bits -> 0b0111") {
    val got = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.interleave(Seq(col("x"), col("y")), bits = 2).as("z"))
      .as[Long].head()
    // bit layout: pos0 = x0=1, pos1 = y0=1, pos2 = x1=1, pos3 = y1=0
    assert(got == 7L)
  }

  test("quantize maps [lo,hi] onto [0, 2^bits-1] with exact endpoints; constant column -> 0") {
    val df = Seq(0L, 50L, 100L).toDF("v")
    val q = df.select(ZOrder.quantize(col("v"), 0L, 100L, 8).as("q")).as[Long].collect().toSeq
    assert(q == Seq(0L, 127L, 255L))
    assert(df.select(ZOrder.quantize(col("v"), 5L, 5L, 8)).as[Long].collect().forall(_ == 0L))
  }

  test("quantize survives ranges past 2^47 without Long wrap (pre-shift engages)") {
    val lo = 0L; val hi = Long.MaxValue / 2
    val df = Seq(lo, hi / 2, hi).toDF("v")
    val q = df.select(ZOrder.quantize(col("v"), lo, hi, 16).as("q")).as[Long].collect().toSeq
    assert(q.forall(x => x >= 0L && x <= 65535L), s"wrapped: $q")
    assert(q == q.sorted && q.head == 0L && q.last == 65535L && q(1) >= 32700L && q(1) <= 32800L)
  }

  test("quantize survives a full-width signed domain (hi - lo wraps a Long)") {
    // lo < 0 < hi spanning more than Long.MaxValue: hi - lo itself wraps
    val lo = Long.MinValue + 1; val hi = Long.MaxValue
    val df = Seq(lo, -1L, 0L, hi / 2, hi).toDF("v")
    val q = df.select(ZOrder.quantize(col("v"), lo, hi, 16).as("q")).as[Long].collect().toSeq
    assert(q.forall(x => x >= 0L && x <= 65535L), s"wrapped: $q")
    assert(q == q.sorted && q.head == 0L && q.last == 65535L)
    // midpoints land mid-range, not clamped garbage
    assert(q(1) >= 32500L && q(1) <= 33000L, s"mid=$q")
  }

  test("z-curve locality: close points share high bits, far points do not") {
    val df = Seq((10L, 10L), (11L, 11L), (1000L, 1000L)).toDF("a", "b")
    val z = ZOrder.withZValue(df, Seq("a", "b"), bits = 10)
      .orderBy("a").select("z_value").as[Long].collect()
    assert(math.abs(z(0) - z(1)) < math.abs(z(0) - z(2)))
  }

  test("writeZOrdered produces disjoint per-file z ranges, sorted within files") {
    val dir = tmpDir("graft_zorder")
    val df = spark.range(2000).select(
      (col("id") * 37 % 1000).as("a"), (col("id") * 91 % 1000).as("b"))
    ZOrder.writeZOrdered(df, Seq("a", "b"), s"$dir/t", bits = 12, numFiles = 8)
    val ranges = spark.read.parquet(s"$dir/t")
      .groupBy(input_file_name().as("f"))
      .agg(min("z_value").as("lo"), max("z_value").as("hi"))
      .orderBy("lo")
      .select("lo", "hi").as[(Long, Long)].collect()
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2) }
  }
}
