package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: quantize N integer columns to a
  * shared bit width, interleave their bits into one BIGINT z-value, and
  * range-partition + sort the table by it — so files (and parquet row
  * groups) become tight boxes in EVERY indexed dimension at once, and a
  * predicate on ANY of the columns prunes most of the scan. This is the
  * multi-column companion to the hash-bucketed layout in
  * [[BucketedMerge]]: bucketing co-locates equi-join keys; z-ordering
  * co-locates range predicates. Reference analog: the sources' loaders
  * delegate layout to the destination (e.g. clustered warehouse tables,
  * `sources/sql_database`); an engine that owns its parquet tables has
  * to provide the layout pass itself.
  *
  * Everything is integer arithmetic — min/max scaling by integral
  * division, bit interleave by shift-and-or folds that stay inside
  * whole-stage codegen — so z-values replay bit-for-bit in a SQL
  * oracle. The min/max frame is a 2N-number driver reduction, not a
  * per-row collect.
  */
object ZOrder {

  /** floor((v - lo) * (2^bits - 1) / (hi - lo)), clamped into range and
    * 0 on a constant column (hi == lo). Null maps to 0 (sorts first,
    * like NULLS FIRST).
    */
  def quantize(v: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "need 1 <= bits <= 31")
    if (hi <= lo) lit(0L)
    else {
      val mask = (1L << bits) - 1
      // (v - lo) * mask must not wrap: Long overflow here is SILENT in
      // Spark and produces garbage z-values (a broken layout with no
      // error), while the SQL oracle would throw. Pre-shift the domain
      // deterministically instead: dropping `shift` low bits before
      // scaling changes nothing — the quantizer keeps only the top
      // `bits` bits of the range anyway (shift only engages past a
      // ~2^47 range, e.g. snowflake ids or epoch-nanos). The range and
      // shift are computed in BigInt so neither `hi - lo` (which wraps
      // for signed domains spanning more than Long.MaxValue) nor the
      // `+ 1` guard (which wraps at range == Long.MaxValue) can
      // overflow on the driver.
      val bigRange = BigInt(hi) - BigInt(lo)
      var shift = 0
      while ((bigRange >> shift) + 1 > BigInt(Long.MaxValue / (mask + 1))) shift += 1
      val (vShifted, denom) =
        if (bigRange.isValidLong) {
          // v - lo itself fits a Long: shift after subtracting, which is
          // the historical (oracle-replayed) formula.
          (call_function("shiftright",
            coalesce(v.cast("long"), lit(lo)) - lo, lit(shift)),
            bigRange.toLong >> shift)
        } else {
          // v - lo would wrap: shift the OPERANDS first (arithmetic
          // shift = floor-div by 2^shift keeps ordering), then subtract
          // in the narrowed domain where everything fits.
          (call_function("shiftright",
            coalesce(v.cast("long"), lit(lo)), lit(shift)) - lit(lo >> shift),
            (hi >> shift) - (lo >> shift))
        }
      if (denom <= 0L) lit(0L)
      else {
        val q = vShifted * mask
        val d = call_function("div", q, lit(denom)).cast("long")
        least(greatest(d, lit(0L)), lit(mask))
      }
    }
  }

  /** Round-robin bit interleave of already-quantized values: bit i of
    * input j lands at position i * n + j. n * bits must fit a BIGINT.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && qs.size * bits <= 63, "z-value must fit in 63 bits")
    val n = qs.size
    qs.zipWithIndex.map { case (q, j) =>
      (0 until bits).map { i =>
        call_function("shiftleft",
          call_function("shiftright", q, lit(i)).bitwiseAND(1L),
          lit(i * n + j))
      }.reduce[Column](_ bitwiseOR _)
    }.reduce[Column](_ bitwiseOR _)
  }

  /** Adds a `z_value` column interleaving the listed integer columns,
    * each min/max-quantized to `bits` bits. One tiny driver action reads
    * the 2N min/max numbers; the z computation itself is narrow.
    */
  def withZValue(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head
    val qs = cols.zipWithIndex.map { case (c, j) =>
      quantize(col(c), stats.getLong(2 * j), stats.getLong(2 * j + 1), bits)
    }
    df.withColumn("z_value", interleave(qs, bits))
  }

  /** The layout pass: range-partition on z_value (disjoint per-file
    * z ranges => disjoint boxes in every dimension) and sort within
    * partitions so parquet row-group min/max stats are tight too.
    */
  def writeZOrdered(
      df: DataFrame,
      cols: Seq[String],
      path: String,
      bits: Int = 16,
      numFiles: Int = 0,
  ): Unit = {
    val z = withZValue(df, cols, bits)
    val parted =
      if (numFiles > 0) z.repartitionByRange(numFiles, col("z_value"))
      else z.repartitionByRange(col("z_value"))
    parted.sortWithinPartitions("z_value")
      .write.mode("overwrite").parquet(path)
  }
}
