package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the knobs a 100 TB run needs when AQE's
  * automatic skew-join splitting isn't applicable (aggregations, or joins
  * whose skewed side feeds other operators).
  *
  * Salting trades one shuffle for two balanced ones:
  *   - salted aggregation: group on (key, salt) first (partial results
  *     spread over `factor` partitions per key), then re-aggregate on key —
  *     correct for decomposable aggregates (sum/count/min/max);
  *   - salted join: explode the SMALL side `factor`× with every salt value,
  *     salt the BIG side randomly; each hot key's rows spread across
  *     `factor` tasks instead of one straggler.
  */
object Skew {

  val SaltCol = "_salt"

  /** Deterministic salt from row identity, uniform in [0, factor). Using a
    * hash of the whole row (not rand()) keeps retries/speculative tasks
    * consistent.
    */
  def salt(factor: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(factor)).cast("int")

  /** Two-stage skew-safe sum/count aggregation: partials per (key, salt),
    * then final per key.
    */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      sumCol: String,
      factor: Int,
      saltSource: Seq[String],
  ): DataFrame = {
    val salted = df.withColumn(SaltCol, salt(factor, saltSource.map(col)))
    salted
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(sum(col(sumCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$sumCol"), sum(col("__pcnt")).as("n"))
  }

  /** Skewed large-side join: small side replicated once per salt value,
    * large side salted; join on (key, salt). Output = plain inner join on
    * key, but no single task holds a whole hot key.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      factor: Int,
      largeSaltSource: Seq[String],
  ): DataFrame = {
    val saltedLarge = large.withColumn(SaltCol, salt(factor, largeSaltSource.map(col)))
    val explodedSmall = small.withColumn(SaltCol, explode(lit((0 until factor).toArray)))
    saltedLarge.join(explodedSmall, Seq(key, SaltCol)).drop(SaltCol)
  }
}
