package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k$i", i.toLong, i.toDouble)
  }.toDF("key", "id", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("key").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("key"), "v", factor = 8, saltSource = Seq("id"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join and spreads the hot key") {
    val dims = Seq(("hot", "H"), ("k901", "A"), ("k999", "B")).toDF("key", "label")
    val plain = skewed.join(dims, "key").select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dims, "key", factor = 8, largeSaltSource = Seq("id"))
      .select("id", "label")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.size == 902)

    // the hot key's rows really carry >1 distinct salt
    val saltDist = skewed.withColumn("s", Skew.salt(8, Seq($"id")))
      .where($"key" === "hot").select(countDistinct($"s")).head().getLong(0)
    assert(saltDist > 4)
  }
}
