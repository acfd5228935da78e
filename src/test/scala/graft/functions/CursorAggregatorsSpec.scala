package graft.functions

import graft.SparkTestBase

class CursorAggregatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("one-pass map-valued cursor equals grouped max, with width-safe ordering") {
    val rows = Seq(
      ("shard-0", "9"), ("shard-0", "12"), ("shard-0", "100"),
      ("shard-1", "5"), ("shard-1", "50"),
    )
    val ds = rows.toDS()
    val result = ds.select(CursorAggregators.maxSeqPerShardColumn).head()
    assert(result == Map("shard-0" -> "100", "shard-1" -> "50")) // not lexicographic "9"
  }

  test("aggregator merges partial maps associatively across partitions") {
    val rows = (1 to 500).map(i => (s"shard-${i % 7}", i.toString))
    val ds = rows.toDS().repartition(8)
    val result = ds.select(CursorAggregators.maxSeqPerShardColumn).head()
    val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2.toInt).max.toString).toMap
    assert(result == expected)
  }
}
