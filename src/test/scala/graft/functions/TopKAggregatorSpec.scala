package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  private def naiveTopK(rows: Seq[(Long, Double, Long)], k: Int): Map[Long, Seq[(Double, Long)]] =
    rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortWith { case ((sa, ia), (sb, ib)) => if (sa != sb) sa > sb else ia < ib }
        .take(k)
    }

  test("bounded_top_k equals sort-and-take on random data with heavy ties, any partitioning") {
    val rnd = new scala.util.Random(11)
    // few distinct scores → constant tie-breaking through ids
    val rows = (1L to 500L).map(i => (i % 5, (rnd.nextInt(8) / 4.0), i))
    val expected = naiveTopK(rows, 7)
    for (parts <- Seq(1, 3, 17)) {
      val got = rows.toDF("g", "s", "i").repartition(parts)
        .groupBy($"g").agg(BoundedTopK.topK($"s", $"i", 7).as("top"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getDouble(0), t.getLong(1))))
        .toMap
      assert(got == expected, s"divergence at $parts partitions")
    }
  }

  test("buffer semantics: -0.0 ties with 0.0 (id decides), NaN ranks best, nulls skipped, short groups") {
    val buf = new BoundedTopK.Buffer(3)
    buf.offer(0.0, 10L); buf.offer(-0.0, 2L); buf.offer(-1.0, 1L); buf.offer(0.0, 5L)
    // -0.0 == 0.0: the three zero-scored entries tie, ids 2,5,10 win over -1.0
    assert(buf.sortedBestFirst.toSeq == Seq((-0.0, 2L), (0.0, 5L), (0.0, 10L)))

    val nan = new BoundedTopK.Buffer(2)
    nan.offer(0.9, 1L); nan.offer(Double.NaN, 2L); nan.offer(0.99, 3L)
    // Spark's descending sort puts NaN first; the buffer must agree
    assert(nan.sortedBestFirst.head._2 == 2L)

    // groups smaller than k just return what exists — exercised via SQL
    val out = Seq((1L, 0.5, 7L)).toDF("g", "s", "i")
      .groupBy($"g").agg(BoundedTopK.topK($"s", $"i", 5).as("top"))
      .select(posexplode($"top")).collect()
    assert(out.length == 1 && out.head.getStruct(1).getLong(1) == 7L)

    // null scores are skipped entirely
    val withNull = Seq((1L, Some(0.5), 7L), (1L, None, 8L)).toDF("g", "s", "i")
      .groupBy($"g").agg(BoundedTopK.topK($"s", $"i", 5).as("top"))
      .select(size($"top")).as[Int].head()
    assert(withNull == 1)
  }

  test("serialization round-trip preserves the kept set") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val agg = BoundedTopK(
      ColumnBridge.expression(lit(0.0)), ColumnBridge.expression(lit(0L)), 4)
    val buf = new BoundedTopK.Buffer(4)
    Seq((0.9, 1L), (0.8, 2L), (0.7, 3L), (0.95, 4L), (0.99, 5L)).foreach {
      case (s, i) => buf.offer(s, i)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.sortedBestFirst.toSeq == buf.sortedBestFirst.toSeq)
  }
}
