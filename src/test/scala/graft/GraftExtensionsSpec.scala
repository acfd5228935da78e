package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkTestBase {
  import spark.implicits._

  test("SQL functions compute identically to the DataFrame-API expressions") {
    GraftExtensions.register(spark)
    val docs = Seq((1L, "the quick brown fox"), (2L, "jumps over the lazy dog"))
      .toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val sqlRows = spark.sql(
      """SELECT id, graft_minhash(split(text, ' '), 8) AS sig,
        |       graft_simhash(split(text, ' ')) AS sh
        |FROM ext_docs ORDER BY id""".stripMargin).collect()
    val apiRows = docs.select(
      $"id",
      graft.functions.MinHashSignature.minhashSignature(split($"text", " "), 8).as("sig"),
      graft.functions.SimHash64.simhash64(split($"text", " ")).as("sh"),
    ).orderBy("id").collect()

    assert(sqlRows.map(_.getSeq[Long](1)).toSeq == apiRows.map(_.getSeq[Long](1)).toSeq)
    assert(sqlRows.map(_.getLong(2)).toSeq == apiRows.map(_.getLong(2)).toSeq)
  }

  test("graft_top_k SQL aggregate equals the DataFrame-API bounded top-k") {
    GraftExtensions.register(spark)
    val rnd = new scala.util.Random(3)
    (1L to 200L).map(i => (i % 4, rnd.nextDouble(), i)).toDF("g", "s", "i")
      .createOrReplaceTempView("scored_ext")
    val sqlRows = spark.sql(
      "SELECT g, graft_top_k(s, i, 3) AS top FROM scored_ext GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1))))
    val apiRows = spark.table("scored_ext")
      .groupBy($"g").agg(graft.functions.BoundedTopK.topK($"s", $"i", 3).as("top"))
      .orderBy("g")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1))))
    assert(sqlRows.toSeq == apiRows.toSeq)
  }

  test("graft_top_k accepts INT score / INT id via analyzer-inserted casts") {
    GraftExtensions.register(spark)
    (1 to 50).map(i => (i % 2, i % 7, i)).toDF("g", "cnt", "id")
      .createOrReplaceTempView("scored_int_ext")
    // cnt is INT, id is INT: ExpectsInputTypes must make the analyzer cast
    // them to DOUBLE/BIGINT instead of dying executor-side mid-job.
    val rows = spark.sql(
      "SELECT g, graft_top_k(cnt, id, 2) AS top FROM scored_int_ext GROUP BY g ORDER BY g")
      .collect().map(r => r.getInt(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(t => (t.getDouble(0), t.getLong(1))))
    assert(rows.length == 2)
    // best per group = highest cnt (6), tie broken by lowest id
    assert(rows(0)._2.head == (6.0, 6L))
    assert(rows(1)._2.head == (6.0, 13L))
  }

  test("non-literal k is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 1 + 1)").collect()
    }
    assert(e.getMessage.contains("int literal") || e.getMessage.toLowerCase.contains("graft_minhash"))
  }
}
