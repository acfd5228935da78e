package graft.connectors.db

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Live-backend e2e for the sql_database scan (SURVEY §2.1 row 5) against
  * embedded Derby: Spark's JDBC sink creates the table, JdbcSource reads
  * it back partitioned and with pushed predicates.
  */
class JdbcSourceSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val url: String = {
    val tmp = tmpDir("graft_derby_spec")
    System.setProperty("derby.system.home", tmp)
    val u = s"jdbc:derby:$tmp/db;create=true"
    val df = (0 until 500).map(i => (i.toLong, (i % 7).toLong, s"name_$i", i * 1.5))
      .toDF("id", "grp", "name", "score")
    df.write.format("jdbc").option("url", u).option("dbtable", "T")
      .option("createTableColumnTypes", "name VARCHAR(32)")
      .mode("overwrite").save()
    u
  }

  test("partitioned read covers the table exactly and uses N disjoint ranges") {
    val df = JdbcSource.read(spark,
      JdbcSource.JdbcConfig(url, "T", partitionColumn = Some("\"id\""), numPartitions = 4))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 500)
    assert(df.agg(countDistinct(col("id"))).head.getLong(0) == 500) // disjoint: no row read twice
  }

  test("pushdown predicate reaches the remote query") {
    val df = JdbcSource.read(spark,
      JdbcSource.JdbcConfig(url, "T"), pushdown = Some("\"grp\" = 3"))
    assert(df.count() == (0 until 500).count(_ % 7 == 3))
    assert(df.select(max(col("grp"))).head.getLong(0) == 3)
  }

  test("partitioned + pushdown compose; empty table falls back to single read") {
    val both = JdbcSource.read(spark,
      JdbcSource.JdbcConfig(url, "T", partitionColumn = Some("\"id\""), numPartitions = 4),
      pushdown = Some("\"id\" < 100"))
    assert(both.count() == 100)

    spark.emptyDataset[(Long, Long)].toDF("id", "grp")
      .write.format("jdbc").option("url", url).option("dbtable", "EMPTY_T").mode("overwrite").save()
    val empty = JdbcSource.read(spark,
      JdbcSource.JdbcConfig(url, "EMPTY_T", partitionColumn = Some("\"id\""), numPartitions = 4))
    assert(empty.count() == 0) // MIN/MAX probe returns NULL → unpartitioned fallback
  }
}
