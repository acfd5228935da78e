package graft.connectors.db

import graft.SparkTestBase
import graft.core.{Disposition, TableHints}
import org.apache.spark.sql.functions._

/** Destination-side merge into embedded Derby (SURVEY §2.1 row 5 + §2.4):
  * upsert, dedup_sort, hard_delete, merge_key delete-insert, pk-less
  * append degradation, added-column evolution and scd2 full rewrite —
  * each verified by reading the destination back, the reference's
  * tests/utils.py assert style.
  */
class JdbcMergeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val url: String = {
    val tmp = tmpDir("graft_derby_merge")
    System.setProperty("derby.system.home", tmp)
    s"jdbc:derby:$tmp/db;create=true"
  }
  private def cfg(table: String) = JdbcSource.JdbcConfig(url, table)
  private def readBack(table: String) = JdbcSource.read(spark, cfg(table))

  test("merge upserts by primary key with dedup_sort and hard_delete, destination-side") {
    val hints = TableHints("t1", Disposition.Merge, primaryKey = Seq("id"),
      dedupSort = Some(("seq", true)), hardDeleteCol = Some("del"))
    val b1 = Seq((1L, "a", 1L, null.asInstanceOf[String]),
      (2L, "b", 1L, null.asInstanceOf[String]),
      (3L, "c", 1L, null.asInstanceOf[String])).toDF("id", "v", "seq", "del")
    JdbcMerge.write(spark, b1, cfg("T1"), hints)
    // batch 2: id 2 updated twice (seq 3 wins), id 3 hard-deleted, id 4 new
    val b2 = Seq((2L, "b2", 2L, null.asInstanceOf[String]),
      (2L, "b3", 3L, null.asInstanceOf[String]),
      (3L, "dead", 2L, "x"),
      (4L, "d", 2L, null.asInstanceOf[String])).toDF("id", "v", "seq", "del")
    JdbcMerge.write(spark, b2, cfg("T1"), hints)
    val out = readBack("T1").select("id", "v", "seq").as[(Long, String, Long)]
      .collect().toSet
    assert(out == Set((1L, "a", 1L), (2L, "b3", 3L), (4L, "d", 2L)))
  }

  test("tableExists: wildcards escaped, schema-qualified names resolved") {
    val hints = TableHints("t7", Disposition.Merge, primaryKey = Seq("id"))
    JdbcMerge.write(spark, Seq((1L, "a")).toDF("id", "v"), cfg("T7DATA"), hints)
    assert(JdbcMerge.tableExists(cfg("T7DATA"), "T7DATA"))
    // '_' must not act as a LIKE wildcard: a probe for T7_ATA must NOT
    // match the existing T7DATA (a false positive here is benign, but
    // the same unescaped pattern makes FALSE NEGATIVES for real names
    // with '_' on metadata stores that anchor patterns differently)
    assert(!JdbcMerge.tableExists(cfg("T7DATA"), "T7_ATA"))
    assert(!JdbcMerge.tableExists(cfg("T7DATA"), "T7%"))
    // schema-qualified probe splits into (schema, table) metadata args
    // (Derby's default schema for un-authenticated connections is APP)
    assert(JdbcMerge.tableExists(cfg("T7DATA"), "APP.T7DATA"))
    assert(!JdbcMerge.tableExists(cfg("T7DATA"), "NOSCHEMA.T7DATA"))
  }

  test("merge_key deletes the key set then inserts the batch (replace-by-key)") {
    val hints = TableHints("t2", Disposition.Merge, mergeKey = Seq("day"))
    val b1 = Seq(("d1", 1L), ("d1", 2L), ("d2", 3L)).toDF("day", "n")
    JdbcMerge.write(spark, b1, cfg("T2"), hints)
    val b2 = Seq(("d1", 9L)).toDF("day", "n") // d1 fully replaced by ONE row
    JdbcMerge.write(spark, b2, cfg("T2"), hints)
    val out = readBack("T2").as[(String, Long)].collect().toSet
    assert(out == Set(("d1", 9L), ("d2", 3L)))
  }

  test("pk-less merge degrades to append") {
    val hints = TableHints("t3", Disposition.Merge)
    JdbcMerge.write(spark, Seq((1L, "a")).toDF("id", "v"), cfg("T3"), hints)
    JdbcMerge.write(spark, Seq((1L, "a")).toDF("id", "v"), cfg("T3"), hints)
    assert(readBack("T3").count() == 2)
  }

  test("added columns evolve via ALTER TABLE; old rows read back null") {
    val hints = TableHints("t4", Disposition.Merge, primaryKey = Seq("id"))
    JdbcMerge.write(spark, Seq((1L, "a")).toDF("id", "v"), cfg("T4"), hints)
    val b2 = Seq((2L, "b", 7.5)).toDF("id", "v", "score")
    JdbcMerge.write(spark, b2, cfg("T4"), hints)
    val out = readBack("T4").select("id", "v", "score")
      .as[(Long, String, Option[Double])].collect().toSet
    assert(out == Set((1L, "a", None), (2L, "b", Some(7.5))))
  }

  test("scd2 disposition lands validity windows in the destination") {
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-02-01 00:00:00")
    def hints(ts: java.sql.Timestamp) = TableHints("t5", Disposition.Scd2,
      primaryKey = Seq("id"), scd2LoadTs = Some(ts))
    JdbcMerge.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), cfg("T5"), hints(ts1))
    // id 1 changes, id 2 departs, id 3 arrives
    JdbcMerge.write(spark, Seq((1L, "a2"), (3L, "c")).toDF("id", "v"), cfg("T5"), hints(ts2))
    val out = readBack("T5")
      .select(col("id"), col("v"), col("_valid_to").isNull.as("open"))
      .as[(Long, String, Boolean)].collect().toSet
    assert(out == Set(
      (1L, "a", false), (1L, "a2", true),
      (2L, "b", false), (3L, "c", true)))
  }

  test("a failed merge rolls back: target state is unchanged") {
    val hints = TableHints("t6", Disposition.Merge, primaryKey = Seq("id"))
    JdbcMerge.write(spark, Seq((1L, "a")).toDF("id", "v"), cfg("T6"), hints)
    // second batch renames the key column so the destination-side key
    // match fails after staging; target must still hold batch 1 only
    intercept[Exception] {
      JdbcMerge.merge(spark, Seq((2L, "b")).toDF("wrong_id", "v"), cfg("T6"), hints)
    }
    assert(readBack("T6").as[(Long, String)].collect().toSet == Set((1L, "a")))
    assert(!JdbcMerge.tableExists(cfg("T6_stage"), "T6_stage")) // stage cleaned up
  }
}
