package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The reference's all-datatypes round-trip fixture
  * (tests/pg_replication/cases.py:7-42 via FIXTURES.md §1): every dlt
  * scalar type — including unicode/control-char/emoji text, binary with
  * control bytes, decimals at two precisions, json, date/time — must
  * survive normalize → write → read-back under every disposition.
  */
class TypeRoundTripSpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("col1", LongType, nullable = false),        // bigint
    StructField("col2", DoubleType),                        // double
    StructField("col3", BooleanType),                       // bool
    StructField("col4", TimestampType),                     // timestamp tz
    StructField("col5", StringType),                        // text w/ escapes
    StructField("col6", DecimalType(38, 9)),                // decimal
    StructField("col7", BinaryType),                        // binary
    StructField("col9", StringType),                        // json variant
    StructField("col10", DateType),                         // date
    StructField("col11", LongType),                         // time → micros
    StructField("col1_precision", ShortType),               // bigint p16
    StructField("col6_precision", DecimalType(10, 3)),      // decimal(10,3)
    StructField("col8_wei", DecimalType(38, 0)),            // wei gap closed
  ))

  private val weirdText = "string data \n \r  🦆" // control chars + emoji
  private val row = Row(
    989127831L, 898912.821982, true,
    java.sql.Timestamp.valueOf("2022-05-23 13:26:45.176451"),
    weirdText,
    new java.math.BigDecimal("2323.340000000"),
    Array[Byte](0x62, 0x69, 0x6e, 0x0a, 0x0d, 0x8e.toByte),
    """{"complex":[1,2,3,"a"],"link":"?commen\ntU\nrn=urn%3Ali%3Acomment%3A%28acti"}""",
    java.sql.Date.valueOf("2023-02-27"),
    48405176451L, // 13:26:45.176451 as µs since midnight
    22324.toShort,
    new java.math.BigDecimal("2323.340"),
    new java.math.BigDecimal("2") .pow(56),
  )
  private val nullRow = Row(1L, null, null, null, null, null, null, null, null, null, null, null, null)

  private def fixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(row, nullRow)), schema)

  private def readBack(root: String) = spark.read.parquet(s"$root/all_types")

  test("append, replace and merge dispositions round-trip every value") {
    for (disp <- Seq(Disposition.Append, Disposition.Replace, Disposition.Merge)) {
      val root = tmpDir(s"types-$disp")
      val hints = TableHints("all_types", disp, primaryKey = Seq("col1"))
      val tables = Normalize.normalize(fixture, hints)
      TableWriter.write(spark, tables("all_types"), root, hints)
      val back = readBack(root)
      assert(back.count() == 2, disp)

      val r = back.where(back("col1") === 989127831L).head()
      assert(r.getAs[Double]("col2") == 898912.821982)
      assert(r.getAs[Boolean]("col3"))
      assert(r.getAs[java.sql.Timestamp]("col4").toString == "2022-05-23 13:26:45.176451")
      assert(r.getAs[String]("col5") == weirdText)
      assert(r.getAs[java.math.BigDecimal]("col6").compareTo(new java.math.BigDecimal("2323.34")) == 0)
      assert(r.getAs[Array[Byte]]("col7").toSeq == Seq[Byte](0x62, 0x69, 0x6e, 0x0a, 0x0d, 0x8e.toByte))
      assert(r.getAs[String]("col9").contains("commen\\ntU"))
      assert(r.getAs[java.sql.Date]("col10").toString == "2023-02-27")
      assert(r.getAs[Long]("col11") == 48405176451L)
      assert(r.getAs[Short]("col1_precision") == 22324.toShort)
      assert(r.getAs[java.math.BigDecimal]("col8_wei").compareTo(new java.math.BigDecimal("2").pow(56)) == 0)

      // only the fixture's own columns (normalize appends _dlt_id)
      val nr = back.select(schema.fieldNames.map(back(_)).toSeq: _*).where(back("col1") === 1L).head()
      (1 until schema.length).foreach(i => assert(nr.isNullAt(i), s"$disp col $i"))
    }
  }

  test("merge rerun of the same batch is idempotent for every type") {
    val root = tmpDir("types-idem")
    val hints = TableHints("all_types", Disposition.Merge, primaryKey = Seq("col1"))
    TableWriter.write(spark, Normalize.normalize(fixture, hints)("all_types"), root, hints)
    TableWriter.write(spark, Normalize.normalize(fixture, hints)("all_types"), root, hints)
    assert(readBack(root).count() == 2)
  }
}
