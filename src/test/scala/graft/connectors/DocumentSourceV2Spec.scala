package graft.connectors.db

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture store: honors eq/gt/gte/lt/lte filters on `seq` and projection,
  * and records what was asked of it so pushdown is observable.
  */
class RecordingStore(n: Int) extends DocumentSource.DocumentStore {
  @volatile var lastFilter: Map[String, String] = Map.empty
  @volatile var lastProjection: Seq[String] = Nil
  @volatile var scanCalls: Int = 0

  private def matching(f: Map[String, String]): Seq[Int] =
    (0 until n).filter { i =>
      f.forall {
        case ("seq.eq", v)  => i == v.toInt
        case ("seq.gt", v)  => i > v.toInt
        case ("seq.gte", v) => i >= v.toInt
        case ("seq.lt", v)  => i < v.toInt
        case ("seq.lte", v) => i <= v.toInt
        case _              => true
      }
    }

  override def count(c: String, f: Map[String, String]): Long = { lastFilter = f; matching(f).size.toLong }
  override def scan(c: String, f: Map[String, String], skip: Long, limit: Long, proj: Seq[String]) = {
    scanCalls += 1; lastProjection = proj
    matching(f).slice(skip.toInt, (skip + limit).toInt).iterator.map { i =>
      val all = Map("_id" -> i.toString, "seq" -> i.toString, "name" -> s""""n$i"""", "score" -> (i / 2.0).toString)
      val kept = if (proj.isEmpty) all else all.view.filterKeys(proj.contains).toMap
      kept.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    }
  }
}

class DocumentSourceV2Spec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("_id", LongType), StructField("seq", LongType),
    StructField("name", StringType), StructField("score", DoubleType)))

  private def load(store: String, chunk: Int = 25) =
    spark.read.format("graft-docs").schema(schema)
      .option("store", store).option("collection", "c").option("chunkSize", chunk)
      .load()

  test("short name resolves; full scan reads all docs across partitions") {
    DocumentStores.register("s1", new RecordingStore(95))
    val df = load("s1")
    assert(df.count() == 95)
    assert(df.rdd.getNumPartitions == 4) // ceil(95/25) chunks
  }

  test("range filters push into the store; count reflects the pushed filter") {
    val store = new RecordingStore(100)
    DocumentStores.register("s2", store)
    val df = load("s2").where($"seq" >= 20 && $"seq" < 30)
    assert(df.count() == 10)
    assert(store.lastFilter == Map("seq.gte" -> "20", "seq.lt" -> "30"))
    // plan shows the pushed filters in the scan description
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("seq.gte") && plan.contains("seq.lt"), plan)
  }

  test("unsupported predicates stay Spark-side but still filter correctly") {
    val store = new RecordingStore(50)
    DocumentStores.register("s3", store)
    val df = load("s3").where($"seq" >= 10 && $"name".contains("n1"))
    val names = df.select("name").as[String].collect().toSet
    assert(names == (10 to 19).map(i => s"n$i").toSet) // n10..n19 (n1 excluded by seq>=10)
    assert(store.lastFilter == Map("seq.gte" -> "10")) // contains() NOT pushed
  }

  test("column pruning reaches the store") {
    val store = new RecordingStore(30)
    DocumentStores.register("s4", store)
    val out = load("s4").select("name").collect()
    assert(out.length == 30)
    assert(store.lastProjection == Seq("name"))
  }

  test("values decode with correct types and nulls") {
    DocumentStores.register("s5", new RecordingStore(3))
    val r = load("s5").orderBy("seq").collect()
    assert(r(2).getLong(1) == 2L && r(2).getString(2) == "n2" && r(2).getDouble(3) == 1.0)
  }
}
