package graft.core

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

/** Property tests for the merge engine and normalizer — the test-class the
  * reference lacks (SURVEY §5 "adopt": scalacheck for normalizer + merge
  * writer). The merge model under test: after mergePlan, the table equals
  * a per-key last-write-wins reduction of base-then-updates, with
  * hard-deleted keys absent.
  */
class MergePropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(30)

  private val rowGen = for {
    key <- Gen.choose(0L, 15L)       // small key space → heavy collisions
    ver <- Gen.choose(0L, 1000L)
    dead <- Gen.frequency(4 -> false, 1 -> true)
    payload <- Gen.alphaStr.map(_.take(8))
  } yield (key, ver, payload, dead)

  private val batchGen = Gen.listOfN(40, rowGen)

  /** Reference model: per key, the (ver, payload, dead) with max (ver) —
    * ties broken by payload desc then dead — survives; dead survivors drop
    * the key.
    */
  private def model(base: Seq[(Long, Long, String, Boolean)], updates: Seq[(Long, Long, String, Boolean)]) = {
    def latest(rows: Seq[(Long, Long, String, Boolean)]) =
      rows.groupBy(_._1).view.mapValues(_.maxBy(r => (r._2, r._3, r._4))).toMap
    val baseLatest = latest(base).filterNot(_._2._4)
    val updLatest = latest(updates)
    val merged = baseLatest ++ updLatest // update wins on key overlap
    merged.filterNot(_._2._4).map { case (k, (_, v, p, _)) => (k, v, p) }.toSet
  }

  private def hints = TableHints("t", Disposition.Merge,
    primaryKey = Seq("key"), dedupSort = Some(("ord", true)), hardDeleteCol = Some("deleted_ts"))

  private def toDf(rows: Seq[(Long, Long, String, Boolean)]) = {
    import org.apache.spark.sql.functions._
    rows.toDF("key", "ver", "payload", "dead")
      .withColumn("ord", struct(col("ver"), col("payload"), col("dead")))
      .withColumn("deleted_ts", when(col("dead"), current_timestamp()))
  }

  test("mergePlan equals the last-write-wins model for arbitrary batches") {
    val prop = forAll(batchGen, batchGen) { (base, updates) =>
      val baseDf = MergeEngine.dedupeBatch(toDf(base), hints.primaryKey, hints.dedupSort)
        .filter(org.apache.spark.sql.functions.col("deleted_ts").isNull)
      val out = MergeEngine.mergePlan(Some(baseDf), toDf(updates), hints)
        .select("key", "ver", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      out == model(base, updates)
    }
    val result = org.scalacheck.Test.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  test("merge is idempotent: re-applying the same batch changes nothing") {
    val prop = forAll(batchGen) { updates =>
      val once = MergeEngine.mergePlan(None, toDf(updates), hints)
      val twice = MergeEngine.mergePlan(Some(once), toDf(updates), hints)
      val a = once.select("key", "ver", "payload").collect().map(_.toSeq).toSet
      val b = twice.select("key", "ver", "payload").collect().map(_.toSeq).toSet
      a == b
    }
    val result = org.scalacheck.Test.check(params.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}

/** Normalizer properties: structural invariants over arbitrary nested docs. */
class NormalizePropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(15)

  private val docGen = for {
    id <- Gen.choose(0L, 1000000L)
    nTags <- Gen.choose(0, 5)
    tags <- Gen.listOfN(nTags, Gen.alphaStr.map(_.take(6)))
    x <- Gen.choose(-1000L, 1000L)
    y <- Gen.alphaStr.map(_.take(6))
  } yield (id, tags, (x, y))

  test("child-table row count equals total array elements; ids join back exactly") {
    val prop = forAll(Gen.listOfN(12, docGen)) { docs0 =>
      // distinct ids (pk semantics)
      val docs = docs0.distinctBy(_._1)
      val df = docs.toDF("id", "tags", "inner")
        .withColumn("inner", org.apache.spark.sql.functions.expr("named_struct('x', inner._1, 'y', inner._2)"))
      val tables = Normalize.normalize(df, TableHints("d", primaryKey = Seq("id")))
      val parent = tables("d")
      val expectTags = docs.map(_._2.size).sum
      val gotTags = if (tables.contains("d__tags")) tables("d__tags").count() else 0L
      val joined = if (tables.contains("d__tags"))
        parent.join(tables("d__tags"),
          parent(Normalize.DltId) === tables("d__tags")(Normalize.DltParentId)).count()
      else 0L
      gotTags == expectTags && joined == expectTags &&
        parent.count() == docs.size &&
        parent.columns.toSet == Set("id", "inner__x", "inner__y", Normalize.DltId)
    }
    val result = org.scalacheck.Test.check(params, prop)
    assert(result.passed, result.status.toString)
  }
}
