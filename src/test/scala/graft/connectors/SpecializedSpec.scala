package graft.connectors.sources

import graft.SparkTestBase
import graft.connectors.rest.AsyncJobPoller
import graft.connectors.db.DocumentSource
import graft.connectors.streams.QueueBridge
import org.apache.spark.sql.functions._
import Specialized._

class SpecializedSpec extends SparkTestBase {
  import spark.implicits._

  test("SOQL builder prunes compound fields and pushes the cursor") {
    val fields = Seq("Id" -> "id", "Name" -> "string", "BillingAddress" -> "address", "SystemModstamp" -> "datetime")
    val q = Soql.query("Account", fields, Some("SystemModstamp"), Some("2024-01-01T00:00:00Z"))
    assert(q == "SELECT Id, Name, SystemModstamp FROM Account WHERE SystemModstamp > 2024-01-01T00:00:00Z ORDER BY SystemModstamp ASC")
    assert(!q.contains("BillingAddress"))
    assert(Soql.query("Account", fields, None, None) == "SELECT Id, Name, SystemModstamp FROM Account")
  }

  test("salesforce bulk-vs-REST datetime normalization unifies to timestamp") {
    val df = Seq("1704067200000", "2024-01-01T00:00:00.000Z").toDF("v")
      .select(Soql.normalizeDatetime($"v").as("ts"))
    val both = df.select(unix_timestamp($"ts")).as[Long].collect().toSet
    assert(both == Set(1704067200L))
  }

  test("sheets serial dates, A1 arithmetic and header fallback") {
    val d = Seq(45292).toDF("n").select(Sheets.serialToDate($"n").cast("string")).as[String].head()
    assert(d == "2024-01-01")
    val ts = Seq(45292.5).toDF("n").select(Sheets.serialToTimestamp($"n").cast("string")).as[String].head()
    assert(ts == "2024-01-01 12:00:00")

    assert(Sheets.parseA1("AB12") == (28, 12))
    assert(Sheets.toA1(28, 12) == "AB12")
    assert(Sheets.toA1(1, 1) == "A1")
    assert((1 to 100).forall(c => Sheets.parseA1(Sheets.toA1(c, 5)) == (c, 5)))

    assert(Sheets.headerNames(Seq("Name", "", "name", null)) == Seq("name", "col_2", "name_1", "col_4"))
  }

  test("matomo active-visit filter drops still-open sessions") {
    val now = 10000L
    val df = Seq(
      ("v1", 9500L, 9400L),  // recent + short → active → dropped
      ("v2", 9500L, 5000L),  // recent but long → kept
      ("v3", 1000L, 900L),   // old → kept
    ).toDF("id", "last_s", "first_s")
      .select($"id", to_timestamp($"last_s").as("last"), to_timestamp($"first_s").as("first"))
    val out = Matomo.removeActiveVisits(df, "last", "first", nowEpochS = now)
    assert(out.select("id").as[String].collect().toSet == Set("v2", "v3"))
  }

  test("GA metric typing and dimension parsing") {
    val m = Seq(("5", "2.5")).toDF("users", "rate")
      .select(GA.metricColumn($"users", "TYPE_INTEGER").as("u"), GA.metricColumn($"rate", "TYPE_FLOAT").as("r"))
    assert(m.schema("u").dataType.typeName == "long")
    assert(m.schema("r").dataType.typeName == "double")
    val d = Seq("20240115").toDF("d").select(GA.dimensionColumn($"d", "date").cast("string")).as[String].head()
    assert(d == "2024-01-15")
  }

  test("hubspot property catalog → hints; selection validates + unions custom props") {
    val catalog = Map("amount" -> "number", "closedate" -> "datetime", "active" -> "bool",
      "stage" -> "enumeration", "my_custom" -> "string")
    val hints = Hubspot.hintsFor(catalog)
    assert(hints("amount").dltType.contains(graft.core.DltType.TDouble))
    assert(hints("closedate").dltType.contains(graft.core.DltType.TTimestamp))

    val defaults = Set("amount", "closedate", "active", "stage")
    val sel = Hubspot.selectProperties(Seq("amount", "stage"), catalog, defaults, includeCustom = true)
    assert(sel.toSet == Set("amount", "stage", "my_custom"))
    intercept[IllegalArgumentException](
      Hubspot.selectProperties(Seq("nope"), catalog, defaults, includeCustom = false))
  }

  test("facebook insights planning: attribution rewind, day fan-out, union") {
    import java.time.LocalDate
    assert(Facebook.attributionWindowStart(LocalDate.of(2024, 1, 10), 7) == LocalDate.of(2024, 1, 3))
    val days = Facebook.dayRange(LocalDate.of(2024, 1, 1), LocalDate.of(2024, 1, 4))
    assert(days.map(_.getDayOfMonth) == Seq(1, 2, 3))
    val f1 = Seq((1L, "a")).toDF("id", "x")
    val f2 = Seq((2L, "b", 5.0)).toDF("id", "x", "extra")
    val u = Facebook.unionDays(Seq(f1, f2)).get
    assert(u.count() == 2 && u.columns.contains("extra"))
    assert(Facebook.unionDays(Nil).isEmpty)
  }

  test("async job poller: backoff, start timeout, completion") {
    // completes on third poll
    var polls = 0
    var slept = List.empty[Long]
    val r = AsyncJobPoller.await(
      () => { polls += 1; if (polls < 3) AsyncJobPoller.Running else AsyncJobPoller.Completed("ref-1") },
      AsyncJobPoller.PollConfig(initialIntervalMs = 10, maxIntervalMs = 25),
      sleeper = ms => slept ::= ms)
    assert(r == Right("ref-1"))
    assert(slept.reverse == List(10L, 20L)) // capped exponential

    // never starts → start timeout
    var t = 0L
    val r2 = AsyncJobPoller.await(
      () => AsyncJobPoller.Pending,
      AsyncJobPoller.PollConfig(initialIntervalMs = 1, startTimeoutMs = 100, completionTimeoutMs = 1000),
      sleeper = _ => (), clock = () => { t += 60; t })
    assert(r2.isLeft && r2.swap.toOption.get.contains("did not start"))
  }

  test("async job poller: awaitAll shares sleeps — wall-clock max(), per-job schedule intact") {
    // 5 jobs, each completing on its 3rd check under the default-shaped
    // 10 → 20 backoff: awaitAll must check every job at t = 0 / 10 / 30
    // (identical to what await would do) while advancing ONE shared clock
    // to 30, not 5 × 30.
    var vnow = 0L
    val checks = scala.collection.mutable.Map[Int, List[Long]]()
    val counts = scala.collection.mutable.Map[Int, Int]().withDefaultValue(0)
    val jobs = (0 until 5).map { k =>
      k -> (() => {
        checks(k) = checks.getOrElse(k, Nil) :+ vnow
        counts(k) += 1
        if (counts(k) < 3) AsyncJobPoller.Running else AsyncJobPoller.Completed(s"ref-$k")
      })
    }
    val rs = AsyncJobPoller.awaitAll(jobs,
      AsyncJobPoller.PollConfig(initialIntervalMs = 10, maxIntervalMs = 300),
      sleeper = ms => vnow += ms, clock = () => vnow)
    assert(rs == (0 until 5).map(k => k -> Right(s"ref-$k")))
    (0 until 5).foreach(k => assert(checks(k) == List(0L, 10L, 30L)))
    assert(vnow == 30L) // max() over jobs, not Σ = 150

    // mixed outcomes on one timeline: completes / Failed / never-starts.
    // The straggler times out on ITS schedule without holding the others,
    // and results come back in input order.
    var v2 = 0L
    val mixed = Seq(
      "ok" -> (() => if (v2 >= 10) AsyncJobPoller.Completed("done")
               else AsyncJobPoller.Running: AsyncJobPoller.JobStatus),
      "bad" -> (() => AsyncJobPoller.Failed("boom"): AsyncJobPoller.JobStatus),
      "stuck" -> (() => AsyncJobPoller.Pending: AsyncJobPoller.JobStatus),
    )
    val rs2 = AsyncJobPoller.awaitAll(mixed,
      AsyncJobPoller.PollConfig(initialIntervalMs = 10, maxIntervalMs = 20,
        startTimeoutMs = 50, completionTimeoutMs = 1000),
      sleeper = ms => v2 += ms, clock = () => v2)
    assert(rs2.map(_._1) == Seq("ok", "bad", "stuck"))
    assert(rs2(0)._2 == Right("done"))
    assert(rs2(1)._2 == Left("boom"))
    assert(rs2(2)._2.isLeft && rs2(2)._2.swap.toOption.get.contains("did not start"))
    assert(v2 <= 70L, s"shared timeline ran to $v2 — stragglers must not serialize")
  }

  test("awaitAll isolates a throwing status check: the job retries on its backoff, others keep their results") {
    // job "flaky" throws on its first check (transient network blip),
    // then completes; job "ok" completes immediately. The throw must not
    // abort the shared timeline or discard ok's ref.
    var v = 0L
    var flakyCalls = 0
    val jobs = Seq(
      "ok" -> (() => AsyncJobPoller.Completed("ok-ref"): AsyncJobPoller.JobStatus),
      "flaky" -> (() => {
        flakyCalls += 1
        if (flakyCalls == 1) throw new java.io.IOException("connection reset")
        AsyncJobPoller.Completed("flaky-ref"): AsyncJobPoller.JobStatus
      }),
    )
    val rs = AsyncJobPoller.awaitAll(jobs,
      AsyncJobPoller.PollConfig(initialIntervalMs = 10),
      sleeper = ms => v += ms, clock = () => v)
    assert(rs == Seq("ok" -> Right("ok-ref"), "flaky" -> Right("flaky-ref")))
    assert(flakyCalls == 2 && v == 10L, "flaky must retry on its own backoff schedule")

    // a PERSISTENTLY failing check is bounded by the job's own timeout
    // discipline and surfaces the last error in the result
    var v2 = 0L
    val rs2 = AsyncJobPoller.awaitAll(
      Seq("dead" -> ({ () =>
        throw new java.io.IOException("boom")
      }: () => AsyncJobPoller.JobStatus)),
      AsyncJobPoller.PollConfig(initialIntervalMs = 10, maxIntervalMs = 20, startTimeoutMs = 50),
      sleeper = ms => v2 += ms, clock = () => v2)
    val dead = rs2.head._2
    assert(dead.isLeft && dead.swap.toOption.get.contains("did not start") &&
      dead.swap.toOption.get.contains("boom"), dead.toString)
  }

  test("document source: chunked parallel scan with projection + cursor pushdown") {
    val docs = (0 until 95).map(i => s"""{"_id":$i,"name":"n$i","secret":"x","seq":$i}""")
    val store = new DocumentSource.DocumentStore {
      override def count(c: String, f: Map[String, String]): Long = {
        val lo = f.get("seq.gte").map(_.toInt).getOrElse(0)
        docs.size - lo
      }
      override def scan(c: String, f: Map[String, String], skip: Long, limit: Long, proj: Seq[String]) = {
        val lo = f.get("seq.gte").map(_.toInt).getOrElse(0)
        docs.drop(lo).slice(skip.toInt, (skip + limit).toInt).iterator.map { d =>
          if (proj.isEmpty) d
          else {
            val node = graft.connectors.rest.Json.parse(d).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
            node.retain(proj: _*); node.toString
          }
        }
      }
    }
    val proj = DocumentSource.resolveProjection(Seq("_id", "name", "secret", "seq"), Seq("name"), Nil, "_id")
    assert(proj.toSet == Set("name", "_id"))
    val filter = DocumentSource.cursorFilter(Some("seq"), Some("20"), None, Map.empty)
    val df = DocumentSource.read(spark, store, "c", filter, proj, chunkSize = 10)
    assert(df.count() == 75)
    assert(df.columns.toSet == Set("_id", "name"))
    intercept[IllegalArgumentException](
      DocumentSource.cursorFilter(Some("seq"), Some("1"), None, Map("seq" -> "5")))
  }

  test("queue bridge: threaded producer → batched DataFrames with backpressure") {
    val bridge = new QueueBridge[Int](capacity = 8)
    val producer = new Thread(() => {
      (1 to 25).foreach(bridge.put)
      bridge.close()
    })
    producer.start()
    var batches = List.empty[Long]
    val n = bridge.drainBatches(spark, batchSize = 10, readTimeoutMs = 200)(i => s"""{"v":$i}""") { df =>
      batches ::= df.count()
    }
    producer.join()
    assert(batches.sum == 25)
    assert(n == batches.size)
    assert(bridge.nextBatch() == None) // post-EOS stays closed
  }
}
