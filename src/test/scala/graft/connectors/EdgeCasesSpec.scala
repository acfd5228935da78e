package graft.connectors

import graft.SparkTestBase
import graft.connectors.rest.Json
import graft.core.{Incremental, Naming}
import graft.connectors.sources.Fleet
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll

class EdgeCasesSpec extends SparkTestBase {
  import spark.implicits._

  test("Json.select edge cases: empty arrays, nulls, numeric leaves, missing branches") {
    val n = Json.parse("""{"a":[],"b":null,"c":{"d":5},"e":[{"x":1}]}""")
    assert(Json.items(n, "a").isEmpty)
    assert(Json.selectString(n, "b").isEmpty)
    assert(Json.selectString(n, "c.d").contains("5"))
    assert(Json.select(n, "e[*].x").map(_.asInt()) == Seq(1))
    assert(Json.select(n, "z.y.x").isEmpty)
    assert(Json.items(Json.parse("""{"data":{"k":1}}"""), "data").size == 1) // single obj unwrap
  }

  test("Json.select rejects non-numeric bracket indices with a config error") {
    val n = Json.parse("""{"data":[1,2,3]}""")
    val e = intercept[IllegalArgumentException](Json.select(n, "data[abc]"))
    assert(e.getMessage.contains("data[abc]") && e.getMessage.contains("abc"))
  }

  test("Json.select rejects 3-part slices instead of silently ignoring the step") {
    val n = Json.parse("""{"data":[1,2,3,4]}""")
    val e = intercept[IllegalArgumentException](Json.select(n, "data[1:2:3]"))
    assert(e.getMessage.contains("steps are not supported"))
    // 2-part slices still work, including negative indices
    assert(Json.select(n, "data[-1:]").map(_.asInt()) == Seq(4))
  }

  test("naming normalization is always a valid stable identifier (property)") {
    val gen = Gen.listOfN(12, Gen.frequency(
      6 -> Gen.alphaNumChar, 2 -> Gen.oneOf('_', '-', ' ', '.'), 1 -> Gen.oneOf('ü', '™', '/')))
      .map(_.mkString)
    val prop = forAll(gen) { s =>
      val out = Naming.normalize(s)
      out.nonEmpty && out.length <= Naming.MaxLength &&
        out.forall(c => c.isLower || c.isDigit || c == '_') == out.forall(c => !c.isUpper) &&
        Naming.normalize(out) == out // idempotent
    }
    assert(org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, prop).passed)
  }

  test("descending cursor with end bound selects the open window") {
    val df = Seq((1L, "05"), (2L, "10"), (3L, "15"), (4L, "20")).toDF("id", "v")
    // descending: move from high to low; last committed 20, stop before 05
    val inc = Incremental(Seq("v"), initialValue = Some("20"), endValue = Some("05"), descending = true)
    assert(inc.filterWith(df, None).select("id").as[Long].collect().toSet == Set(2L, 3L))
    assert(inc.nextCursor(df) == Some("05")) // min when descending
  }

  test("zendesk talk resources use the stream protocol with merge semantics") {
    val z = Fleet.zendesk("sub", "e", "t")
    val calls = z.resources.find(_.name == "calls_incremental").get
    calls.endpoint.paginator match {
      case graft.connectors.rest.RestEngine.Paginator.StartTime(next, start, _) =>
        assert(next == "next_start_time" && start == "start_time")
      case other => fail(s"unexpected paginator $other")
    }
    assert(calls.hints.primaryKey == Seq("id"))
  }
}
