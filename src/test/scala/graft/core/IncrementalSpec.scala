package graft.core

import graft.SparkTestBase

class IncrementalSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(
    (1L, "2024-01-01", "s1"),
    (2L, "2024-01-05", "s1"),
    (3L, "2024-01-10", "s2"),
    (4L, "2024-01-20", "s2"),
  ).toDF("id", "ts", "shard")

  test("filterWith applies (last, end) bounds") {
    val inc = Incremental(Seq("ts"), initialValue = Some("2024-01-01"), endValue = Some("2024-01-20"))
    val ids = inc.filterWith(df, None).select("id").as[Long].collect().toSet
    assert(ids == Set(2L, 3L)) // start exclusive, end exclusive
    val ids2 = inc.filterWith(df, Some("2024-01-05")).select("id").as[Long].collect().toSet
    assert(ids2 == Set(3L))
  }

  test("no initial value passes everything under end bound") {
    val inc = Incremental(Seq("ts"))
    assert(inc.filterWith(df, None).count() == 4)
  }

  test("coalesced cursor paths pick first non-null") {
    val d = Seq((1L, Some("2024-02-01"), "2024-01-01"), (2L, None, "2024-01-09"))
      .toDF("id", "a", "b")
    val inc = Incremental(Seq("a", "b"), initialValue = Some("2024-01-05"))
    val ids = inc.filterWith(d, None).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L))
  }

  test("nextCursor is the max (min when descending)") {
    val inc = Incremental(Seq("ts"))
    assert(inc.nextCursor(df).contains("2024-01-20"))
    assert(Incremental(Seq("ts"), descending = true).nextCursor(df).contains("2024-01-01"))
    assert(inc.nextCursor(df.limit(0)).isEmpty)
  }

  test("map-valued cursor: per-shard high-water marks") {
    val inc = Incremental(Seq("ts"))
    assert(inc.nextCursorBy(df, "shard") == Map("s1" -> "2024-01-05", "s2" -> "2024-01-20"))
  }

  test("startOutOfRange stops newest-first paging") {
    val inc = Incremental(Seq("ts"))
    assert(inc.startOutOfRange("2024-01-03", Some("2024-01-05")))
    assert(!inc.startOutOfRange("2024-01-07", Some("2024-01-05")))
    assert(!inc.startOutOfRange("2024-01-07", None))
  }

  test("cursor comparison is numeric when both sides parse as numbers") {
    val inc = Incremental(Seq("seq"))
    // lexicographically "100" <= "9" — numerically it is NOT out of range
    assert(!inc.startOutOfRange("100", Some("9")))
    assert(inc.startOutOfRange("8", Some("9")))
    assert(inc.startOutOfRange("9.5", Some("10")))
    // mixed / non-numeric values fall back to string ordering
    assert(Incremental.cursorLeq("abc", "abd"))
    assert(!Incremental.cursorLeq("2024-01-07", "2024-01-05"))
  }

  test("external scheduler window overrides state and end bounds (allow_external_schedulers)") {
    val inc = Incremental(Seq("ts"), initialValue = Some("1900-01-01"),
      endValue = Some("2099-01-01"), allowExternalSchedulers = true)
    try {
      // the orchestrator's interval [start, end): start INCLUSIVE (the
      // interval owns its boundary row), end exclusive; committed state
      // ("2024-01-19" would exclude id=3) is NOT consulted
      Incremental.setExternalWindow(Some("2024-01-05"), Some("2024-01-20"))
      assert(inc.externalWindowActive)
      val ids = inc.filterWith(df, Some("2024-01-19")).select("id").as[Long].collect().toSet
      assert(ids == Set(2L, 3L))
      // replacing a different active window without clearing is the
      // cross-pipeline contamination bug — guarded
      intercept[IllegalStateException] {
        Incremental.setExternalWindow(Some("2024-01-10"), None)
      }
      // open-ended interval (after an explicit clear)
      Incremental.clearExternalWindow()
      Incremental.setExternalWindow(Some("2024-01-10"), None)
      assert(inc.filterWith(df, None).select("id").as[Long].collect().toSet == Set(3L, 4L))
      // a cursor that did NOT opt in ignores the window entirely
      val noOptIn = inc.copy(allowExternalSchedulers = false)
      assert(!noOptIn.externalWindowActive)
      assert(noOptIn.filterWith(df, Some("2024-01-05")).select("id").as[Long].collect().toSet
        == Set(3L, 4L))
    } finally Incremental.clearExternalWindow()
    // window cleared: back to state semantics
    assert(!inc.externalWindowActive)
    assert(inc.filterWith(df, Some("2024-01-05")).select("id").as[Long].collect().toSet
      == Set(3L, 4L))
  }

  test("per-instance scheduler windows don't cross-contaminate concurrent pipelines") {
    // two cursors in the same JVM, each bound to its OWN interval — the
    // failure mode of the old JVM-global-only design was pipeline B's
    // window silently applying to pipeline A's cursor
    val a = Incremental(Seq("ts")).withSchedulerWindow(Some("2024-01-01"), Some("2024-01-10"))
    val b = Incremental(Seq("ts")).withSchedulerWindow(Some("2024-01-10"), Some("2024-01-21"))
    assert(a.externalWindowActive && b.externalWindowActive)
    val idsA = a.filterWith(df, None).select("id").as[Long].collect().toSet
    val idsB = b.filterWith(df, None).select("id").as[Long].collect().toSet
    assert(idsA == Set(1L, 2L))
    assert(idsB == Set(3L, 4L))
    // the partitioned intervals tile: no row in both, no row dropped
    assert((idsA & idsB).isEmpty)
    // instance window wins over the JVM-global injection
    try {
      Incremental.setExternalWindow(Some("1900-01-01"), None)
      assert(a.filterWith(df, None).select("id").as[Long].collect().toSet == Set(1L, 2L))
    } finally Incremental.clearExternalWindow()
  }

  test("external scheduler window mirrors bounds under descending cursors") {
    val inc = Incremental(Seq("ts"), descending = true, allowExternalSchedulers = true)
    try {
      Incremental.setExternalWindow(Some("2024-01-10"), Some("2024-01-01"))
      // descending interval: start inclusive from above, end exclusive below
      assert(inc.filterWith(df, None).select("id").as[Long].collect().toSet == Set(2L, 3L))
    } finally Incremental.clearExternalWindow()
  }
}
