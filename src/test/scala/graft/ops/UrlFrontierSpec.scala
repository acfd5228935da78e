package graft.ops

import graft.SparkTestBase
import graft.core.StateStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class UrlFrontierSpec extends SparkTestBase {
  import spark.implicits._

  private def fetchCount(counter: java.util.concurrent.atomic.AtomicLong)(todo: DataFrame): DataFrame = {
    // count fetches through an accumulator-free side channel: the fetch
    // plan is executed exactly once per wave (runWave writes it, then
    // derives seen additions from the landed files)
    val n = todo.count()
    counter.addAndGet(n)
    todo.select(col("url_canon"), md5(col("url_canon")).as("content_hash"))
  }

  test("wave 2 fetches only unseen canonical URLs; surface variants collapse before the anti-join") {
    val dest = tmpDir("frontier")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def listing(ids: Range): DataFrame = ids.flatMap { g =>
      Seq(s"http://site$g.example.com/p/$g?a=1&b=2",
        s"HTTPS://WWW.SITE$g.EXAMPLE.COM/p/$g?a=1&b=2",
        s"https://site$g.example.com/p/$g/?b=2&a=1#frag")
    }.toDF("url")

    val w1 = UrlFrontier.runWave(spark, dest, state, listing(0 until 10), "url")(fetchCount(fetched))
    assert(w1.count() == 10 && fetched.get() == 10) // 30 surface forms, 10 pages

    val w2 = UrlFrontier.runWave(spark, dest, state, listing(0 until 15), "url")(fetchCount(fetched))
    assert(w2.count() == 5, "wave 2 must fetch only the 5 new pages")
    assert(fetched.get() == 15, "seen pages were re-fetched")
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 15)
  }

  test("uncommitted orphan generations are invisible and safely overwritten on retry") {
    val dest = tmpDir("frontier_crash")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    val urls = (0 until 6).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    UrlFrontier.runWave(spark, dest, state, urls.limit(3), "url")(fetchCount(fetched))

    // simulate a crash mid-wave-2: generation dirs written, pointer NOT
    // committed (stale content planted to prove the retry replaces it)
    Seq("zombie").toDF("url_canon").write.parquet(s"$dest/seen/g2")
    Seq(("zombie", "x")).toDF("url_canon", "content_hash").write.parquet(s"$dest/pages/g2")
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 3,
      "orphan generation leaked into the seen-set")

    // the retry wave reuses the g2 name, overwrites the orphans, commits
    val w2 = UrlFrontier.runWave(spark, dest, state, urls, "url")(fetchCount(fetched))
    assert(w2.select("url_canon").as[String].collect().toSet ==
      (3 until 6).map(g => s"site$g.example.com/p/$g").toSet)
    val seen = UrlFrontier.seenSet(spark, dest, state).as[String].collect().toSet
    assert(seen.size == 6 && !seen.contains("zombie"))
  }

  test("compaction bin-packs 10 generations into one; fetch-exactly-once holds across it") {
    val dest = tmpDir("frontier_compact")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def listing(n: Int): DataFrame =
      (0 until n).map(g => s"http://site$g.example.com/p/$g").toDF("url")

    // 10 growing waves → 10 committed seen generations
    (1 to 10).foreach(w =>
      UrlFrontier.runWave(spark, dest, state, listing(w * 5), "url")(fetchCount(fetched)))
    assert(fetched.get() == 50)
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def seenDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/seen"))
      .map(_.getPath.getName).sorted.toSeq
    assert(seenDirs.size == 10)

    val gens = UrlFrontier.compactSeen(spark, dest, state)
    assert(gens == Seq("g11"), s"monotonic-over-max merged name expected, got $gens")
    // superseded dirs are RETAINED by the compaction itself (a reader
    // that resolved the old list may still be scanning them) and swept
    // by an explicit gc once readers drain; the committed pages dirs are
    // NOT garbage — the sweep must only touch the seen side here
    assert(seenDirs.size == 11, s"superseded dirs must be retained for reader grace: $seenDirs")
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 50)
    assert(UrlFrontier.gc(spark, dest, state).sorted == (1 to 10).map(g => s"seen/g$g").sorted)
    assert(seenDirs == Seq("g11"))
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 50)
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 50,
      "seen compaction / gc must leave the committed pages archive intact")

    // the wave AFTER the compaction still fetches exactly the unseen pages
    val w11 = UrlFrontier.runWave(spark, dest, state, listing(60), "url")(fetchCount(fetched))
    assert(w11.count() == 10 && fetched.get() == 60, "compaction broke fetch-exactly-once")
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 60)
    // pages archive is untouched by seen compaction: one dir per wave
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/pages")).length == 11)
  }

  test("a crash mid-compaction leaves the committed list intact; the next wave overwrites the orphan") {
    val dest = tmpDir("frontier_compact_crash")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def listing(n: Int): DataFrame =
      (0 until n).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    UrlFrontier.runWave(spark, dest, state, listing(4), "url")(fetchCount(fetched))
    UrlFrontier.runWave(spark, dest, state, listing(8), "url")(fetchCount(fetched))

    // simulate the compaction crash: merged dir landed under the next
    // monotonic name (g3), pointer NOT committed — plus stale content to
    // prove the orphan is replaced, not read
    Seq("zombie").toDF("url_canon").write.parquet(s"$dest/seen/g3")
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 8,
      "orphan merged generation leaked into the seen-set")

    // the next wave targets g3, overwrites the orphan, and stays exact
    val w3 = UrlFrontier.runWave(spark, dest, state, listing(10), "url")(fetchCount(fetched))
    assert(w3.count() == 2 && fetched.get() == 10)
    val seen = UrlFrontier.seenSet(spark, dest, state).as[String].collect().toSet
    assert(seen.size == 10 && !seen.contains("zombie"))
    // and a RETRIED compaction (no crash this time) lands cleanly at g4
    assert(UrlFrontier.compactSeen(spark, dest, state) == Seq("g4"))
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 10)
    // a compaction that crashed AFTER its commit (pointer [g4], old dirs
    // g1..g3 undeleted) must not leak forever: the NEXT compaction's
    // entry sweep — or an explicit gc — reclaims everything unreferenced
    assert(UrlFrontier.gc(spark, dest, state).sorted ==
      Seq("seen/g1", "seen/g2", "seen/g3"))
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 10)
  }

  test("a crashed wave's orphan pages dir is swept before compaction consumes its number; committedPages stays exactly-once") {
    val dest = tmpDir("frontier_pages_orphan")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def listing(n: Int): DataFrame =
      (0 until n).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    UrlFrontier.runWave(spark, dest, state, listing(4), "url")(fetchCount(fetched))
    UrlFrontier.runWave(spark, dest, state, listing(8), "url")(fetchCount(fetched))

    // crash mid-wave-3: pages (and seen) landed under g3, pointer NOT
    // committed. Without the pages-side sweep, the following compaction
    // would consume g3 for its merged seen dir, stranding the orphan
    // pages/g3 forever — and its URLs re-land in the retry wave, so a raw
    // pages/* glob would show duplicates the frontier claims to exclude.
    (8 until 10).map(g => (s"site$g.example.com/p/$g", "stale"))
      .toDF("url_canon", "content_hash").write.parquet(s"$dest/pages/g3")
    (8 until 10).map(g => s"site$g.example.com/p/$g")
      .toDF("url_canon").write.parquet(s"$dest/seen/g3")
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 8,
      "orphan pages generation leaked into the committed archive")

    // compaction's entry sweep reclaims BOTH orphan sides, then merges at g3
    assert(UrlFrontier.compactSeen(spark, dest, state) == Seq("g3"))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def pagesDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/pages"))
      .map(_.getPath.getName).sorted.toSeq
    assert(pagesDirs == Seq("g1", "g2"), s"orphan pages dir survived the entry sweep: $pagesDirs")

    // the retry wave lands at g4 (past the consumed number) and the
    // archive — committed view AND raw glob — holds each URL exactly once
    val w3 = UrlFrontier.runWave(spark, dest, state, listing(10), "url")(fetchCount(fetched))
    assert(w3.count() == 2 && fetched.get() == 10)
    val archive = UrlFrontier.committedPages(spark, dest, state)
      .groupBy("url_canon").count().filter(col("count") > 1).count()
    assert(archive == 0, "committed pages archive duplicated a URL")
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 10)
    assert(spark.read.parquet(s"$dest/pages/*").count() == 10,
      "raw pages glob shows rows outside the committed archive")
    assert(pagesDirs == Seq("g1", "g2", "g4"))
  }

  test("pages compaction bin-packs the archive preserving row multiplicity; committedPages is the exactly-once read path") {
    val dest = tmpDir("frontier_pages_compact")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    def listing(n: Int): DataFrame =
      (0 until n).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    // fetch emits TWO rows per page (one per extracted item) — legal, and
    // the compaction rewrite must preserve the multiplicity bit-for-bit
    def fetch2(todo: DataFrame): DataFrame =
      todo.select(col("url_canon"), explode(array(lit("a"), lit("b"))).as("item"))
    (1 to 8).foreach(w => UrlFrontier.runWave(spark, dest, state, listing(w * 5), "url")(fetch2))

    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    def pagesDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/pages"))
      .map(_.getPath.getName).sorted.toSeq
    def pagesFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/pages"))
      .map(d => fs.listStatus(d.getPath).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))).sum
    assert(pagesDirs.size == 8)
    val filesBefore = pagesFiles
    val before = UrlFrontier.committedPages(spark, dest, state)
      .orderBy("url_canon", "item").collect().toSeq
    assert(before.size == 80, "8 waves x 40 urls x 2 items each")

    val gens = UrlFrontier.compactPages(spark, dest, state)
    assert(gens == Seq("g9"), s"monotonic-over-max merged pages name expected, got $gens")
    // reader grace: the superseded dirs are retained, so a raw glob
    // transiently shows DUPLICATES — exactly the hazard committedPages
    // protects against; the committed view is unchanged, bit-for-bit
    assert(pagesDirs.size == 9)
    assert(spark.read.parquet(s"$dest/pages/*").count() == 160,
      "raw glob should see old + merged dirs during the grace window")
    assert(UrlFrontier.committedPages(spark, dest, state)
      .orderBy("url_canon", "item").collect().toSeq == before)

    // gc sweeps the superseded dirs; the bin-pack shrank the file count
    assert(UrlFrontier.gc(spark, dest, state).sorted == (1 to 8).map(g => s"pages/g$g").sorted)
    assert(pagesDirs == Seq("g9"))
    assert(pagesFiles < filesBefore, s"bin-pack must shrink files: $filesBefore -> $pagesFiles")
    assert(UrlFrontier.committedPages(spark, dest, state)
      .orderBy("url_canon", "item").collect().toSeq == before)
    // seen side untouched: one dir per wave, membership intact
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 40)

    // fetch-exactly-once holds ACROSS the pages compaction
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    val w9 = UrlFrontier.runWave(spark, dest, state, listing(45), "url")(fetchCount(fetched))
    assert(w9.count() == 5 && fetched.get() == 5, "pages compaction broke fetch-exactly-once")
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 85)
  }

  test("a crash mid-pages-compaction leaves the committed archive intact; the retry lands cleanly") {
    val dest = tmpDir("frontier_pages_compact_crash")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def listing(n: Int): DataFrame =
      (0 until n).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    UrlFrontier.runWave(spark, dest, state, listing(4), "url")(fetchCount(fetched))
    UrlFrontier.runWave(spark, dest, state, listing(8), "url")(fetchCount(fetched))

    // crash: merged pages dir landed at the next monotonic name (g3),
    // pointer NOT committed — stale content proves it is never read
    Seq(("zombie", "x")).toDF("url_canon", "content_hash").write.parquet(s"$dest/pages/g3")
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 8)
    assert(!UrlFrontier.committedPages(spark, dest, state)
      .select("url_canon").as[String].collect().contains("zombie"))

    // the retry sweeps the orphan on entry and lands the merge at g3
    assert(UrlFrontier.compactPages(spark, dest, state) == Seq("g3"))
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 8)
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 8)
    // and the next wave advances past the merged name
    val w3 = UrlFrontier.runWave(spark, dest, state, listing(10), "url")(fetchCount(fetched))
    assert(w3.count() == 2 && fetched.get() == 10)
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 10)
  }

  test("waves and compaction are mutually excluded by the frontier lease") {
    val dest = tmpDir("frontier_lock")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    val urls = (0 until 4).map(g => s"http://site$g.example.com/p/$g").toDF("url")
    UrlFrontier.runWave(spark, dest, state, urls, "url")(fetchCount(fetched))

    // a live lease on the frontier root (another wave/compaction mid-
    // flight): both entry points must fail fast rather than interleave a
    // stale generation-list read-modify-write under the holder
    val lease = graft.core.TableLock.acquire(spark, dest, "other-writer")
    try {
      intercept[graft.core.TableLock.LockHeldException] {
        UrlFrontier.runWave(spark, dest, state, urls, "url")(fetchCount(fetched))
      }
      intercept[graft.core.TableLock.LockHeldException] {
        UrlFrontier.compactSeen(spark, dest, state)
      }
      intercept[graft.core.TableLock.LockHeldException] {
        UrlFrontier.compactPages(spark, dest, state)
      }
      intercept[graft.core.TableLock.LockHeldException] {
        UrlFrontier.gc(spark, dest, state)
      }
    } finally lease.release()
    // once released, the wave proceeds normally
    val w2 = UrlFrontier.runWave(spark, dest, state,
      (0 until 6).map(g => s"http://site$g.example.com/p/$g").toDF("url"), "url")(fetchCount(fetched))
    assert(w2.count() == 2 && fetched.get() == 6)
  }

  test("per-host cap shapes each wave and overflow carries over to the next") {
    val dest = tmpDir("frontier_polite")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    // host a: 5 urls, host b: 2, host c: 1 — cap 2 per host per wave
    val urls = (Seq.tabulate(5)(i => s"http://a.test/p$i") ++
      Seq("http://b.test/p0", "http://b.test/p1", "http://c.test/p0")).toDF("url")

    def hosts(df: DataFrame): Map[String, Set[String]] =
      df.select("url_canon").as[String].collect().toSet.groupBy(_.takeWhile(_ != '/'))

    val w1 = hosts(UrlFrontier.runWave(spark, dest, state, urls, "url", Some(2))(fetchCount(fetched)))
    // deterministic smallest-first selection, every host bounded at 2
    assert(w1 == Map(
      "a.test" -> Set("a.test/p0", "a.test/p1"),
      "b.test" -> Set("b.test/p0", "b.test/p1"),
      "c.test" -> Set("c.test/p0")))

    // overflow (a.test/p2..p4) was never marked seen — wave 2 re-presents
    // exactly it, again capped
    val w2 = hosts(UrlFrontier.runWave(spark, dest, state, urls, "url", Some(2))(fetchCount(fetched)))
    assert(w2 == Map("a.test" -> Set("a.test/p2", "a.test/p3")))

    val w3 = hosts(UrlFrontier.runWave(spark, dest, state, urls, "url", Some(2))(fetchCount(fetched)))
    assert(w3 == Map("a.test" -> Set("a.test/p4")))

    // exactly-once across the capped waves: 8 distinct pages, 8 fetches
    assert(fetched.get() == 8)
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 8)
    assert(UrlFrontier.committedPages(spark, dest, state).count() == 8)

    intercept[IllegalArgumentException] {
      UrlFrontier.runWave(spark, dest, state, urls, "url", Some(0))(fetchCount(fetched))
    }
  }

  test("wave-gap politeness: hosts fetched in wave W sit out the next g waves on the logical clock") {
    val dest = tmpDir("frontier_gap")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def urls(hosts: Seq[String], perHost: Int): DataFrame =
      hosts.flatMap(h => (0 until perHost).map(i => s"http://$h.test/p$i")).toDF("url")
    def hostsOf(df: DataFrame): Set[String] =
      df.select("url_canon").as[String].collect().map(_.takeWhile(_ != '.')).toSet

    // wave 1 plans only a,b — both fetched and marked on the wave clock
    val w1 = UrlFrontier.runWave(spark, dest, state, urls(Seq("a", "b"), 2), "url",
      minWaveGapPerHost = 1)(fetchCount(fetched))
    assert(hostsOf(w1) == Set("a", "b"))

    // wave 2 plans a,b,c with MORE urls for a,b — a,b are excluded (gap 1),
    // only the new host c fetches; a,b's new urls carry over unseen
    val all = urls(Seq("a", "b", "c"), 3)
    val w2 = UrlFrontier.runWave(spark, dest, state, all, "url",
      minWaveGapPerHost = 1)(fetchCount(fetched))
    assert(hostsOf(w2) == Set("c"), s"gap must exclude a,b: got ${hostsOf(w2)}")
    assert(w2.count() == 3)

    // wave 3: a,b served their one-wave silence and drain their carry-over;
    // c (fetched in wave 2) now sits out
    val w3 = UrlFrontier.runWave(spark, dest, state, all, "url",
      minWaveGapPerHost = 1)(fetchCount(fetched))
    assert(hostsOf(w3) == Set("a", "b"))
    assert(w3.count() == 2, "only the carry-over urls — earlier fetches stay seen")

    // exactly-once held throughout: 9 distinct pages, 9 fetches
    assert(fetched.get() == 9)
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 9)

    // retention: only the trailing window's host dirs remain on disk
    val hostDirs = new java.io.File(s"$dest/hosts").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(hostDirs == Set("w3"), s"trailing-window prune failed: $hostDirs")

    // a gap of 2 excludes both recent waves: w3's a,b AND (empty) w4 —
    // then everything is eligible again and the frontier is drained
    val w4 = UrlFrontier.runWave(spark, dest, state, all, "url",
      minWaveGapPerHost = 2)(fetchCount(fetched))
    assert(w4.isEmpty, "a,b fetched in wave 3 must sit out under gap 2")
    val w5 = UrlFrontier.runWave(spark, dest, state, all, "url",
      minWaveGapPerHost = 2)(fetchCount(fetched))
    assert(w5.isEmpty, "wave 5 still inside a,b's gap-2 window")
    val w6 = UrlFrontier.runWave(spark, dest, state, all, "url",
      minWaveGapPerHost = 2)(fetchCount(fetched))
    assert(w6.isEmpty && fetched.get() == 9, "frontier already drained — gap must not re-fetch")
  }

  test("gap=0 wave drains the host-set archive instead of leaving stale dirs for gc") {
    val dest = tmpDir("frontier_gap0")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    def urls(us: String*): DataFrame = us.toDF("url")

    // two gap waves accumulate host dirs + HostsKey entries
    UrlFrontier.runWave(spark, dest, state, urls("http://a.test/1"), "url",
      minWaveGapPerHost = 3)(fetchCount(fetched))
    UrlFrontier.runWave(spark, dest, state, urls("http://b.test/1"), "url",
      minWaveGapPerHost = 3)(fetchCount(fetched))
    def hostDirs: Set[String] = Option(new java.io.File(s"$dest/hosts").listFiles())
      .map(_.filter(_.isDirectory).map(_.getName).toSet).getOrElse(Set.empty)
    assert(hostDirs == Set("w1", "w2"))

    // gap turned off: the wave must clear the archive (dirs AND state) now,
    // not leave them lingering until an explicit gc()
    UrlFrontier.runWave(spark, dest, state, urls("http://c.test/1"), "url",
      minWaveGapPerHost = 0)(fetchCount(fetched))
    assert(hostDirs.isEmpty, s"stale host dirs survived a gap=0 wave: $hostDirs")

    // re-raising the gap starts its window FRESH (documented): hosts a,b,c
    // are all eligible; this wave records its own host set again
    val w4 = UrlFrontier.runWave(spark, dest, state,
      urls("http://a.test/2", "http://c.test/2"), "url",
      minWaveGapPerHost = 3)(fetchCount(fetched))
    assert(w4.count() == 2, "post-drain window must start fresh")
    assert(hostDirs == Set("w4"))
    assert(fetched.get() == 5)
  }

  test("parseRobotsTxt: group selection, merge, empty disallow, wildcards, comments") {
    val body =
      """# corp robots
        |User-agent: bigbot
        |Disallow: /private/
        |Allow: /private/pub
        |
        |User-agent: *
        |Disallow: /tmp/
        |Crawl-delay: 10
        |Disallow:
        |Disallow: /cgi/*.cgi
        |Sitemap: https://x/map.xml
        |
        |User-agent: bigbot
        |Disallow: /beta/   # trailing comment
        |""".stripMargin
    // exact agent: BOTH bigbot groups merge; '*' group ignored
    assert(UrlFrontier.parseRobotsTxt(body, "BigBot").toSet ==
      Set("disallow" -> "/private/", "allow" -> "/private/pub", "disallow" -> "/beta/"))
    // product-token matching: the version suffix strips before matching
    assert(UrlFrontier.parseRobotsTxt(body, "BigBot/2.1 (+https://x)").toSet ==
      Set("disallow" -> "/private/", "allow" -> "/private/pub", "disallow" -> "/beta/"))
    // no named group matches: fall back to '*'; empty disallow
    // contributes nothing; wildcard rules are KEPT verbatim;
    // crawl-delay/sitemap are not rules
    assert(UrlFrontier.parseRobotsTxt(body, "otherbot") ==
      Seq("disallow" -> "/tmp/", "disallow" -> "/cgi/*.cgi"))
    assert(UrlFrontier.parseRobotsTxt("", "any").isEmpty)
    // a rules line before any user-agent group is ignored (no group)
    assert(UrlFrontier.parseRobotsTxt("Disallow: /x\n", "any").isEmpty)
  }

  test("parseRobotsTxt: longest product-token prefix wins group selection") {
    val body =
      """User-agent: graft
        |Disallow: /short/
        |
        |User-agent: graftbot
        |Disallow: /long/
        |
        |User-agent: *
        |Disallow: /star/
        |""".stripMargin
    // 'graftbot' (len 8) beats 'graft' (len 5) beats '*'
    assert(UrlFrontier.parseRobotsTxt(body, "graftbot/1.0") ==
      Seq("disallow" -> "/long/"))
    // token 'graftbo' prefixes neither full value; 'graft' still matches
    assert(UrlFrontier.parseRobotsTxt(body, "graftbo") ==
      Seq("disallow" -> "/short/"))
    // 'graftling' is not a prefix OF the token and the token is not a
    // prefix of it either way that counts: group value must prefix the
    // crawler token, so only '*' applies
    assert(UrlFrontier.parseRobotsTxt(body, "graphbot") ==
      Seq("disallow" -> "/star/"))
    // grammar-invalid rule values (start with neither '/' nor '*') drop
    assert(UrlFrontier.parseRobotsTxt(
      "User-agent: *\nDisallow: cgi-bin\nDisallow: /ok\n", "any") ==
      Seq("disallow" -> "/ok"))
  }

  test("applyRobots: longest pattern wins, allow wins ties, no-match passes") {
    val rules = Seq(
      ("a.test", "disallow", "/private/"),
      ("a.test", "allow", "/private/pub/"),
      ("a.test", "disallow", "/private/pub/"), // tie with the allow: allow wins
      ("b.test", "disallow", "/"),
      ("b.test", "allow", "/ok/"),
    ).toDF("host", "rule", "pattern")
    val urls = Seq(
      "a.test/private/x",       // disallow /private/
      "a.test/private/pub/x",   // allow (longest + tie rule)
      "a.test/open/x",          // no match
      "a.test",                 // bare host: path '/', no match on a.test
      "b.test/anything",        // disallow /
      "b.test/ok/page",         // allow /ok/ beats disallow /
      "c.test/x",               // host with no rules at all
    ).toDF("url_canon")
    val kept = UrlFrontier.applyRobots(urls, "url_canon", rules)
      .as[String].collect().toSet
    assert(kept == Set("a.test/private/pub/x", "a.test/open/x", "a.test",
      "b.test/ok/page", "c.test/x"), kept)
  }

  test("applyRobots: wildcard and $-anchored patterns score by written length") {
    val rules = Seq(
      ("a.test", "disallow", "/*?sid="),   // any path carrying ?sid=
      ("a.test", "allow", "/pub/*?sid="),  // longer written pattern wins
      ("b.test", "disallow", "/*.html$"),  // end-anchored suffix rule
      ("c.test", "disallow", "/p/"),
      ("c.test", "allow", "/p/*2$"),       // len 6 allow beats len 4 disallow
    ).toDF("host", "rule", "pattern")
    val urls = Seq(
      "a.test/x?sid=1",        // disallowed by /*?sid=
      "a.test/pub/x?sid=1",    // allowed: /pub/*?sid= (len 11) wins
      "a.test/x?id=1",         // no match
      "b.test/a/x.html",       // disallowed (anchored)
      "b.test/a/x.html?q=1",   // NOT disallowed: $ anchor fails past .html
      "c.test/p/12",           // allowed: ends with 2
      "c.test/p/13",           // disallowed by /p/
      "c.test/q/13",           // no match
    ).toDF("url_canon")
    val kept = UrlFrontier.applyRobots(urls, "url_canon", rules)
      .as[String].collect().toSet
    assert(kept == Set("a.test/pub/x?sid=1", "a.test/x?id=1",
      "b.test/a/x.html?q=1", "c.test/p/12", "c.test/q/13"), kept)
  }

  test("runWave honors robots: disallowed URLs never fetch, never enter seen, and heal on rule change") {
    val dest = tmpDir("frontier_robots")
    val state = new StateStore(java.nio.file.Paths.get(dest, "s.json"))
    val fetched = new java.util.concurrent.atomic.AtomicLong()
    val urls = Seq("http://a.test/keep/1", "http://a.test/no/1", "http://b.test/x").toDF("url")
    val bodies = Seq(("a.test", "User-agent: *\nDisallow: /no/\n")).toDF("host", "robots_txt")
    val rules = UrlFrontier.robotsRules(bodies)

    val w1 = UrlFrontier.runWave(spark, dest, state, urls, "url",
      robots = Some(rules))(fetchCount(fetched))
    assert(w1.select("url_canon").as[String].collect().toSet ==
      Set("a.test/keep/1", "b.test/x"))
    assert(UrlFrontier.seenSet(spark, dest, state).count() == 2,
      "a disallowed URL must not enter the seen-set")

    // the site relaxes its robots: the held-back URL becomes eligible —
    // carry-over semantics, same as cap overflow
    val w2 = UrlFrontier.runWave(spark, dest, state, urls, "url",
      robots = Some(UrlFrontier.robotsRules(
        Seq(("a.test", "User-agent: *\nDisallow:\n")).toDF("host", "robots_txt"))))(
      fetchCount(fetched))
    assert(w2.select("url_canon").as[String].collect().toSet == Set("a.test/no/1"))
    assert(fetched.get() == 3, "exactly-once across rule changes")
  }

  test("MinK keeps the k smallest strings under any reduce/merge interleaving") {
    val agg = graft.functions.MinK.minKAgg(3)
    val items = Seq("m", "b", "z", "a", "q", "c", "b2")
    // sequential reduce
    val seq = items.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(seq) == Seq("a", "b", "b2"))
    // split + merge in both orders
    val (l, r) = items.splitAt(3)
    val bl = l.foldLeft(agg.zero)(agg.reduce)
    val br = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(bl, br)) == Seq("a", "b", "b2"))
    assert(agg.finish(agg.merge(br, bl)) == Seq("a", "b", "b2"))
    // fewer than k inputs
    assert(agg.finish(Seq("x", "w").foldLeft(agg.zero)(agg.reduce)) == Seq("w", "x"))
  }
}
