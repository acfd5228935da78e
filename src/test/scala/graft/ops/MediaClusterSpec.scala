package graft.ops

import graft.SparkTestBase

/** Pins the property that makes "cap + clusters, never the raw pair dump"
  * the corpus-scale media-dedup recipe: the bucket cap degrades pair
  * generation to a min-id-hub star, and because every bucket member still
  * verifies against the hub, transitive closure over the STAR edges
  * recovers exactly the connected components the uncapped O(n²) pair dump
  * would find — at O(n) pairs per bucket instead of O(n²). Gated
  * end-to-end by q_audio_clusters_capped / q_image_clusters_capped
  * against the DuckDB closure oracle; this spec pins the capped≡uncapped
  * component equality those queries rely on.
  */
class MediaClusterSpec extends SparkTestBase {
  import spark.implicits._

  private def toneClip(amps: Array[Double], frames: Int, gain: Double = 1.0): Array[Short] =
    Array.tabulate(1024 * frames) { t =>
      var sum = 0.0
      var b = 0
      while (b < amps.length) {
        sum += amps(b) * gain * math.sin(2.0 * math.Pi * (64 * b + 32) * t / 1024.0)
        b += 1
      }
      math.round(sum).toShort
    }

  private def components(clusters: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    clusters.select("id", "cluster").as[(Long, Long)].collect().toMap

  test("audio: closure over capped star pairs == closure over uncapped pairs") {
    // three acoustic families of 6 gain/duration variants each — every
    // family bucket (6 members at hamming 0) exceeds cap 4, so the star
    // fallback fires for ALL of them; plus a singleton that matches nothing
    val families = Seq(
      Array(300.0, 1200.0, 660.0, 2100.0, 420.0, 1800.0, 960.0, 1500.0),
      Array(2100.0, 300.0, 1800.0, 660.0, 1500.0, 420.0, 1200.0, 960.0),
      Array(960.0, 1500.0, 300.0, 1800.0, 2100.0, 660.0, 420.0, 1200.0),
    )
    val clips = (for {
      (amps, f) <- families.zipWithIndex
      v <- 0 until 6
    } yield (f * 10L + v,
      MediaCodecs.encodeWavPcm16(8000, toneClip(amps, 3 + v % 3, gain = 1.0 + 0.1 * v)))) :+
      (99L -> MediaCodecs.encodeWavPcm16(8000,
        toneClip(Array(1500.0, 420.0, 2100.0, 960.0, 300.0, 1800.0, 660.0, 1200.0), 4)))
    val df = clips.toDF("media_id", "content")

    val uncapped = Dedup.audioNearDups(df, "media_id", "content", maxDist = 3)
    val capped = Dedup.audioNearDups(df, "media_id", "content", maxDist = 3, maxBucketSize = 4)
    // the cap actually engaged: star emits ≤ n-1 pairs/family vs n(n-1)/2
    val nUncapped = uncapped.count()
    val nCapped = capped.count()
    assert(nUncapped == 3 * 15, s"expected full pair dump, got $nUncapped")
    assert(nCapped == 3 * 5, s"expected star pairs only, got $nCapped")
    assert(components(Dedup.clusterPairs(capped)) == components(Dedup.clusterPairs(uncapped)))
  }

  test("video: closure over capped star pairs == closure over uncapped pairs") {
    // two clip families of 6 brightness variants (constant offset — aHash
    // mean-threshold invariant, all frames hamming 0 per sampled
    // position) + one unrelated clip; 6-member frame-aligned buckets
    // exceed cap 4, so the per-frame star fires everywhere. Families
    // differ by x-GRADIENT, not by constant offset — a cross-family
    // constant offset would itself be an aHash invariance and merge them
    def clip(g: Int, v: Int): Array[Byte] =
      MediaCodecs.encodeGifGrayFrames(10, 8, 4,
        (f, x, y) => (13 * f + (7 + 6 * g) * x + 11 * y + v) % 256)
    val clips = (for { g <- 0 until 2; v <- 0 until 6 } yield (g * 10L + v, clip(g, v))) :+
      (99L -> MediaCodecs.encodeGifGrayFrames(10, 8, 4, (f, x, y) => (17 * x * y + f) % 256))
    val df = clips.toDF("media_id", "content")

    val uncapped = Dedup.videoNearDups(df, "media_id", "content",
      stride = 2, maxDist = 3, minMatches = 2)
    val capped = Dedup.videoNearDups(df, "media_id", "content",
      stride = 2, maxDist = 3, minMatches = 2, maxBucketSize = 4)
    assert(uncapped.count() == 2 * 15, s"expected full pair dump, got ${uncapped.count()}")
    assert(capped.count() == 2 * 5, s"expected star pairs only, got ${capped.count()}")
    assert(components(Dedup.clusterPairs(capped)) == components(Dedup.clusterPairs(uncapped)))
  }

  test("image: closure over capped star pairs == closure over uncapped pairs") {
    // two visual families of 5 brightness variants (constant gray offset —
    // aHash is mean-thresholded so the bits are identical) + a gradient
    // image that matches nothing
    def gray(f: (Int, Int) => Int): (Int, Int) => (Int, Int, Int) =
      (x, y) => { val v = f(x, y); (v, v, v) }
    val blobs = (for {
      f <- 0 until 2
      v <- 0 until 5
    } yield (f * 10L + v, MediaCodecs.encodeBmp24(16, 12,
      gray((x, y) => (f * 37 + 7 * x + 11 * y + v) % 256)))) :+
      (99L -> MediaCodecs.encodeBmp24(16, 12, gray((x, y) => (13 * x * y) % 256)))
    val df = blobs.toDF("media_id", "content")

    val uncapped = Dedup.imageNearDups(df, "media_id", "content", maxDist = 3)
    val capped = Dedup.imageNearDups(df, "media_id", "content", maxDist = 3, maxBucketSize = 4)
    assert(capped.count() < uncapped.count(), "cap did not engage")
    assert(components(Dedup.clusterPairs(capped)) == components(Dedup.clusterPairs(uncapped)))
  }
}
