package graft.ops

import graft.SparkTestBase

/** Video (GIF) near-dup: per-frame hash kernel and the aligned-frame
  * banded pair semantics.
  */
class VideoDedupSpec extends SparkTestBase {
  import spark.implicits._

  /** Per-frame gray animation with frame-dependent STRUCTURE (the x slope
    * changes per frame) and a wrap-free range [40, 239] — a uniform gray
    * offset up to +16 provably preserves every aHash bit (the mean shifts
    * with the pixels).
    */
  private def anim(f: Int, x: Int, y: Int): Int =
    40 + ((17 + 13 * f) * x + 11 * y) % 200

  test("gifFrameHashBands samples at stride and agrees with the BMP aHash of the same raster") {
    val gif = MediaCodecs.encodeGifGrayFrames(12, 10, 5, anim)
    val hs = MediaCodecs.gifFrameHashBands(gif, stride = 2).get
    assert(hs.map(_._1) == Seq(0, 2, 4))
    // frame 2 rendered as a BMP must hash identically (shared grid core)
    val bmp = MediaCodecs.encodeBmp24(12, 10, (x, y) => {
      val v = anim(2, x, y); (v, v, v)
    })
    assert(hs(1)._2.toSeq == MediaCodecs.aHashBands(bmp).get.toSeq)
  }

  test("gifFrameHashBands quarantines undecodable blobs") {
    assert(MediaCodecs.gifFrameHashBands(Array[Byte](71, 73, 70, 1), 2).isEmpty)
  }

  test("container dispatch: non-GIF video containers quarantine by sniff, not by decode failure") {
    // a WELL-FORMED container of an unsupported format (MP4 ftyp box):
    // the magic-byte dispatch returns None deliberately — distinct from
    // the corrupt-GIF exception path — so a future decoder slots into
    // MediaCodecs.videoFrameHashBands without touching Dedup
    val mp4ish = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("ISO-8859-1") ++
      Array.fill[Byte](12)(0)
    assert(MediaCodecs.videoFrameHashBands(mp4ish, 2).isEmpty)
    // the supported container still routes through the same dispatch
    val gif = MediaCodecs.encodeGifGrayFrames(8, 8, 4, (f, x, y) => (f * 30 + x + y) % 256)
    assert(MediaCodecs.videoFrameHashBands(gif, 2).exists(_.map(_._1) == Seq(0, 2)))
  }

  test("videoNearDups: aligned variants pair with matched-frame count, shifted/different clips do not, junk survives") {
    val clips = Seq(
      // A: the base animation, 5 frames (stride 2 samples 0, 2, 4)
      1L -> MediaCodecs.encodeGifGrayFrames(12, 10, 5, anim),
      // B: uniform +3 gray (wrap-free) -> every aligned frame at hamming 0
      2L -> MediaCodecs.encodeGifGrayFrames(12, 10, 5, (f, x, y) => anim(f, x, y) + 3),
      // C: a different slope family entirely
      3L -> MediaCodecs.encodeGifGrayFrames(12, 10, 5, (f, x, y) =>
        40 + ((5 + 29 * f) * y + 3 * x * x) % 200),
      // D: A's animation advanced one frame -> aligned positions compare
      // STRUCTURALLY different frames (slope 17+13(f+1) vs 17+13f)
      4L -> MediaCodecs.encodeGifGrayFrames(12, 10, 5, (f, x, y) => anim(f + 1, x, y)),
      5L -> Array[Byte](71, 73, 70), // truncated: quarantined
    ).toDF("media_id", "content")
    val got = Dedup.videoNearDups(clips, "media_id", "content",
      stride = 2, maxDist = 3, minMatches = 2)
      .select("id_a", "id_b", "n_frames").as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 2L, 3L)), s"aligned variant pair missing: $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), s"unrelated clip paired: $got")
    assert(!got.exists(p => (p._1, p._2) == (1L, 4L)), s"shifted clip paired aligned: $got")
  }

  test("videoNearDups counts only positions within maxDist (minMatches gates the pair)") {
    // E shares A's frames 0 and 2 but replaces frame 4 with a different
    // pattern: 2 aligned matches -> passes minMatches=2; fails minMatches=3
    val a = MediaCodecs.encodeGifGrayFrames(12, 10, 5, anim)
    val e = MediaCodecs.encodeGifGrayFrames(12, 10, 5, (f, x, y) =>
      if (f == 4) 40 + (23 * y + 7 * x * y) % 200 else anim(f, x, y))
    val clips = Seq(1L -> a, 2L -> e).toDF("media_id", "content")
    val loose = Dedup.videoNearDups(clips, "media_id", "content", 2, 3, 2)
      .select("id_a", "id_b", "n_frames").as[(Long, Long, Long)].collect().toSet
    assert(loose == Set((1L, 2L, 2L)), s"got $loose")
    val strict = Dedup.videoNearDups(clips, "media_id", "content", 2, 3, 3)
      .count()
    assert(strict == 0)
  }
}
