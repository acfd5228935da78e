package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Image near-dup dedup: average-hash invariances and the banded-bucket
  * pair semantics.
  */
class ImageDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def gradient(w: Int, h: Int)(x: Int, y: Int): (Int, Int, Int) = {
    val v = (13 + 7 * x + 11 * y) % 256; (v, v, v)
  }

  test("aHash is invariant under exact pixel doubling (dimension-invariance of the NN grid)") {
    val base = MediaCodecs.encodeBmp24(10, 9, gradient(10, 9))
    // each source pixel duplicated 2x2: sample x' = (i*2w)/8, then the
    // source coord x'/2 = floor(i*w/8) — the same grid cell as the base
    val doubled = MediaCodecs.encodeBmp24(20, 18, (x, y) => gradient(10, 9)(x / 2, y / 2))
    val hb = MediaCodecs.aHashBands(base).get
    val hd = MediaCodecs.aHashBands(doubled).get
    assert(hb.toSeq == hd.toSeq)
  }

  test("aHash quarantines undecodable blobs as None") {
    assert(MediaCodecs.aHashBands(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(MediaCodecs.aHashBands(Array.empty[Byte]).isEmpty)
  }

  test("imageNearDups pairs the doubled twin at hamming 0, excludes the inverted image, survives junk") {
    val imgs = Seq(
      1L -> MediaCodecs.encodeBmp24(10, 9, gradient(10, 9)),
      2L -> MediaCodecs.encodeBmp24(20, 18, (x, y) => gradient(10, 9)(x / 2, y / 2)),
      3L -> MediaCodecs.encodeBmp24(10, 9, (x, y) => { // inverted gradient
        val (v, _, _) = gradient(10, 9)(x, y); val iv = 255 - v; (iv, iv, iv)
      }),
      4L -> Array[Byte](9, 9, 9), // undecodable: must quarantine, not fail the job
    )
    val df = imgs.toDF("media_id", "content")
    val pairs = Dedup.imageNearDups(df, "media_id", "content", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists { case (a, b, _) => a == 3L || b == 3L || a == 4L || b == 4L })
  }

  test("degenerate-bucket cap: an identical-hash mega-mass stars around its min id, bounded work") {
    // 50 identical blank images (the real-corpus degenerate case) + one
    // distinct gradient; cap 8 forces the star fallback. The mass must
    // yield exactly the 49 hub spokes at hamming 0 (not C(50,2) = 1225
    // all-pairs), which downstream clustering closes into one component.
    val blank = MediaCodecs.encodeBmp24(8, 8, (_, _) => (128, 128, 128))
    val imgs = (1L to 50L).map(_ -> blank) :+ (99L -> MediaCodecs.encodeBmp24(10, 9, gradient(10, 9)))
    val pairs = Dedup.imageNearDups(imgs.toDF("media_id", "content"),
      "media_id", "content", maxDist = 3, maxBucketSize = 8)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.length == 49)
    assert(pairs.forall { case (a, _, h) => a == 1L && h == 0L })
    assert(pairs.map(_._2).toSet == (2L to 50L).toSet)
  }

  test("a pair within distance 3 always shares a band (pigeonhole recall guarantee)") {
    // construct two hashes differing in exactly 3 bits spread over 3 bands:
    // they still share the 4th band, so the banded join must emit the pair
    val a = Array(0x0f0f, 0x1234, 0x00ff, 0x4242)
    val b = Array(0x0f0e, 0x1235, 0x00fe, 0x4242) // 3 bits flipped, band 4 equal
    val ham = a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(ham == 3)
    assert(a.zip(b).exists { case (x, y) => x == y })
  }
}
