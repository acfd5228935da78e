package graft.ops

import graft.SparkTestBase

/** Audio DSP kernels + spectral rank fingerprint + the banded near-dup
  * pair semantics over real WAV blobs.
  */
class AudioSpec extends SparkTestBase {
  import spark.implicits._

  /** Sum of bin-aligned sine tones: band b at bin 64b+32 of a 1024 frame. */
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

  test("fftInPlace matches the naive DFT on a random signal") {
    val n = 256
    val rnd = new scala.util.Random(11)
    val x = Array.fill(n)(rnd.nextGaussian() * 100)
    val re = x.clone(); val im = new Array[Double](n)
    Audio.fftInPlace(re, im)
    var k = 0
    while (k < n) {
      var dr = 0.0; var di = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        dr += x(t) * math.cos(ang); di += x(t) * math.sin(ang)
        t += 1
      }
      assert(math.abs(re(k) - dr) < 1e-6 && math.abs(im(k) - di) < 1e-6,
        s"bin $k: fft (${re(k)}, ${im(k)}) vs dft ($dr, $di)")
      k += 1
    }
  }

  test("power spectrum of a bin-aligned tone concentrates at its bin with analytic energy") {
    val a = 1000.0
    val clip = toneClip(Array(0, 0, a, 0, 0, 0, 0, 0), frames = 2)
    val ps = Audio.powerSpectrum(clip.map(_.toDouble), 1024).get
    val bin = 64 * 2 + 32
    val analytic = math.pow(1024 * a / 2.0, 2)
    assert(math.abs(ps(bin) - analytic) / analytic < 1e-3)
    // everything off-tone is quantization noise, orders of magnitude down
    ps.zipWithIndex.filter(_._2 != bin).foreach { case (e, k) =>
      assert(e < analytic * 1e-6, s"bin $k leaked $e")
    }
  }

  test("rank fingerprint: invariant under gain and duration; bit layout is the upper triangle") {
    val amps = Array(300.0, 1200.0, 660.0, 2100.0, 420.0, 1800.0, 960.0, 1500.0)
    def fp(frames: Int, gain: Double): Long = {
      val samples = toneClip(amps, frames, gain).map(_.toDouble)
      Audio.rankFingerprint(Audio.bandEnergies(Audio.powerSpectrum(samples, 1024).get, 8))
    }
    val base = fp(3, 1.0)
    assert(base == fp(5, 1.0), "duration changed the fingerprint")
    assert(base == fp(4, 1.4), "gain changed the fingerprint")
    // recompute expected bits straight from the amplitude order
    var expect = 0L; var bp = 0
    for (i <- 0 until 8; j <- i + 1 until 8) {
      if (amps(i) > amps(j)) expect |= 1L << bp
      bp += 1
    }
    assert(base == expect)
  }

  test("decodeWavSamples: mono round-trips exactly, stereo averages frames") {
    val mono = Array.tabulate(300)(i => ((i * 91) % 4001 - 2000).toShort)
    val (_, got) = MediaCodecs.decodeWavSamples(MediaCodecs.encodeWavPcm16(8000, mono))
    assert(got.toSeq == mono.map(_.toDouble).toSeq)
    val stereo = Array[Short](100, 200, -50, 50, 7, 8) // 3 L/R frames
    val (info, avg) = MediaCodecs.decodeWavSamples(
      MediaCodecs.encodeWavPcm16(44100, stereo, channels = 2))
    assert(info.channels == 2 && avg.toSeq == Seq(150.0, 0.0, 7.5))
  }

  test("spectralHashBands quarantines junk and sub-frame clips") {
    assert(Audio.spectralHashBands("not a wav".getBytes).isEmpty)
    assert(Audio.spectralHashBands(
      MediaCodecs.encodeWavPcm16(8000, Array.fill[Short](100)(5))).isEmpty)
  }

  test("audioNearDups: gain/duration variants pair at hamming 0, different mixes stay apart, junk survives") {
    val ampsA = Array(300.0, 1200.0, 660.0, 2100.0, 420.0, 1800.0, 960.0, 1500.0)
    val ampsB = ampsA.reverse // inverted rank order: fingerprint far away
    val clips = Seq(
      1L -> MediaCodecs.encodeWavPcm16(8000, toneClip(ampsA, 3)),
      2L -> MediaCodecs.encodeWavPcm16(8000, toneClip(ampsA, 5, gain = 1.3)),
      3L -> MediaCodecs.encodeWavPcm16(8000, toneClip(ampsB, 3)),
      4L -> Array[Byte](82, 73, 70, 70), // truncated RIFF: quarantined
    ).toDF("media_id", "content")
    val pairs = Dedup.audioNearDups(clips, "media_id", "content", maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }
}
