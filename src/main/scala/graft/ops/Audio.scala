package graft.ops

/** Audio DSP kernels for the multimodal dedup path: a real radix-2 FFT,
  * framed power spectra, and a gain/duration-invariant spectral rank
  * fingerprint. The audio analogue of `MediaCodecs.aHashBands` (the image
  * perceptual hash): `Dedup.audioNearDups` feeds these bands into the same
  * banded-Hamming candidate machinery.
  *
  * Reference behavior modeled: the unstructured/media ingestion flows
  * (`sources/unstructured_data/__init__.py`, `sources/mux/__init__.py`)
  * treat audio as opaque blobs with typed metadata; the dedup op this file
  * enables is the training-data-pipeline extension on top — finding
  * near-identical clips (re-encodes, gain changes, truncations) without
  * ever shuffling the blobs themselves.
  *
  * Scale shape: everything here runs inside one narrow `mapPartitions`
  * over (id, bytes); only (id, 4 smallint band keys) ever shuffles.
  */
object Audio {

  /** In-place iterative radix-2 Cooley–Tukey FFT. `re.length` must be a
    * power of two and `im.length == re.length`. Standard DIT form:
    * bit-reversal permutation then log2(n) butterfly passes. Twiddles are
    * computed per block from `Math.cos/sin` — deterministic across JVMs
    * (StrictMath-backed intrinsics are exact for these arguments' range
    * per the Java SE floating-point spec... but we do NOT rely on ULP
    * determinism anywhere: every consumer compares ENERGIES with margins
    * far above float noise).
    */
  def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT size must be a power of two, got $n")
    require(im.length == n, "re/im length mismatch")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Average power spectrum over all complete non-overlapping `nFft`
    * frames: |X[k]|^2 for k in [0, nFft/2), summed per frame and divided
    * by the frame count. Rectangular window — the fingerprint compares
    * band energies against each other (never against a threshold), so
    * spectral leakage shifts both sides of every comparison together.
    * Returns None when the clip is shorter than one frame.
    */
  def powerSpectrum(samples: Array[Double], nFft: Int): Option[Array[Double]] = {
    val frames = samples.length / nFft
    if (frames == 0) return None
    val acc = new Array[Double](nFft / 2)
    var f = 0
    while (f < frames) {
      val re = java.util.Arrays.copyOfRange(samples, f * nFft, (f + 1) * nFft)
      val im = new Array[Double](nFft)
      fftInPlace(re, im)
      var k = 0
      while (k < nFft / 2) { acc(k) += re(k) * re(k) + im(k) * im(k); k += 1 }
      f += 1
    }
    var k = 0
    while (k < acc.length) { acc(k) /= frames; k += 1 }
    Some(acc)
  }

  /** Fold a power spectrum into `nBands` equal-width band energies. */
  def bandEnergies(spectrum: Array[Double], nBands: Int): Array[Double] = {
    val width = spectrum.length / nBands
    require(width > 0, s"spectrum of ${spectrum.length} bins cannot carry $nBands bands")
    val out = new Array[Double](nBands)
    var k = 0
    while (k < width * nBands) { out(k / width) += spectrum(k); k += 1 }
    out
  }

  /** Spectral RANK fingerprint: one bit per ordered band pair (i < j),
    * set when E_i > E_j, packed as bit index
    * `i*(nBands-1) - i*(i-1)/2 + (j-i-1)` (row-major upper triangle).
    * Rank order is invariant under gain (all energies scale by gain^2)
    * and under duration (frame-averaged energies), which is exactly the
    * near-dup equivalence a clip corpus needs. 8 bands -> 28 bits.
    */
  def rankFingerprint(energies: Array[Double]): Long = {
    val n = energies.length
    require(n * (n - 1) / 2 <= 64, s"$n bands need ${n * (n - 1) / 2} bits > 64")
    var fp = 0L; var bp = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (energies(i) > energies(j)) fp |= 1L << bp
        bp += 1; j += 1
      }
      i += 1
    }
    fp
  }

  /** Container dispatch for the fingerprint path: a magic-byte sniff
    * routes each blob to its sample decoder. Supported-container
    * contract: WAV/RIFF PCM16 is the only container a JDK-only build can
    * decode; compressed codecs (MP3, AAC, Opus, and every H.264-class
    * video track) genuinely need external libraries, so their blobs
    * quarantine DELIBERATELY at the dispatch — `None` by sniff, never by
    * decode exception — and a future decoder slots in as one more case
    * here without touching `Dedup.audioNearDups`. Returns
    * (container info, mono samples).
    */
  def decodeSamples(bytes: Array[Byte]): Option[(MediaCodecs.WavInfo, Array[Double])] =
    if (bytes.length >= 4 && bytes(0) == 'R'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte && bytes(3) == 'F'.toByte)
      try Some(MediaCodecs.decodeWavSamples(bytes))
      catch { case scala.util.control.NonFatal(_) => None } // malformed RIFF: corrupt-quarantine
    else None // unsupported container: quarantined by dispatch, not by failure

  /** Decode an audio blob (via the [[decodeSamples]] container dispatch)
    * and produce the 4 banded keys of its 28-bit spectral rank
    * fingerprint (7 bits per band) — the audio twin of
    * `MediaCodecs.aHashBands`. Pigeonhole over 4 bands guarantees any
    * pair within Hamming distance <= 3 shares at least one band key, so
    * banded candidate generation has perfect recall at that radius.
    * Unsupported containers, undecodable blobs, and sub-frame-length
    * clips quarantine as None.
    */
  def spectralHashBands(bytes: Array[Byte], nFft: Int = 1024,
      nBands: Int = 8): Option[Array[Int]] =
    decodeSamples(bytes).flatMap { case (_, samples) =>
      powerSpectrum(samples, nFft).map { ps =>
        val fp = rankFingerprint(bandEnergies(ps, nBands))
        val bits = nBands * (nBands - 1) / 2
        val per = (bits + 3) / 4
        Array.tabulate(4)(b => ((fp >>> (b * per)) & ((1L << per) - 1)).toInt)
      }
    }
}
