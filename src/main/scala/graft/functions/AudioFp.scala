package graft.functions

/** 64-bit audio fingerprint: frame-energy delta signs — the classic
  * acoustic-fingerprint shape (Haitsma–Kalker's energy-difference
  * bits, collapsed to one band) in INTEGER-EXACT form:
  *
  *   - the signal is cut into 64 equal frames; frame t's energy
  *     E_t = Σ s² is a Long (16-bit samples square to ≤ 2³⁰; frames
  *     of < 2³³ samples cannot overflow — far beyond any real frame);
  *   - bit t (1 ≤ t ≤ 63) is set iff E_t > E_{t−1}; bit 0 is always 0.
  *
  * The invariance this buys is exact by construction, not by FP
  * luck: scaling every sample by an integer factor m (no clipping)
  * multiplies every E_t by exactly m², and sign(m²·E_t − m²·E_{t−1})
  * = sign(E_t − E_{t−1}) in integer arithmetic — so volume-scaled
  * re-encodes of a recording fingerprint IDENTICALLY (Hamming 0).
  * There is no floating point anywhere in this function, which is
  * why q176's oracle can pin hamming 0 with zero tie-noise caveats
  * (contrast [[Phash]], which needs integer rounding to kill FP tie
  * noise at the median).
  *
  * Equal adjacent energies give bit 0 under strict `>` — also
  * preserved exactly under scaling (m²·E_t = m²·E_{t−1} iff
  * E_t = E_{t−1}). Cost: one pass over the samples per blob — a
  * narrow map, no shuffle.
  */
object AudioFp {

  /** Number of frames = number of fingerprint positions. */
  val Frames = 64

  /** Fingerprint a PCM signal. The tail `samples.length mod 64` is
    * ignored (every frame spans exactly length/64 samples), and a
    * signal shorter than 64 samples is refused by name — a fingerprint
    * of empty frames would be all-zero and collide with every other
    * short signal.
    */
  def fingerprint64(samples: Array[Short]): Long = {
    require(samples.length >= Frames,
      s"fingerprint64: need at least $Frames samples, got ${samples.length}")
    val flen = samples.length / Frames
    val e = new Array[Long](Frames)
    var t = 0
    while (t < Frames) {
      var acc = 0L
      var j = t * flen
      val end = j + flen
      while (j < end) { val s = samples(j).toLong; acc += s * s; j += 1 }
      e(t) = acc
      t += 1
    }
    var h = 0L
    t = 1
    while (t < Frames) {
      if (e(t) > e(t - 1)) h |= (1L << t)
      t += 1
    }
    h
  }

  /** Frame count of the 128-bit fingerprint. */
  val Frames128 = 128

  /** 128-bit variant: 128 frames, 127 energy-delta bits — the
    * corpus-scale fingerprint q176's banded join keys on. The 64-bit
    * form's 4×16-bit band keys go all-hot past ~cap·2^16 ≈ 3.3M
    * recordings (average occupancy exceeds the hot cap, so the skew
    * guard becomes wholesale suppression); 128 bits band as 4×32-bit
    * keys, moving the cliff to ~cap·2^32 ≈ 2·10^11 — two orders above
    * a 100 TB audio corpus. Same Haitsma–Kalker shape, same
    * integer-exact m²-scaling invariance argument bit for bit (every
    * E_t is a Long; scaling by integer m multiplies each by exactly
    * m²); bit t lives in word t/64 at position t%64, bit 0 pinned 0.
    * [[fingerprint64]] remains for the legacy-cliff comparison probes.
    */
  def fingerprint128(samples: Array[Short]): (Long, Long) = {
    require(samples.length >= Frames128,
      s"fingerprint128: need at least $Frames128 samples, " +
        s"got ${samples.length}")
    val flen = samples.length / Frames128
    val e = new Array[Long](Frames128)
    var t = 0
    while (t < Frames128) {
      var acc = 0L
      var j = t * flen
      val end = j + flen
      while (j < end) { val s = samples(j).toLong; acc += s * s; j += 1 }
      e(t) = acc
      t += 1
    }
    var h0 = 0L
    var h1 = 0L
    t = 1
    while (t < Frames128) {
      if (e(t) > e(t - 1)) {
        if (t < 64) h0 |= (1L << t) else h1 |= (1L << (t - 64))
      }
      t += 1
    }
    (h0, h1)
  }
}
