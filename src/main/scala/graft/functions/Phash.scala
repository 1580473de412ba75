package graft.functions

/** 64-bit perceptual image hash (pHash): 32×32 luma raster → 2-D
  * DCT-II → top-left 8×8 low-frequency corner → median threshold.
  * The classic perceptual-hash recipe (pHash.org's published
  * algorithm), computed here exactly so its one provable invariance
  * can carry an oracle:
  *
  *   - the DCT basis vectors for frequency u ≥ 1 are orthogonal to
  *     the constant vector (Σ_{x=0}^{31} cos((2x+1)uπ/64) = 0), so a
  *     GLOBAL BRIGHTNESS SHIFT of the raster changes only the (0,0)
  *     DC coefficient;
  *   - the hash thresholds the 63 AC coefficients of the 8×8 corner
  *     against their own median and pins the DC bit to 0, so that
  *     shift leaves every bit unchanged.
  *
  * Brightness-shifted re-encodes of an image therefore hash
  * IDENTICALLY (Hamming 0) — the property q175's planted media table
  * certifies end-to-end through a real JPEG encode/decode cycle.
  * Unlike [[graft.ops.Dedup]]'s text SimHash (a random-projection
  * sketch whose distance is probabilistic), this hash's planted-dup
  * distances are exact consequences of DCT linearity.
  *
  * The DCT is unnormalized (no orthonormal scale factors): the median
  * threshold compares coefficients only against each other, so a
  * per-coefficient positive scale is dead weight. Coefficients are
  * ROUNDED TO INTEGERS before the threshold: block-structured content
  * produces coefficients that are mathematically EQUAL (frequency-4
  * rows/columns of an 8×8-blocked raster are exactly zero — 15 of the
  * 63 AC values on such images), and the median routinely lands inside
  * that tie cluster, where raw doubles carry ~1e-13 summation noise
  * that would decide `>` by floating-point luck and break the shift
  * law above. Rounding collapses mathematically-equal values to the
  * same Long (magnitudes here are O(10⁴) with ~1e-11 absolute noise —
  * eleven orders below the rounding boundary), making every tie
  * deterministic. Cost is 32·8 + 8·8 dot products of length 32 per
  * image — a pure per-blob map, no shuffle anywhere near it.
  */
object Phash {

  /** Raster side the hash is defined over. Callers decode/resize to
    * this; [[phash64]] refuses anything else by name.
    */
  val Side = 32

  // cos((2x+1)·u·π / (2·Side)) for the 8 retained frequencies u over
  // the Side sample positions — shared by the row and column passes
  // (the 2-D DCT-II kernel is separable).
  private val cosT: Array[Array[Double]] =
    Array.tabulate(8, Side)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / (2.0 * Side)))

  /** Hash a Side×Side luma raster (row-major, values 0–255). Bit
    * j = 8·v + u (v = vertical frequency, u = horizontal) is set iff
    * coefficient (v,u) exceeds the median of the 63 AC coefficients;
    * bit 0 (DC) is always 0. Strict `>` makes the median element's
    * own bit 0 — ties are deterministic, not platform luck.
    */
  def phash64(luma: Array[Int]): Long = {
    require(luma.length == Side * Side,
      s"phash64: expected a $Side×$Side raster (${Side * Side} " +
        s"values), got ${luma.length}")
    // row pass: per image row y, the first 8 1-D DCT coefficients
    val rowC = Array.ofDim[Double](Side, 8)
    var y = 0
    while (y < Side) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < Side) { acc += luma(y * Side + x) * cosT(u)(x); x += 1 }
        rowC(y)(u) = acc
        u += 1
      }
      y += 1
    }
    // column pass: coef(v)(u) = Σ_y rowC(y)(u) · cos((2y+1)vπ/64)
    val coef = Array.ofDim[Double](8, 8)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < Side) { acc += rowC(yy)(u) * cosT(v)(yy); yy += 1 }
        coef(v)(u) = acc
        u += 1
      }
      v += 1
    }
    val q = new Array[Long](64)
    var j = 0
    while (j < 64) { q(j) = math.rint(coef(j / 8)(j % 8)).toLong; j += 1 }
    val ac = new Array[Long](63)
    j = 1
    while (j < 64) { ac(j - 1) = q(j); j += 1 }
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var h = 0L
    j = 1
    while (j < 64) {
      if (q(j) > med) h |= (1L << j)
      j += 1
    }
    h
  }

  // cos((2y+1)·v·π / (2·Side)) for the 16 vertical frequencies the
  // 128-bit variant retains (the 64-bit hash keeps 8) — same kernel,
  // deeper corner.
  private val cosT16: Array[Array[Double]] =
    Array.tabulate(16, Side)((v, y) =>
      math.cos((2 * y + 1) * v * math.Pi / (2.0 * Side)))

  /** 128-bit pHash over the same Side×Side raster: the 16×8
    * low-frequency DCT corner (16 vertical × 8 horizontal
    * frequencies) instead of 8×8, thresholded against the median of
    * the 127 AC coefficients with the DC bit pinned to 0. Bit
    * j = 8·v + u; returned as (bits 0–63, bits 64–127).
    *
    * Exists for the OFFSET-FREE clip-containment banding
    * ([[graft.ops.Multimodal]] q186/q191), whose band join keys on
    * hash slices ALONE (no frame position): 128 bits band as 4×32-bit
    * keys, so the pigeonhole guarantee at Hamming ≤ 3 lives in a 2^32
    * key space instead of 2^16 — the average-occupancy hot-bucket
    * cliff moves from ~cap·2^16 ≈ 3.3M corpus frames (guaranteed at
    * video scale) to ~cap·2^32 ≈ 2·10^11 (two orders above a 100 TB
    * video corpus' ~10^9–10^10 frames). Since round 17 the
    * position-keyed q185 path and the flat image entry (q175) band
    * this hash too: frame-keying narrows buckets but every video
    * still shares the frame-0 key space corpus-wide, so the hash key
    * space must be corpus-sized on its own.
    *
    * Every invariance argument of [[phash64]] carries over verbatim:
    * DCT basis rows for u ≥ 1 or v ≥ 1 are orthogonal to the constant
    * raster, so a global brightness shift moves only the (0,0)
    * coefficient, whose bit is pinned — brightness-shifted re-encodes
    * hash identically on BOTH words (PhashSpec pins it). Coefficients
    * round to integers before the threshold for the same determinism
    * reason (the 127-element median routinely lands in a tie cluster
    * of mathematically-equal coefficients). Cost: 32·8 + 16·8 length-
    * 32 dot products per image — the row pass is phash64's exactly,
    * the column pass doubles.
    */
  def phash128(luma: Array[Int]): (Long, Long) = {
    require(luma.length == Side * Side,
      s"phash128: expected a $Side×$Side raster (${Side * Side} " +
        s"values), got ${luma.length}")
    val rowC = Array.ofDim[Double](Side, 8)
    var y = 0
    while (y < Side) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var x = 0
        while (x < Side) { acc += luma(y * Side + x) * cosT(u)(x); x += 1 }
        rowC(y)(u) = acc
        u += 1
      }
      y += 1
    }
    val q = new Array[Long](128)
    var v = 0
    while (v < 16) {
      var u = 0
      while (u < 8) {
        var acc = 0.0
        var yy = 0
        while (yy < Side) { acc += rowC(yy)(u) * cosT16(v)(yy); yy += 1 }
        q(8 * v + u) = math.rint(acc).toLong
        u += 1
      }
      v += 1
    }
    val ac = new Array[Long](127)
    var j = 1
    while (j < 128) { ac(j - 1) = q(j); j += 1 }
    java.util.Arrays.sort(ac)
    val med = ac(63)
    var h0 = 0L
    var h1 = 0L
    j = 1
    while (j < 128) {
      if (q(j) > med) {
        if (j < 64) h0 |= (1L << j) else h1 |= (1L << (j - 64))
      }
      j += 1
    }
    (h0, h1)
  }
}
