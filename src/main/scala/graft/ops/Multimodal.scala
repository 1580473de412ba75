package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables._

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with a
  * typed metadata struct, and a partition-batched "decode" stage.
  *
  * The container ships no native codec libraries, but every format
  * here is now decoded honestly by a pure-JVM codec behind the same
  * boundary: binary PPM ([[Ppm]], q80), RIFF/WAV ([[Wav]], q108), PNG
  * ([[Png]], q155 — Inflater + the five scanline filters), baseline
  * JPEG ([[Jpeg]], q157 — full T.81 marker/Huffman/IDCT pipeline),
  * and MJPEG video in a RIFF/AVI container ([[Avi]], q170 — chunk
  * walk + per-frame [[Jpeg.decode]]). [[decodeStub]] remains only as
  * the q60–q62 boundary exercise: a clearly-marked deterministic
  * stand-in that pins the binary schema, the typed row shape, and the
  * `mapPartitions` batch boundary a native libav decoder would plug
  * into, independent of any codec.
  *
  * Scale note: decode is a narrow map stage — no shuffle; payload bytes
  * stream through one partition at a time, so executor memory bounds the
  * batch, not the table. A real deployment would add
  * `spark.sql.files.maxPartitionBytes` tuning so one partition's media
  * fits the codec's working set.
  */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, format: String, payload: Array[Byte])

  /** Decoded (stub) features. */
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Int,
      header_byte: Int, width: Int, height: Int, n_frames: Int)

  /** STUB decoder — replace with a real codec per executor. Deterministic
    * fake: features are pure functions of payload size and first byte.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val n = r.payload.length
      val hdr = if (n > 0) r.payload(0) & 0xff else 0
      MediaFeatures(r.doc_id, r.format, n, hdr,
        width = n % 640, height = (n * 7) % 480, n_frames = hdr % 30)
    }

  /** Media table derived from `documents`: the text bytes stand in for
    * an encoded image/audio blob; format cycles by doc_id.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        element_at(lit(Array("png", "jpg", "wav")), (col("doc_id") % 3).cast("int") + 1)
          .as("format"),
        col("text").cast("binary").as("payload"))

  /** Binary ingest → batched stub decode → typed features, end to end. */
  def q60MultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .as[MediaRow]
      .mapPartitions(decodeStub _)
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling for video-shaped media over the STUB decoder —
    * the codec-independent row-shape exercise (generator stage, no
    * shuffle). The honest end-to-end video path is [[q170VideoDecode]]:
    * a real RIFF/AVI MJPEG container demuxed and decoded frame-by-
    * frame through [[Jpeg.decode]], with the same every-Nth sampling.
    */
  def q61FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .as[MediaRow]
      .mapPartitions(decodeStub _)
      .toDF()
      .select(col("doc_id"), col("format"), col("header_byte"),
        // empty/absent array (not a descending sequence) when 0 frames
        explode(when(col("n_frames") > 0, sequence(lit(0), col("n_frames") - 1)))
          .as("fi"))
      .where(col("fi") % 5 === 0)
      .select(col("doc_id"), col("format"), col("fi").cast("long").as("frame_idx"),
        ((col("header_byte") * 31 + col("fi")) % 251).cast("long").as("frame_sig"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Expression-only twin of q60: the stub features restated as pure
    * Catalyst expressions over the binary column — no Dataset encoder,
    * no mapPartitions. The pair quantifies the codec-boundary tax: the
    * mapPartitions form pays encoder (de)serialization per row but is
    * the shape a REAL decoder needs (codec handle per partition); this
    * form stays inside whole-stage codegen and is the ceiling. Both are
    * checked against the same oracle.
    */
  def q62DecodeExpr(s: SparkSession, dir: String): DataFrame = {
    val n = length(col("payload")).cast("int")
    // first payload byte as unsigned int; empty payload → 0
    val hdr = coalesce(
      nullif(conv(hex(substring(col("payload"), 1, 1)), 16, 10), lit("")),
      lit("0")).cast("int")
    mediaTable(s, dir)
      .select(col("doc_id"), col("format"), n.as("n_bytes"),
        hdr.as("header_byte"), (n % 640).as("width"),
        ((n * 7) % 480).as("height"), (hdr % 30).as("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** One encoded-PPM row (payload = real P6 bytes). */
  case class PpmRow(doc_id: Long, payload: Array[Byte])

  /** Features a real decoder recovers from the raster. */
  case class PpmFeatures(doc_id: Long, width: Int, height: Int,
      maxval: Int, n_pixels: Int, pix_sum: Long)

  /** Deterministic real-PPM media table: per doc, a genuine binary P6
    * image whose dimensions and raster are pure functions of doc_id
    * (width 4+id%13, height 3+id%7, pixel j = (id·31+j) mod 256) —
    * constructed with [[Ppm.encode]] in a narrow encoder stage. No RNG,
    * no fixtures on disk: both engines can derive the expected features
    * from the construction law.
    */
  def ppmTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 13).toInt
        val h = 3 + (id % 7).toInt
        val px = Array.tabulate(3 * w * h)(j => ((id * 31 + j) % 256).toByte)
        PpmRow(id, Ppm.encode(Ppm.Image(w, h, 255, px)))
      }).toDF()
  }

  /** REAL decode behind the q60 boundary — the stub retired: the binary
    * payload is an actual P6 image and [[Ppm.decode]] parses magic,
    * whitespace/comment-tolerant header, and raster byte-by-byte. The
    * emitted features (dimensions, pixel-byte sum) must round-trip the
    * construction law exactly, and the DuckDB oracle recomputes them
    * FROM that law — so a hash match proves the encoder and the parser
    * agree byte-for-byte on every document. Scale shape: staged-blob
    * read + spread + one decode map ([[ensureMediaTable]] — the
    * production economics: blobs are stored, not re-encoded per query).
    */
  def q80PpmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureMediaTable(s, dir, "ppm_media", ppmTable).as[PpmRow]
      .mapPartitions(_.map { r =>
        val img = Ppm.decode(r.payload)
        var sum = 0L
        img.pixels.foreach(b => sum += (b & 0xff))
        PpmFeatures(r.doc_id, img.width, img.height, img.maxval,
          img.width * img.height, sum)
      }).toDF()
      .orderBy(col("doc_id"))
  }

  /** Integer image embedding: channel means + 8-bucket luminance
    * histogram — the 11-dim feature row [[q124ImageEmbed]] emits.
    */
  case class PpmEmbed(doc_id: Long, n_px: Long, r_mean: Long,
      g_mean: Long, b_mean: Long, hist: Array[Long])

  /** Image FEATURE EXTRACTION + similarity — the bridge from the
    * multimodal columns to the vector stack, completing
    * decode → featurize → search: each doc's real P6 payload is
    * [[Ppm.decode]]d and reduced to an 11-dim INTEGER embedding
    * (per-channel means + an 8-bucket luminance histogram) in the
    * same narrow zero-shuffle mapPartitions stage as q80; the
    * embedding then behaves exactly like the `embeddings` table —
    * here queries (doc_id < 20) take their exact L2 top-1 neighbor
    * via the codegen'd `vec_ldot` (d² = |a|² + |b|² − 2a·b, every
    * value BIGINT), the q40 brute-force shape over a broadcast
    * 20-row query side. At corpus scale the same feature column
    * flows into the staged IVF/PQ index family unchanged (it IS an
    * integer vector) — the brute-force step here is the baseline,
    * exactly as q40 is for text embeddings. The DuckDB oracle
    * re-derives features from the construction law (never parses
    * PPM — q80's discipline) and replays the NN argmin, so the hash
    * certifies decoder, featurizer, and search together.
    */
  def q124ImageEmbed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val idot = graft.ops.Similarity.idot _
    val feats = ensureMediaTable(s, dir, "ppm_media", ppmTable).as[PpmRow]
      .mapPartitions(_.map { r =>
        val img = Ppm.decode(r.payload)
        val n = img.width * img.height
        var rs = 0L; var gs = 0L; var bs = 0L
        val hist = new Array[Long](8)
        var p = 0
        while (p < n) {
          val rr = img.pixels(3 * p) & 0xff
          val gg = img.pixels(3 * p + 1) & 0xff
          val bb = img.pixels(3 * p + 2) & 0xff
          rs += rr; gs += gg; bs += bb
          hist(((rr + gg + bb) / 3) / 32) += 1
          p += 1
        }
        PpmEmbed(r.doc_id, n, rs / n, gs / n, bs / n, hist)
      }).toDF()
      .localCheckpoint() // query + corpus NN sides both read it
    val fv = feats.select(col("doc_id"),
      concat(array(col("r_mean"), col("g_mean"), col("b_mean")),
        col("hist")).as("f"))
      .withColumn("n2", idot(col("f"), col("f")))
    val q = fv.where(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), col("f").as("qf"),
        col("n2").as("qn2"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("cand_id"))
    val nn = broadcast(q)
      .join(fv.withColumnRenamed("doc_id", "cand_id"),
        col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        (col("qn2") + col("n2")
          - lit(2L) * idot(col("qf"), col("f"))).as("d2"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("query_id").as("doc_id"), col("cand_id").as("nn_id"),
        col("d2").as("nn_d2"))
    feats
      .join(nn, Seq("doc_id"), "left")
      .select((Seq("doc_id", "n_px", "r_mean", "g_mean", "b_mean")
        .map(col) ++
        (0 until 8).map(i => element_at(col("hist"), i + 1).as(s"h$i")) ++
        Seq(col("nn_id"), col("nn_d2"))): _*)
      .orderBy(col("doc_id"))
  }

  /** [[q125ImageResize]]'s output row. */
  case class PpmResized(doc_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, rhash: Long)

  /** Image RESIZE behind the multimodal boundary — the remaining op of
    * the decode / feature-extract / resize / frame-sample family:
    * every doc's real P6 payload is decoded and nearest-neighbor
    * downsampled to a fixed 4×3 thumbnail (source pixel (tx·w div 4,
    * ty·h div 3) — the standard floor mapping), in the same narrow
    * zero-shuffle mapPartitions stage as q80/q124; batch thumbnailing
    * at 100 TB is exactly this map pass. The resized raster is
    * certified byte-for-byte WITHOUT shipping it: a deterministic
    * rolling hash (h ← (h·131 + v) mod 2⁵³, raster order) rides the
    * output, and the DuckDB oracle recomputes the same fold from the
    * construction law — so a hash match proves the resample read
    * exactly the right 36 source bytes of every image. (mod 2⁵³ keeps
    * h·131 < 2⁶⁰: BIGINT-safe in both engines.)
    */
  def q125ImageResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (ow, oh) = (4, 3)
    val M = 1L << 53
    ensureMediaTable(s, dir, "ppm_media", ppmTable).as[PpmRow]
      .mapPartitions(_.map { r =>
        val img = Ppm.decode(r.payload)
        var hsh = 0L
        var ty = 0
        while (ty < oh) {
          val ys = ty * img.height / oh
          var tx = 0
          while (tx < ow) {
            val xs = tx * img.width / ow
            var c = 0
            while (c < 3) {
              val v = img.pixels(3 * (ys * img.width + xs) + c) & 0xff
              hsh = (hsh * 131 + v) % M
              c += 1
            }
            tx += 1
          }
          ty += 1
        }
        PpmResized(r.doc_id, img.width, img.height, ow, oh, hsh)
      }).toDF()
      .orderBy(col("doc_id"))
  }

  /** One encoded-WAV row (payload = real RIFF/PCM bytes). */
  case class WavRow(doc_id: Long, payload: Array[Byte])

  /** Features a real audio decoder recovers from the samples. */
  case class WavFeatures(doc_id: Long, sample_rate: Int, n_samples: Int,
      duration_us: Long, sum_abs: Long, peak: Int)

  /** Deterministic real-WAV media table: per doc, a genuine RIFF/PCM
    * file whose rate and samples are pure functions of doc_id
    * (rate 8000 + (id%3)·4000, n = 50 + id%97, sample j =
    * (id·37 + j·13) mod 4001 − 2000), [[Wav.encode]]d in a narrow
    * stage; every even doc additionally carries an unknown LIST chunk
    * the decoder must skip. No RNG, no fixtures: the DuckDB oracle
    * derives expected features from the same construction law.
    */
  def wavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val rate = 8000 + (id % 3).toInt * 4000
        val n = 50 + (id % 97).toInt
        val samples =
          Array.tabulate(n)(j => ((id * 37 + j * 13) % 4001 - 2000).toShort)
        val junk = if (id % 2 == 0)
          Some(Array.tabulate(5 + (id % 9).toInt)(k => (id + k).toByte))
        else None
        WavRow(id, Wav.encode(Wav.Audio(rate, 1, samples), junk))
      }).toDF()
  }

  /** REAL audio decode behind the multimodal boundary — [[Ppm]]'s
    * pattern on the RIFF chunk grammar: [[Wav.decode]] walks magic,
    * fmt/data/unknown chunks (pad-aligned skip), and little-endian
    * int16 samples. The emitted features — rate, count, exact
    * `n·10⁶ div rate` duration, |sample| sum and peak (integer-exact,
    * no float audio math) — must round-trip the construction law,
    * which the oracle recomputes without ever parsing RIFF: a hash
    * match proves encoder and parser agree byte-for-byte, junk chunks
    * included. Scale shape: staged-blob read + spread + one decode
    * map ([[ensureMediaTable]] — q80's economics).
    */
  def q108WavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureMediaTable(s, dir, "wav_media", wavTable).as[WavRow]
      .mapPartitions(_.map { r =>
        val a = Wav.decode(r.payload)
        var sumAbs = 0L
        var peak = 0
        a.samples.foreach { sv =>
          val m = math.abs(sv.toInt)
          sumAbs += m
          if (m > peak) peak = m
        }
        WavFeatures(r.doc_id, a.sampleRate, a.samples.length,
          a.samples.length * 1000000L / a.sampleRate, sumAbs, peak)
      }).toDF()
      .orderBy(col("doc_id"))
  }

  /** One encoded-PNG row (payload = a genuine PNG byte stream). */
  case class PngRow(doc_id: Long, payload: Array[Byte])

  /** Features a real PNG decoder recovers from the raster. */
  case class PngFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, pix_sum: Long)

  /** Deterministic real-PNG media table: per doc, a genuine
    * signature/IHDR/IDAT/IEND byte stream whose geometry and raster
    * are pure functions of doc_id (width 4+id%11, height 3+id%5,
    * pixel byte j = (id·17+j) mod 256) and whose scanline FILTER
    * TYPE varies per row ((id+y) mod 5) — so across any 5 consecutive
    * doc_ids every PNG filter (None/Sub/Up/Average/Paeth) is both
    * applied by the encoder and undone by the decoder. Same
    * construction-law discipline as [[ppmTable]]: no RNG, no
    * fixtures; both engines derive the expected features from the
    * law.
    */
  def pngTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 4 + (id % 11).toInt
        val h = 3 + (id % 5).toInt
        val px = Array.tabulate(3 * w * h)(j => ((id * 17 + j) % 256).toByte)
        PngRow(id,
          Png.encode(Png.Image(w, h, px), y => ((id + y) % 5).toInt))
      }).toDF()
  }

  /** q155 — REAL PNG decode behind the multimodal boundary, retiring
    * the last stubbed image format: [[Png.decode]] walks the chunk
    * grammar (CRC-checked), inflates IDAT through
    * `java.util.zip.Inflater`, and inverts all five scanline filters
    * byte-by-byte. The emitted features (dimensions, pixel-byte sum)
    * must round-trip the construction law, and the DuckDB oracle
    * recomputes them FROM that law (it never parses PNG — q80's
    * discipline), so a hash match certifies encoder, deflate/inflate,
    * and every filter's inverse agree on every document. Same scale
    * shape as q80: staged-blob read + spread + one decode map.
    */
  def q155PngDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureMediaTable(s, dir, "png_media", pngTable).as[PngRow]
      .mapPartitions(_.map { r =>
        val img = Png.decode(r.payload)
        var sum = 0L
        img.pixels.foreach(b => sum += (b & 0xff))
        PngFeatures(r.doc_id, img.width, img.height,
          img.width * img.height, sum)
      }).toDF()
      .orderBy(col("doc_id"))
  }

  /** One encoded-JPEG row (payload = a genuine JFIF byte stream). */
  case class JpegRow(doc_id: Long, payload: Array[Byte])

  /** Features a real JPEG decoder recovers from the decoded raster. */
  case class JpegFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, pix_sum: Long, top_left: Int)

  /** Deterministic real-JPEG media table: per doc, a genuine baseline
    * JFIF stream (SOI/APP0/DQT/SOF0/DHT/SOS/EOI, Annex K tables, 4:4:4)
    * whose geometry and content are pure functions of doc_id: width
    * 8·(2+id%4), height 8·(1+id%3), and each 8×8 block a CONSTANT gray
    * value c(id,bx,by) = 2·((id·31+bx·7+by·13) mod 120)+8. Constant
    * even-valued blocks make the lossy pipeline exactly invertible —
    * Y = c and Cb = Cr = 128 land exactly under the JFIF matrices, the
    * forward DCT concentrates everything in DC = 8·(c−128) which the
    * Annex-K luma quantizer (q₀₀ = 16) divides exactly for even c, and
    * the DC-only inverse DCT reproduces c — so the oracle can derive
    * the expected raster from the law while the byte stream still
    * exercises real DPCM DC Huffman coding (block-to-block DC jumps
    * span many magnitude categories), EOB coding, byte stuffing and
    * the full marker grammar. Lossy fidelity on NON-constant content
    * is certified separately by JpegSpec against the JDK's own
    * independent ImageIO decoder.
    */
  def jpegTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (2 + (id % 4).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val px = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val c = (2 * ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 120) + 8).toByte
            px((y * w + x) * 3) = c; px((y * w + x) * 3 + 1) = c
            px((y * w + x) * 3 + 2) = c
            x += 1
          }
          y += 1
        }
        JpegRow(id, Jpeg.encode(Jpeg.Image(w, h, px)))
      }).toDF()
  }

  /** q157 — REAL JPEG decode behind the multimodal boundary: the
    * dominant web-corpus image format, decoded by [[Jpeg.decode]]'s
    * full baseline pipeline (marker grammar, canonical Huffman DC/AC
    * decode with byte unstuffing, dequantize, 8×8 inverse DCT, YCbCr→
    * RGB). The DuckDB oracle recomputes the features FROM the
    * construction law (it never parses JPEG — q80/q155's discipline),
    * so a hash match certifies that the encoder, both Huffman coders,
    * the quantizer round-trip and the IDCT agree on every document.
    * Same scale shape as q80/q155: two narrow mapPartitions stages,
    * staged blobs spread then decoded in one map — at 100 TB an
    * embarrassingly parallel pass whose cost is pure per-blob CPU.
    */
  def q157JpegDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureMediaTable(s, dir, "jpeg_media", jpegTable).as[JpegRow]
      .mapPartitions(_.map { r =>
        val img = Jpeg.decode(r.payload)
        var sum = 0L
        img.pixels.foreach(b => sum += (b & 0xff))
        JpegFeatures(r.doc_id, img.width, img.height,
          img.width * img.height, sum, img.pixels(0) & 0xff)
      }).toDF()
      .orderBy(col("doc_id"))
  }

  /** One encoded-AVI row (payload = a genuine RIFF/AVI MJPEG stream). */
  case class AviRow(doc_id: Long, payload: Array[Byte])

  /** Features a real video pipeline recovers per SAMPLED frame. */
  case class FrameFeatures(doc_id: Long, n_frames: Int, frame_idx: Int,
      width: Int, height: Int, pix_sum: Long, top_left: Int)

  /** Deterministic real-VIDEO media table: per doc, a genuine RIFF/AVI
    * container ([[Avi.encode]] — avih/strl/movi/idx1 grammar) holding
    * 2 + id%5 Motion-JPEG frames, each a real baseline JFIF stream by
    * q157's exactly-invertible law extended with the frame index:
    * frame f's 8×8 block (bx, by) is the constant even gray
    * c = 2·((id·31 + f·17 + bx·7 + by·13) mod 120) + 8 at q157's
    * geometry (width 8·(2+id%4), height 8·(1+id%3)). Both engines can
    * derive every sampled frame's features from the law while the
    * byte stream exercises the full container grammar AND the full
    * per-frame JPEG pipeline.
    */
  def aviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val w = 8 * (2 + (id % 4).toInt)
        val h = 8 * (1 + (id % 3).toInt)
        val frames = (0 until 2 + (id % 5).toInt).map { f =>
          val px = new Array[Byte](3 * w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val c = (2 * ((id * 31 + f * 17 + (x / 8) * 7 +
                (y / 8) * 13) % 120) + 8).toByte
              px((y * w + x) * 3) = c; px((y * w + x) * 3 + 1) = c
              px((y * w + x) * 3 + 2) = c
              x += 1
            }
            y += 1
          }
          Jpeg.encode(Jpeg.Image(w, h, px))
        }
        AviRow(id, Avi.encode(frames, w, h))
      }).toDF()
  }

  /** q170 — REAL video decode behind the multimodal boundary: the
    * binary payload is an actual RIFF/AVI MJPEG container,
    * [[Avi.decode]] walks the chunk grammar (strict, named errors)
    * into per-frame JPEG payloads, every SECOND frame is sampled
    * (q61's keyframe-sampling row shape, now over real frames), and
    * each sampled frame runs [[Jpeg.decode]]'s full baseline pipeline.
    * This retires the video column's last stub: q61 keeps the
    * synthetic row-shape twin, but the decode path itself is now
    * honest end-to-end — container walk, entropy decode, IDCT, raster
    * features. The DuckDB oracle recomputes every sampled frame's
    * features FROM the construction law (it never parses AVI or JPEG
    * — q80/q155/q157's discipline), so a hash match certifies muxer,
    * demuxer, both Huffman coders, and the per-frame sampling agree
    * on every document and every frame.
    *
    * Scale shape: staged-blob read + spread + one demux/decode map — at
    * 100 TB a video corpus decode is an embarrassingly parallel map
    * whose cost is per-blob CPU; frame sampling multiplies rows by
    * the keep fraction BEFORE any feature leaves the executor, which
    * is exactly where a real keyframe extractor wants its cut.
    */
  def q170VideoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ensureMediaTable(s, dir, "avi_media", aviTable).as[AviRow]
      .mapPartitions(_.flatMap { r =>
        val v = Avi.decode(r.payload)
        v.frames.zipWithIndex.collect {
          case (fb, f) if f % 2 == 0 =>
            val img = Jpeg.decode(fb)
            var sum = 0L
            img.pixels.foreach(b => sum += (b & 0xff))
            FrameFeatures(r.doc_id, v.frames.size, f, img.width,
              img.height, sum, img.pixels(0) & 0xff)
        }
      }).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Band-bucket occupancy cap for [[bandedHammingPairs]] (q175's
    * image pHash and q176's audio fingerprint) — q122's
    * hot-bucket discipline applied to pHash space: a (band, key)
    * bucket fans out C(n,2) candidate pairs, and an over-full bucket
    * at corpus scale is a template/boilerplate image cluster,
    * not near-dup structure worth pricing pairwise. Skipped buckets
    * are counted once in `hot_buckets`.
    */
  val PhashBandHotCap = 50

  /** Deterministic planted-duplicate JPEG table for q175: per doc, a
    * genuine 64×64 baseline JFIF stream (real marker grammar, Huffman
    * coding, quantizer round-trip — [[jpegTable]]'s discipline) whose
    * content is a pure function of the doc's DUP GROUP g = doc_id/4
    * and VARIANT r = doc_id%4. Each 8×8 block of group g's base image
    * is the constant even gray 2·(mix(g,bx,by) mod 120) + 8 (mix = a
    * splitmix-style 64-bit scramble, so neighboring groups share no
    * affine structure), and variant r re-encodes the SAME image
    * brightness-shifted by +2r (still even, ≤ 252, so the JPEG
    * round-trip stays exactly invertible — q157's argument verbatim).
    * By [[graft.functions.Phash]]'s DCT shift-invariance, the four
    * variants of a group hash IDENTICALLY while distinct groups are
    * scramble-far. 64×64 deliberately: the hash downscale (2×2 box
    * mean) turns the 8×8 block grid into 4×4 cells of the 32×32 hash
    * raster, giving 64 independent degrees of freedom behind the 63
    * hash bits — measured min inter-group distance 13 over 1250
    * groups (sf0.1's full id range). A 32×32 source (16 DOF) was
    * built first and REJECTED: its frequency-4 DCT rows/columns are
    * structurally zero, pinning 16 bits and correlating the rest, and
    * the measured inter-group minimum fell to 2 — inside the d ≤ 3
    * verify cut.
    */
  def phashJpegTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val side = 2 * graft.functions.Phash.Side
    // the synthetic id scan is ONE file split locally, which would
    // serialize 2·N codec passes onto one core; the repartition moves
    // 8-byte ids only (the encode manufactures the payload AFTER the
    // shuffle). A real media table arrives as many file splits and
    // needs no such step — this is the local-mode stand-in for them.
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val g = id / 4
        val r = (id % 4).toInt
        val px = new Array[Byte](3 * side * side)
        var y = 0
        while (y < side) {
          var x = 0
          while (x < side) {
            val k0 = g * 0x9E3779B97F4A7C15L + (x / 8) * 0xC2B2AE3D27D4EB4FL +
              (y / 8) * 0x165667B19E3779F9L
            val k = k0 ^ (k0 >>> 31)
            val c = (2 * (((k % 120) + 120) % 120) + 8 + 2 * r).toByte
            val i = (y * side + x) * 3
            px(i) = c; px(i + 1) = c; px(i + 2) = c
            x += 1
          }
          y += 1
        }
        // gray=true: r=g=b by construction, so the single-component
        // stream carries the identical luma in ⅓ the blocks — decode
        // skips chroma IDCTs and the color convert entirely (channel 0
        // IS Y either way; the exact round-trip argument is unchanged)
        JpegRow(id, Jpeg.encode(Jpeg.Image(side, side, px), gray = true))
      }).toDF()
  }

  /** Decode one q175 payload to the 32×32 hash raster: real JPEG
    * decode, then the standard pHash downscale as an exact 2×2 box
    * mean (each box lies inside one constant 8×8 source block here,
    * so the mean is integer-exact and the shift-invariance argument
    * survives the resize — box averaging is linear). r=g=b gray by
    * construction: channel 0 IS the luma.
    */
  private[ops] def phashLuma(payload: Array[Byte]): Array[Int] = {
    val img = Jpeg.decode(payload)
    val hs = graft.functions.Phash.Side
    val w = img.width
    Array.tabulate(hs * hs) { i =>
      val tx = i % hs; val ty = i / hs
      val p0 = (2 * ty * w + 2 * tx) * 3
      val p1 = (2 * ty * w + 2 * tx + 1) * 3
      val p2 = ((2 * ty + 1) * w + 2 * tx) * 3
      val p3 = ((2 * ty + 1) * w + 2 * tx + 1) * 3
      ((img.pixels(p0) & 0xff) + (img.pixels(p1) & 0xff) +
        (img.pixels(p2) & 0xff) + (img.pixels(p3) & 0xff)) / 4
    }
  }

  /** q175 — IMAGE near-dup pairs by perceptual hash: real JPEG decode
    * → 128-bit DCT pHash ([[graft.functions.Phash.phash128]]) →
    * 4×32-bit pigeonhole bands → exact Hamming verify, q122's Hamming-space
    * banding applied to the one dedup modality the engine lacked
    * (text exact/MinHash/SimHash and embedding SemDeDup exist; images
    * did not). Any pair within Hamming distance 3 agrees on at least
    * one whole band, so the banded equi-join has PERFECT recall at
    * the d ≤ 3 cut — never all-pairs; buckets over
    * [[PhashBandHotCap]] are skipped and reported once (`hot_buckets`).
    * The verify is codegen'd long arithmetic (`bit_count(pa ^ pb)`)
    * — no string signatures, cheaper per candidate than q122's
    * conv() spelling, which string signatures force there.
    *
    * The oracle never decodes a pixel: [[phashJpegTable]] plants the
    * dup groups (4 brightness-shifted re-encodes per group), DCT
    * shift-invariance makes each group's hashes provably identical,
    * so the expected pairs are exactly the within-group pairs with
    * `hamming` 0 — a hash match certifies the JPEG encoder/decoder
    * round-trip, the DCT, the median threshold, the banding, and the
    * verify agree end-to-end. Scale shape: one narrow decode+hash
    * map, one group-by occupancy, one hash-partitioned equi-join on
    * (band, bkey) — at 100 TB the decode dominates and shuffles only
    * 16-byte (doc_id, phash) rows, never payload bytes.
    */
  def q175ImagePhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = ensureMediaTable(s, dir, "phash_media", phashJpegTable)
      .as[JpegRow]
      .mapPartitions(_.map { r =>
        val (h0, h1) = graft.functions.Phash.phash128(phashLuma(r.payload))
        (r.doc_id, h0, h1)
      }).toDF("doc_id", "h0", "h1")
    bandedHammingPairs(hashes)
  }

  /** Deterministic planted-duplicate AVI table for q185 —
    * [[phashJpegTable]]'s design lifted to VIDEO: per doc, a genuine
    * RIFF/AVI MJPEG container of 4 + (g % 3) frames (frame count
    * keyed by the GROUP so dup candidates compare equal-length
    * videos), each frame a 64×64 baseline JPEG whose 8×8 blocks are
    * the q175 splitmix law EXTENDED BY THE FRAME INDEX (so frames
    * within one video differ as much as groups do), and the VARIANT
    * r = doc_id%4 brightness-shifts every frame by +2r — per-frame
    * pHash invariance by the same DCT argument, so a group's four
    * videos hash identically frame-for-frame while distinct groups
    * are scramble-far on every frame.
    */
  def vphashAviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val side = 2 * graft.functions.Phash.Side
    // one-split synthetic id scan → spread before the encode map
    // (the phashJpegTable note)
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val g = id / 4
        val r = (id % 4).toInt
        val nF = 4 + (g % 3).toInt
        val frames = (0 until nF).map { f =>
          val px = new Array[Byte](3 * side * side)
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val k0 = g * 0x9E3779B97F4A7C15L +
                f * 0xFF51AFD7ED558CCDL +
                (x / 8) * 0xC2B2AE3D27D4EB4FL +
                (y / 8) * 0x165667B19E3779F9L
              val k = k0 ^ (k0 >>> 31)
              val c = (2 * (((k % 120) + 120) % 120) + 8 + 2 * r).toByte
              val i = (y * side + x) * 3
              px(i) = c; px(i + 1) = c; px(i + 2) = c
              x += 1
            }
            y += 1
          }
          // gray single-component frames — the phashJpegTable note
          Jpeg.encode(Jpeg.Image(side, side, px), gray = true)
        }
        AviRow(id, Avi.encode(frames, side, side))
      }).toDF()
  }

  /** q185 — VIDEO near-dup pairs by frame-aligned perceptual hash:
    * the last dedup modality column (text exact/MinHash/SimHash,
    * embedding SemDeDup, image pHash, audio fingerprint — video was
    * the gap). Real demux (q170's [[Avi.decode]]) → every SECOND
    * frame sampled (the q170 keyframe rule) → per-frame 128-bit
    * pHash → q175's 4×32-bit pigeonhole banding PER (frame_idx,
    * band) — candidates
    * must agree at the SAME temporal position, so a montage sharing
    * one stray frame never floods the join — → codegen'd Hamming
    * verify per frame → a PAIR of videos is near-dup iff EVERY
    * sampled frame matches (equal sampled counts, all aligned frames
    * within distance 3): the strict all-frames rule a re-encode
    * detector wants; a clip/subsequence detector would relax the
    * final count predicate, nothing upstream changes.
    *
    * Scale shape: decode+hash is the only payload-touching map;
    * the join shuffles 32-byte (doc, frame, h0, h1) rows keyed by
    * (frame_idx, band, bkey) with q175's hot-bucket cap; the
    * video-level fold is one partial-agg groupBy on the frame-pair
    * set (near-dup-bound, not corpus-bound). The oracle never decodes
    * a pixel — [[vphashAviTable]]'s construction law makes within-
    * group pairs provably all-frames hamming 0 with (5 + g%3) div 2
    * sampled frames, so a hash match certifies muxer, demuxer, both
    * Huffman coders, per-frame DCT hashing, temporal alignment, and
    * the all-frames fold end-to-end.
    */
  def q185VideoPhashPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = ensureMediaTable(s, dir, "vphash_media", vphashAviTable)
      .as[AviRow]
      .mapPartitions(_.flatMap { r =>
        val v = Avi.decode(r.payload)
        v.frames.zipWithIndex.collect {
          case (fb, f) if f % 2 == 0 =>
            val (h0, h1) = graft.functions.Phash.phash128(phashLuma(fb))
            (r.doc_id, f.toLong, h0, h1)
        }
      }).toDF("doc_id", "frame_idx", "h0", "h1")
    videoHashPairs(hashes)
  }

  /** The frame-aligned banding + all-frames fold over a
    * (doc_id, frame_idx, h) frame-hash table — [[q185VideoPhashPairs]]
    * minus the decode, factored so VideoPhashSpec can drive the
    * temporal-alignment and count-rule semantics on planted hashes.
    */
  /** [[hashBandRows]] carrying `frame_idx` — q185's position-keyed
    * banding over the 128-bit (h0, h1) frame hash, 4×32-bit keys.
    * The frame key narrows each bucket further, but the HASH key
    * space must still be corpus-sized on its own: frame 0 of every
    * video in a 10^9-video corpus lands in one (frame_idx=0, band)
    * key space, which 16-bit keys saturate at ~3.3M videos (the
    * round-16 `weak`). Inline (not a join-back by (doc, h)) so
    * in-doc duplicate hashes — a still video is legal — never fan
    * out.
    */
  private def frameBandRows(hs: DataFrame): DataFrame =
    hs.select(col("doc_id"), col("frame_idx"), col("h0"), col("h1"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(IF(b < 2, h0, h1), (b % 2) * 32) " +
        "& 4294967295 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("h0"), col("h1"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** [[clipHashPairs]]'s banding over the 128-bit (h0, h1) hash:
    * 4×32-bit bands (0–1 from h0, 2–3 from h1) — the corpus-sized
    * key space the offset-free join needs (the fold's scaladoc).
    * Inline per row, like [[frameBandRows]], so in-doc duplicate
    * hashes never fan out.
    */
  private def clipBandRows(hs: DataFrame): DataFrame =
    hs.select(col("doc_id"), col("frame_idx"), col("h0"), col("h1"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        "shiftrightunsigned(IF(b < 2, h0, h1), (b % 2) * 32) " +
        "& 4294967295 AS bkey))")).as("bk"))
      .select(col("doc_id"), col("frame_idx"), col("h0"), col("h1"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  private[graft] def videoHashPairs(hashes0: DataFrame): DataFrame = {
    // eager: per-doc counts + both band-join sides read it (q31 note)
    val hashes = hashes0.localCheckpoint()
    Banding.requireCapacity(hashes.count(), 32, PhashBandHotCap,
      "videoHashPairs")
    val nS = hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val bands = frameBandRows(hashes)
    val occ = bands.groupBy(col("frame_idx"), col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
    val hotCount = occ.where(col("n") > PhashBandHotCap)
      .agg(count(lit(1)).as("hot_buckets"))
    val cold = bands.join(
      occ.where(col("n") <= PhashBandHotCap)
        .select(col("frame_idx"), col("band"), col("bkey")),
      Seq("frame_idx", "band", "bkey"), "leftsemi")
    val framePairs = cold.as("x")
      .join(cold.as("y"),
        col("x.frame_idx") === col("y.frame_idx")
          && col("x.band") === col("y.band")
          && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.frame_idx").as("frame_idx"),
        col("x.h0").as("pa0"), col("y.h0").as("pb0"),
        col("x.h1").as("pa1"), col("y.h1").as("pb1"))
      .distinct() // identical frame hashes agree on all four bands
      .withColumn("hamming",
        expr("bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)").cast("long"))
      .where(col("hamming") <= 3)
    framePairs.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_frames"), max(col("hamming")).as("max_hamming"))
      .join(nS.select(col("doc_id").as("doc_a"), col("ns").as("na")), "doc_a")
      .join(nS.select(col("doc_id").as("doc_b"), col("ns").as("nb")), "doc_b")
      // the all-frames rule: equal sampled counts, every frame matched
      .where(col("n_frames") === col("na") && col("na") === col("nb"))
      .crossJoin(broadcast(hotCount)) // global 1-row scalar
      .select(col("doc_a"), col("doc_b"), col("n_frames"),
        col("max_hamming"), col("hot_buckets"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Deterministic planted CLIP table for q186 — per doc, channel
    * c = doc_id/4 publishes four cuts of one six-frame source (frame
    * content keyed by (c, original-frame), [[vphashAviTable]]'s
    * scramble without the brightness variants — q185 already certifies
    * hash invariance): m=0 the full video (frames 0–5), m=1 the clip
    * [1,4), m=2 the clip [2,6), m=3 a full re-publication. Containment
    * structure by construction: {0⊇1, 0⊇2, 0=3, 3⊇1, 3⊇2}; the m=1/m=2
    * pair overlaps on only two frames — BELOW the shorter video's
    * length — pinning that partial overlap is not containment.
    */
  def vclipAviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val side = 2 * graft.functions.Phash.Side
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val c = id / 4
        val orig: Range = (id % 4) match {
          case 1 => 1 until 4
          case 2 => 2 until 6
          case _ => 0 until 6
        }
        val frames = orig.map { f =>
          val px = new Array[Byte](3 * side * side)
          var y = 0
          while (y < side) {
            var x = 0
            while (x < side) {
              val k0 = c * 0x9E3779B97F4A7C15L +
                f * 0xFF51AFD7ED558CCDL +
                (x / 8) * 0xC2B2AE3D27D4EB4FL +
                (y / 8) * 0x165667B19E3779F9L
              val k = k0 ^ (k0 >>> 31)
              val cb = (2 * (((k % 120) + 120) % 120) + 8).toByte
              val i = (y * side + x) * 3
              px(i) = cb; px(i + 1) = cb; px(i + 2) = cb
              x += 1
            }
            y += 1
          }
          // gray single-component frames — the phashJpegTable note
          Jpeg.encode(Jpeg.Image(side, side, px), gray = true)
        }
        AviRow(id, Avi.encode(frames, side, side))
      }).toDF()
  }

  /** q186 — VIDEO CLIP CONTAINMENT: q185 detects re-encodes (same
    * timeline, all frames aligned at offset 0); this detects EMBEDDED
    * CLIPS — one video appearing as a contiguous subsequence of
    * another at an arbitrary offset, the other half of production
    * video dedup (re-uploads of segments, intros, syndicated
    * excerpts). Every frame is hashed (no keyframe sampling: offset
    * alignment needs the full grid — a sampled clip at an odd offset
    * shares NO sampled frames with its source; a production pipeline
    * would sample scene cuts instead, which preserves alignment),
    * candidates band-join on the hash ALONE (no frame key — the
    * offset is unknown), each verified frame match votes for its
    * OFFSET delta = frame_b − frame_a, and a pair is a containment
    * iff some single delta accumulates matches for the ENTIRE shorter
    * video: min(nA, nB) aligned frames at one constant offset.
    * Partial overlaps (the planted m1/m2 cut pair: two shared frames
    * against a three-frame clip) are rejected by exactly that
    * predicate.
    *
    * Scale shape: the decode+hash map (now per frame, not per sampled
    * frame — the honest cost of offset-free matching), a (band, bkey)
    * equi-join with q175's hot cap, then ONE partial-agg groupBy on
    * (pair, delta) — match-bound, never |A|×|B| frames: only frames
    * sharing a whole 32-bit band meet. Because the banding is
    * offset-free (no frame key), its key space must be sized to the
    * CORPUS, not the timeline — hence the 128-bit
    * [[graft.functions.Phash.phash128]] banded 4×32 here, the keying
    * the whole banded family shares since round 17 (see
    * [[clipHashPairs]]'s bound). The
    * oracle is pure id arithmetic over the planted cut structure — a
    * hash match certifies codec round-trip, per-frame hashing, delta
    * voting, and the whole-shorter-video predicate end-to-end.
    */
  def q186VideoClipPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = ensureMediaTable(s, dir, "vclip_media", vclipAviTable)
      .as[AviRow]
      .mapPartitions(_.flatMap { r =>
        Avi.decode(r.payload).frames.zipWithIndex.map { case (fb, f) =>
          val (h0, h1) = graft.functions.Phash.phash128(phashLuma(fb))
          (r.doc_id, f.toLong, h0, h1)
        }
      }).toDF("doc_id", "frame_idx", "h0", "h1")
    clipHashPairs(hashes)
  }

  /** Scene-cut detection threshold for [[q191VideoCutContainment]]:
    * a frame boundary is a cut when the integer luma-energy delta
    * between adjacent frames reaches this. 1 suffices for the planted
    * table (its scene step is EXACTLY 256 by construction and its
    * in-scene delta exactly 0 — identical payload bytes decode
    * identically); a production corpus tunes this to its noise floor.
    */
  val VideoCutMinDelta = 1L

  /** Synthetic scene-structured AVI table for q191 — the vclip law
    * (shared per-group movie, clips at planted offsets) with SCENES:
    * each group's movie is 4 scenes × 3 IDENTICAL frames (12 frames);
    * m=0/m=3 carry the full movie (m3 an exact re-encode dup), m=1
    * scenes 1–2 (offset 3), m=2 scenes 2–3 (offset 6) — clips start
    * ON scene boundaries (the alignment a cut sampler preserves; an
    * arbitrary-offset clip is exactly what q186's every-frame path
    * remains for). Frame content is block-uniform with EVEN values
    * (the Annex-K DC quantizer inverts them exactly — JpegSpec), laid
    * out as ±jitter PAIRS so a frame's block-sum is 256·pairs + 16·scene
    * EXACTLY: in-scene energy delta is 0, adjacent-scene delta is
    * exactly 256 after the 2×2 luma downsample — the cut detector's
    * arithmetic is provable, not probabilistic.
    */
  def vcutAviTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val side = 2 * graft.functions.Phash.Side
    val blocks = side / 8 // per dimension
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val c = id / 4
        val scenes: Range = (id % 4) match {
          case 1 => 1 until 3
          case 2 => 2 until 4
          case _ => 0 until 4
        }
        val frames = scenes.flatMap { sc =>
          val px = new Array[Byte](3 * side * side)
          val nb = blocks * blocks
          // full splitmix64-style finalizer: the salts form an
          // arithmetic progression, and a single xorshift leaves their
          // low bits patterned — measured as heavy pHash-bit
          // correlation (273 distinct band keys from 500 hashes)
          def h(salt: Long): Long = {
            var z = c * 0x9E3779B97F4A7C15L +
              sc * 0xFF51AFD7ED558CCDL + salt * 0xC2B2AE3D27D4EB4FL
            z = (z ^ (z >>> 33)) * 0xFF51AFD7ED558CCDL
            z = (z ^ (z >>> 33)) * 0xC4CEB9FE1A85EC53L
            z ^ (z >>> 33)
          }
          // the ± pair members are SCATTERED by a per-(c, scene)
          // pseudo-random permutation: fixed adjacent mirroring makes
          // the DCT (hence the pHash bits) so structured that 16-bit
          // band keys collide corpus-wide and the hot cap starves the
          // join at replica scale (measured: 500 distinct hashes →
          // 1,395 occupied buckets, max occupancy 48 of cap 50, at
          // sf0.01 alone). The permutation keeps the exact pair-sum
          // energy law while spreading the spectrum.
          val perm = (0 until nb).sortBy(i => (h(1000L + i), i)).toArray
          val values = new Array[Byte](nb)
          var m = 0
          while (m < nb / 2) {
            val j = (((h(m) % 50) + 50) % 50).toInt // 0..49
            val base = 128 + (if (m == 0) 8 * sc.toInt else 0)
            values(perm(2 * m)) = (base + 2 * j).toByte
            values(perm(2 * m + 1)) = (base - 2 * j).toByte
            m += 1
          }
          var by = 0
          while (by < blocks) {
            var bx = 0
            while (bx < blocks) {
              val v = values(by * blocks + bx)
              var y = by * 8
              while (y < by * 8 + 8) {
                var x = bx * 8
                while (x < bx * 8 + 8) {
                  val i = (y * side + x) * 3
                  px(i) = v; px(i + 1) = v; px(i + 2) = v
                  x += 1
                }
                y += 1
              }
              bx += 1
            }
            by += 1
          }
          // gray single-component frames — the phashJpegTable note
          val enc = Jpeg.encode(Jpeg.Image(side, side, px), gray = true)
          Seq(enc, enc, enc) // 3 identical frames per scene
        }
        AviRow(id, Avi.encode(frames, side, side))
      }).toDF()
  }

  /** q191 — VIDEO CLIP CONTAINMENT VIA SCENE-CUT SAMPLING, the
    * production knob q186's scaladoc names: instead of hashing every
    * frame, detect scene cuts from the integer luma-energy delta
    * between adjacent frames (deterministic — [[VideoCutMinDelta]])
    * and pHash ONLY frame 0 plus the cut-adjacent frames; the
    * containment rule becomes "one constant offset aligns ALL of the
    * shorter video's SAMPLED frames" (min-cut-count at one delta) —
    * the same [[clipHashPairs]] fold, whose per-doc counts now count
    * sampled frames. Cut sampling preserves alignment for scene-
    * aligned clips (a re-upload cut at scene boundaries — the
    * production case); an arbitrary mid-scene offset is q186's
    * every-frame territory, the documented trade.
    *
    * Cost: the energy pass rides the decode (one integer sum over the
    * already-downsampled luma), and everything priced downstream —
    * DCT hashing, banding rows, the shuffle, the pair join — shrinks
    * to the sampled fraction (the planted table: 7 of 12 / 3 of 6
    * frames ≈ 40–50% volume cut at UNCHANGED planted recall, pinned
    * in VideoCutSpec; the real-corpus fraction is the cut density).
    * The oracle is the planted-law arithmetic, q186's discipline.
    */
  def q191VideoCutContainment(s: SparkSession, dir: String): DataFrame =
    clipHashPairs(cutSampledFrameHashes(s,
      ensureMediaTable(s, dir, "vcut_media", vcutAviTable)))

  /** The cut-sampling stage of [[q191VideoCutContainment]], factored
    * for VideoCutSpec (sampled-volume and recall-parity pins):
    * per video, integer luma energies for every frame, then pHash
    * only frame 0 and the cut-adjacent frames.
    */
  private[graft] def cutSampledFrameHashes(s: SparkSession,
      media: DataFrame): DataFrame = {
    import s.implicits._
    media.as[AviRow]
      .mapPartitions(_.flatMap { r =>
        val frames = Avi.decode(r.payload).frames
        // a zero-frame container emits nothing, like the every-frame
        // twin's flatMap (unconditional frame-0 sampling would throw)
        if (frames.isEmpty) Seq.empty
        else {
          val lumas = frames.map(phashLuma)
          val e = lumas.map(l => { var s0 = 0L; var i = 0
            while (i < l.length) { s0 += l(i); i += 1 }; s0 })
          val cuts = (1 until frames.length)
            .filter(f => math.abs(e(f) - e(f - 1)) >= VideoCutMinDelta)
          val sampled = (Set(0) ++ cuts.flatMap(f => Seq(f - 1, f)))
            .toSeq.sorted
          sampled.map { f =>
            val (h0, h1) = graft.functions.Phash.phash128(lumas(f))
            (r.doc_id, f.toLong, h0, h1)
          }
        }
      }).toDF("doc_id", "frame_idx", "h0", "h1")
  }

  /** The delta-voting containment fold over a (doc_id, frame_idx,
    * h0, h1) 128-bit frame-hash table — [[q186VideoClipPairs]] minus
    * the decode, factored for VideoPhashSpec (partial-overlap
    * rejection, offset discovery, the still-video multi-delta caveat).
    *
    * Band-width / corpus-size bound: offset-free banding keys on
    * (band, bkey) ALONE, so expected bucket occupancy grows LINEARLY
    * with total corpus frames and the key space must be sized to the
    * corpus, not the timeline. The 64-bit hash's 4×2^16 bands put the
    * all-hot cliff at ~[[PhashBandHotCap]]·2^16 ≈ 3.3M frames —
    * GUARANTEED at video scale (the round-15 `weak`); this fold
    * therefore bands the 128-bit [[graft.functions.Phash.phash128]]
    * as 4×32-bit keys, keeping the pigeonhole guarantee (Hamming ≤ 3
    * across 4 bands → one band exact) while moving the cliff to
    * ~cap·2^32 ≈ 2.1·10^11 corpus frames — two orders above a 100 TB
    * video corpus' ~10^9–10^10 frames (BandCliffProbe measures both
    * keyings above the OLD bound; SCALING.md). [[PhashBandHotCap]]
    * still applies per bucket, now doing only its intended job:
    * suppressing genuine template/boilerplate frame clusters, loudly
    * (`hot_buckets`), never average-occupancy mass. q185's
    * per-(frame, band) keying shares the hash key space corpus-wide
    * at each frame position (every video has a frame 0), so since
    * round 17 it bands the same 128-bit hash.
    *
    * Tolerance trade, stated plainly: the verify cut stays Hamming
    * ≤ 3 — now over 128 bits, so the RELATIVE noise tolerance halves
    * (3/128 vs the old 3/64), and the deeper 16×8 corner includes
    * higher vertical frequencies whose bits flip more readily under
    * codec noise. This is the PRICE of the corpus-sized key space,
    * not an accident: pigeonhole ties tolerance to band count
    * (d ≤ B−1 with one clean band) and key width to 128/B bits, so
    * raising tolerance back to 7 would need 8×16-bit bands — exactly
    * the cliff being removed. The planted tables certify exact
    * invariances (brightness-shifted re-encodes are Hamming 0 on both
    * words), which this repo's codecs actually produce; a deployment
    * whose re-encodes exceed d = 3 at 128 bits should shard the
    * corpus on a coarse content key and band the classic 64-bit hash
    * within shards instead — same oracle, different partitioner.
    */
  private[graft] def clipHashPairs(hashes0: DataFrame): DataFrame = {
    // eager: per-doc counts + both band-join sides read it (q31 note)
    val hashes = hashes0.localCheckpoint()
    Banding.requireCapacity(hashes.count(), 32, PhashBandHotCap,
      "clipHashPairs")
    val nS = hashes.groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
    val bands = clipBandRows(hashes)
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
    val hotCount = occ.where(col("n") > PhashBandHotCap)
      .agg(count(lit(1)).as("hot_buckets"))
    val cold = bands.join(
      occ.where(col("n") <= PhashBandHotCap).select(col("band"), col("bkey")),
      Seq("band", "bkey"), "leftsemi")
    val frameMatches = cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.frame_idx").as("fa"), col("y.frame_idx").as("fb"),
        col("x.h0").as("pa0"), col("y.h0").as("pb0"),
        col("x.h1").as("pa1"), col("y.h1").as("pb1"))
      .distinct() // identical hashes agree on all four bands
      .withColumn("hamming",
        expr("bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)").cast("long"))
      .where(col("hamming") <= 3)
    frameMatches
      .groupBy(col("doc_a"), col("doc_b"),
        (col("fb") - col("fa")).as("delta"))
      .agg(count(lit(1)).as("n_aligned"), max(col("hamming")).as("max_hamming"))
      .join(nS.select(col("doc_id").as("doc_a"), col("ns").as("na")), "doc_a")
      .join(nS.select(col("doc_id").as("doc_b"), col("ns").as("nb")), "doc_b")
      // containment: ONE constant offset aligns the whole shorter video
      .where(col("n_aligned") === least(col("na"), col("nb")))
      .crossJoin(broadcast(hotCount)) // global 1-row scalar
      .select(col("doc_a"), col("doc_b"), col("delta"), col("n_aligned"),
        col("max_hamming"), col("hot_buckets"))
      .orderBy(col("doc_a"), col("doc_b"), col("delta"))
  }

  /** Stage a synthetic media table once per (data, build) and read it
    * back as the versioned parquet asset — the production economics:
    * a real corpus' blobs are STORED, not synthesized per query, so
    * q175/q176's warm cost is honestly decode + hash + join, with the
    * one-time encode paid at staging like every index build
    * (`Staged.isFresh` guard — the round-14 ensure* discipline).
    */
  private def ensureMediaTable(s: SparkSession, dir: String, name: String,
      build: (SparkSession, String) => DataFrame): DataFrame = {
    import Staged.StagedWriter
    val work = Dedup.stageRoot(dir)
    if (!Staged.isFresh(work, name)) build(s, dir).stagePublish(work, name)
    // the staged blobs are small enough that the file scanner packs
    // them into ONE split (5000 × ~3 KB ≪ maxPartitionBytes), which
    // would serialize the codec map downstream; spread them — the
    // shuffle moves megabytes once, the decode it parallelizes costs
    // seconds. A production media table is multi-gigabyte and splits
    // naturally.
    s.read.parquet(Staged.path(work, name))
      .repartition(s.sparkContext.defaultParallelism)
  }

  /** The shared media near-dup core behind q175 (image pHash) and
    * q176 (audio fingerprint): (doc_id, 128-bit hash (`h0`, `h1`)) →
    * verified pairs at Hamming ≤ 3. Four 32-bit bands (any pair
    * within distance 3 agrees on at least one whole band —
    * pigeonhole, so the banded equi-join has PERFECT recall at the
    * cut), hot-bucket suppression over [[PhashBandHotCap]] with the
    * skipped count reported once, exact codegen'd
    * `bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)` verify. Never
    * all-pairs; the shuffle carries 24-byte (doc_id, h0, h1) rows.
    *
    * 32-bit keys, not the round-15 16-bit ones: a 4×2^16 key space
    * goes ALL-HOT past ~cap·2^16 ≈ 3.3M hashes (average occupancy
    * exceeds the cap, the skew guard suppresses wholesale — the
    * round-16 `weak`); 2^32 keys move that cliff to ~2·10^11, two
    * orders above a 100 TB media corpus, and [[Banding]] fails the
    * plan by name rather than let it be crossed silently.
    */
  /** The 4×32-bit band rows of a (doc_id, h0, h1) 128-bit hash frame
    * (bands 0–1 slice h0, 2–3 slice h1) — shared by
    * [[bandedHammingPairs]] and the streaming ingest twin
    * ([[graft.streaming.EventStreams.hammingStarStream]]), so stream
    * == batch is mechanism, not coincidence.
    */
  private[graft] def hashBandRows(hs: DataFrame,
      keyBits: Int = 32): DataFrame =
    hs.select(col("doc_id"), col("h0"), col("h1"),
      explode(expr("transform(sequence(0, 3), b -> struct(b AS band, " +
        s"shiftrightunsigned(IF(b < 2, h0, h1), (b % 2) * $keyBits) " +
        s"& ${(1L << keyBits) - 1} AS bkey))")).as("bk"))
      .select(col("doc_id"), col("h0"), col("h1"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))

  /** `keyBits` (≤ 32, default the shipped 32) exists so the capacity
    * guard is testable END-TO-END: a spec can plant a corpus above a
    * narrow keying's bound and assert the named refusal without
    * manufacturing 2·10^11 rows. Production callers never pass it.
    */
  private[graft] def bandedHammingPairs(hashes: DataFrame,
      keyBits: Int = 32): DataFrame = {
    // eager checkpoint: occupancy + both self-join sides read it (q31 note)
    val hs = hashes.localCheckpoint()
    Banding.requireCapacity(hs.count(), keyBits, PhashBandHotCap,
      "bandedHammingPairs")
    val bands = hashBandRows(hs, keyBits)
    val occ = bands.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
    val hotCount = occ.where(col("n") > PhashBandHotCap)
      .agg(count(lit(1)).as("hot_buckets"))
    val cold = bands.join(
      occ.where(col("n") <= PhashBandHotCap).select(col("band"), col("bkey")),
      Seq("band", "bkey"), "leftsemi")
    cold.as("x")
      .join(cold.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.h0").as("pa0"), col("y.h0").as("pb0"),
        col("x.h1").as("pa1"), col("y.h1").as("pb1"))
      .distinct() // identical hashes agree on all four bands
      .withColumn("hamming",
        expr("bit_count(pa0 ^ pb0) + bit_count(pa1 ^ pb1)").cast("long"))
      .where(col("hamming") <= 3)
      .crossJoin(broadcast(hotCount)) // global 1-row scalar
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        col("hot_buckets"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Deterministic planted-duplicate WAV table for q176 —
    * [[phashJpegTable]]'s design in the audio column: per doc, a
    * genuine RIFF/PCM stream of 128 frames × 32 samples (the 128-bit
    * fingerprint's frame grid, every delta bit informative) whose frame
    * amplitudes are a pure function of the DUP GROUP g = doc_id/4
    * (splitmix-scrambled per frame: a_t = 2·(mix(g,t) mod 1000) + 2,
    * a ±a_t square wave per frame), and whose VARIANT r = doc_id%4
    * scales every sample by r+1 (max amplitude 4·2002 = 8008, no
    * 16-bit clipping — the scale is EXACT in PCM). By
    * [[graft.functions.AudioFp]]'s integer m² argument the four
    * variants fingerprint identically, while distinct groups are
    * scramble-far (measured min inter-group distance 11 over sf0.1's
    * 1250 groups). Every odd doc carries an unknown junk chunk the
    * decoder must skip — [[wavTable]]'s grammar hardening carried
    * over.
    */
  def fpWavTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // the synthetic id scan is one file split; see phashJpegTable
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .mapPartitions(_.map { id =>
        val g = id / 4
        val m = (id % 4).toInt + 1
        val frames = graft.functions.AudioFp.Frames128
        val flen = 32
        val samples = new Array[Short](frames * flen)
        var tIdx = 0
        while (tIdx < frames) {
          val k0 = g * 0x9E3779B97F4A7C15L + tIdx * 0xC2B2AE3D27D4EB4FL
          val k = k0 ^ (k0 >>> 31)
          val a = (2 * (((k % 1000) + 1000) % 1000) + 2) * m
          var j = 0
          while (j < flen) {
            samples(tIdx * flen + j) = (if (j % 2 == 0) a else -a).toShort
            j += 1
          }
          tIdx += 1
        }
        val junk = if (id % 2 == 1)
          Some(Array.tabulate(5 + (id % 9).toInt)(kk => (id + kk).toByte))
        else None
        WavRow(id, Wav.encode(Wav.Audio(16000, 1, samples), junk))
      }).toDF()
  }

  /** q176 — AUDIO near-dup pairs by acoustic fingerprint: real WAV
    * decode → 128-bit frame-energy-delta fingerprint
    * ([[graft.functions.AudioFp.fingerprint128]]) → the shared
    * [[bandedHammingPairs]] core (4×32-bit pigeonhole bands, perfect
    * recall at Hamming ≤ 3, hot-bucket cap, codegen'd verify). With
    * q175 this completes the dedup modality matrix: text
    * (exact/MinHash/SimHash), embeddings (SemDeDup), images (pHash),
    * audio (energy fingerprint).
    *
    * The oracle never decodes a sample: [[fpWavTable]] plants the dup
    * groups as volume-scaled re-encodes, and the fingerprint's
    * integer m²-scaling invariance makes within-group hamming
    * provably 0 — pure id arithmetic plus DCT-free exactness (PCM is
    * lossless and the fingerprint is all-integer, so unlike q175
    * there is no FP tie discipline to defend). A hash match certifies
    * the RIFF round-trip (junk chunks included), the framing, the
    * energy sums, and the banded join end-to-end. Scale shape
    * identical to q175: payload bytes never shuffle.
    */
  def q176AudioFpPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = ensureMediaTable(s, dir, "fp_media", fpWavTable)
      .as[WavRow]
      .mapPartitions(_.map { r =>
        val (h0, h1) = graft.functions.AudioFp.fingerprint128(
          Wav.decode(r.payload).samples)
        (r.doc_id, h0, h1)
      }).toDF("doc_id", "h0", "h1")
    bandedHammingPairs(hashes)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_png_decode" -> (q155PngDecode _),
    "q175_image_phash_pairs" -> (q175ImagePhashPairs _),
    "q185_video_phash_pairs" -> (q185VideoPhashPairs _),
    "q186_video_clip_pairs" -> (q186VideoClipPairs _),
    "q191_video_cut_containment" -> (q191VideoCutContainment _),
    "q176_audio_fp_pairs" -> (q176AudioFpPairs _),
    "q170_video_decode" -> (q170VideoDecode _),
    "q157_jpeg_decode" -> (q157JpegDecode _),
    "q60_multimodal_decode" -> (q60MultimodalDecode _),
    "q61_frame_sample" -> (q61FrameSample _),
    "q62_decode_expr" -> (q62DecodeExpr _),
    "q80_ppm_decode" -> (q80PpmDecode _),
    "q108_wav_decode" -> (q108WavDecode _),
    "q124_image_embed" -> (q124ImageEmbed _),
    "q125_image_resize" -> (q125ImageResize _),
  )

  /** DuckDB twin of `payload(0) & 0xff`: the first UTF-8 *byte* of the
    * text, derived from the first character's code point (ascii() gives
    * the code point, which diverges from the lead byte for any
    * non-ASCII leading character — plausible in the de/fr corpora).
    */
  private val sqlHeadByte = """
        (CASE WHEN cp < 128 THEN cp
              WHEN cp < 2048 THEN 192 + cp // 64
              WHEN cp < 65536 THEN 224 + cp // 4096
              ELSE 240 + cp // 262144 END)"""

  /** The stub decode restated in SQL (payload = utf-8 bytes of text);
    * shared by q60 (mapPartitions form) and q62 (expression form).
    */
  private val sqlDecodeOracle = s"""
      WITH cps AS (SELECT doc_id, text, ascii(substr(text, 1, 1)) AS cp
                   FROM documents),
      hdr AS (SELECT doc_id, text, $sqlHeadByte AS hb FROM cps)
      SELECT doc_id,
        ['png', 'jpg', 'wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
        CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        hb AS header_byte,
        CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
        hb % 30 AS n_frames
      FROM hdr ORDER BY doc_id"""

  /** q124's oracle: features re-derived from the construction law
    * (q80's discipline — SQL never parses PPM), NN argmin replayed
    * over the derived 11-dim feature rows with the exact integer
    * Σ(aᵢ−bᵢ)² the engine computes via vec_ldot norms.
    */
  private val sqlImageEmbed: String = {
    val histCases = (0 until 8).map(i =>
      s"CAST(SUM(CASE WHEN ((r + g + b) // 3) // 32 = $i" +
        s" THEN 1 ELSE 0 END) AS BIGINT) AS h$i").mkString(",\n        ")
    val featCols = Seq("r_mean", "g_mean", "b_mean") ++
      (0 until 8).map(i => s"h$i")
    val d2 = featCols.map(c => s"(a.$c - b.$c) * (a.$c - b.$c)")
      .mkString(" + ")
    s"""
      WITH dims AS (SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                      CAST(3 + doc_id % 7 AS BIGINT) AS h FROM documents),
      px AS (SELECT doc_id, w * h AS n, unnest(range(0, w * h)) AS p
             FROM dims),
      ch AS (SELECT doc_id, n,
               (doc_id * 31 + 3 * p) % 256 AS r,
               (doc_id * 31 + 3 * p + 1) % 256 AS g,
               (doc_id * 31 + 3 * p + 2) % 256 AS b
             FROM px),
      f AS (SELECT doc_id, CAST(n AS BIGINT) AS n_px,
              CAST(SUM(r) // n AS BIGINT) AS r_mean,
              CAST(SUM(g) // n AS BIGINT) AS g_mean,
              CAST(SUM(b) // n AS BIGINT) AS b_mean,
              $histCases
            FROM ch GROUP BY doc_id, n),
      d AS (SELECT a.doc_id AS query_id, b.doc_id AS cand_id,
              CAST($d2 AS BIGINT) AS d2
            FROM f a JOIN f b ON b.doc_id <> a.doc_id
            WHERE a.doc_id < 20),
      r AS (SELECT query_id, cand_id, d2, ROW_NUMBER() OVER
              (PARTITION BY query_id ORDER BY d2, cand_id) AS rk
            FROM d)
      SELECT f.doc_id, n_px, r_mean, g_mean, b_mean,
        ${(0 until 8).map(i => s"h$i").mkString(", ")},
        r.cand_id AS nn_id, r.d2 AS nn_d2
      FROM f LEFT JOIN r ON f.doc_id = r.query_id AND r.rk = 1
      ORDER BY f.doc_id"""
  }

  val oracles: Map[String, String] = Map(
    // the oracle never decodes a pixel — the planted dup groups are
    // pure id arithmetic (g = doc_id/4) and DCT shift-invariance
    // (Phash.scala's scaladoc) makes every within-group hamming
    // provably 0, so a hash match certifies the whole decode → DCT →
    // threshold → band → verify pipeline against the construction law
    "q175_image_phash_pairs" -> """
      WITH d AS (SELECT doc_id FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON (a.doc_id - a.doc_id % 4) = (b.doc_id - b.doc_id % 4)
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(0 AS BIGINT) AS hamming,
        CAST(0 AS BIGINT) AS hot_buckets
      FROM pairs ORDER BY doc_a, doc_b""",
    // q175's law per FRAME: within-group videos share the frame count
    // (keyed by g) and hash identically on every sampled frame, so the
    // all-frames fold emits exactly the within-group pairs with
    // (5 + g%3) // 2 sampled frames and max hamming 0
    "q185_video_phash_pairs" -> """
      WITH d AS (SELECT doc_id FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON (a.doc_id - a.doc_id % 4) = (b.doc_id - b.doc_id % 4)
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b,
        CAST((5 + (doc_a // 4) % 3) // 2 AS BIGINT) AS n_frames,
        CAST(0 AS BIGINT) AS max_hamming,
        CAST(0 AS BIGINT) AS hot_buckets
      FROM pairs ORDER BY doc_a, doc_b""",
    // the planted cut structure as pure id arithmetic: per channel,
    // containments {0>=1 at delta -1/n 3, 0>=2 at -2/4, 0=3 at 0/6,
    // 1<=3 at +1/3, 2<=3 at +2/4}; the m1/m2 partial overlap (2 of 3
    // frames) is ABSENT — the whole-shorter-video predicate rejects it
    "q186_video_clip_pairs" -> """
      WITH ch AS (SELECT doc_id, doc_id // 4 AS c, doc_id % 4 AS m
                  FROM documents),
      rel AS (SELECT * FROM (VALUES (0, 1, 3, -1), (0, 2, 4, -2),
                (0, 3, 6, 0), (1, 3, 3, 1), (2, 3, 4, 2))
                AS t(ma, mb, n, delta)),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          r.delta, r.n
        FROM ch a JOIN ch b ON a.c = b.c
        JOIN rel r ON a.m = r.ma AND b.m = r.mb)
      SELECT doc_a, doc_b, CAST(delta AS BIGINT) AS delta,
        CAST(n AS BIGINT) AS n_aligned,
        CAST(0 AS BIGINT) AS max_hamming,
        CAST(0 AS BIGINT) AS hot_buckets
      FROM pairs ORDER BY doc_a, doc_b, delta""",
    // the scene-sampled containment law: sampled counts are 7 (full
    // movies: frame 0 + cut-adjacent pairs at the 3 scene boundaries)
    // and 3 (2-scene clips); containments are the scene-aligned clip
    // offsets and the exact dup, each at ONE delta with n_aligned ==
    // the shorter side's SAMPLED count
    "q191_video_cut_containment" -> """
      WITH ch AS (SELECT doc_id, doc_id // 4 AS c, doc_id % 4 AS m
                  FROM documents),
      rel AS (SELECT * FROM (VALUES (0, 1, -3, 3), (0, 2, -6, 3),
                (0, 3, 0, 7), (1, 3, 3, 3), (2, 3, 6, 3))
                AS t(ma, mb, delta, n)),
      pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          r.delta, r.n
        FROM ch a JOIN ch b ON a.c = b.c
        JOIN rel r ON a.m = r.ma AND b.m = r.mb)
      SELECT doc_a, doc_b, CAST(delta AS BIGINT) AS delta,
        CAST(n AS BIGINT) AS n_aligned,
        CAST(0 AS BIGINT) AS max_hamming,
        CAST(0 AS BIGINT) AS hot_buckets
      FROM pairs ORDER BY doc_a, doc_b, delta""",
    // same planted-group law as q175; hamming 0 is the fingerprint's
    // integer m²-scaling invariance (AudioFp.scala scaladoc) — exact
    // with no FP caveat at all, PCM being lossless
    "q176_audio_fp_pairs" -> """
      WITH d AS (SELECT doc_id FROM documents),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM d a JOIN d b
          ON (a.doc_id - a.doc_id % 4) = (b.doc_id - b.doc_id % 4)
         AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(0 AS BIGINT) AS hamming,
        CAST(0 AS BIGINT) AS hot_buckets
      FROM pairs ORDER BY doc_a, doc_b""",
    "q60_multimodal_decode" -> sqlDecodeOracle,
    "q62_decode_expr" -> sqlDecodeOracle,
    "q124_image_embed" -> sqlImageEmbed,
    // the resized raster's rolling hash recomputed from the
    // construction law: k = 0..35 walks the thumbnail in raster order
    // (ty = k // 12, tx = (k % 12) // 3, c = k % 3), source pixel by
    // the same floor mapping, value by the law; list_reduce is an
    // INTEGER fold (the DuckDB string-lambda bug does not apply)
    "q125_image_resize" -> """
      WITH dims AS (SELECT doc_id, CAST(4 + doc_id % 13 AS BIGINT) AS w,
                      CAST(3 + doc_id % 7 AS BIGINT) AS h FROM documents),
      r AS (SELECT doc_id, w, h,
              list_reduce(
                list_prepend(CAST(0 AS BIGINT), list_transform(
                  range(0, 36),
                  k -> (doc_id * 31
                    + 3 * (((k // 12) * h // 3) * w + ((k % 12) // 3) * w // 4)
                    + k % 3) % 256)),
                (acc, v) -> (acc * 131 + v) % 9007199254740992)
                AS rhash
            FROM dims)
      SELECT doc_id, CAST(w AS INT) AS src_w, CAST(h AS INT) AS src_h,
        4 AS out_w, 3 AS out_h, rhash
      FROM r ORDER BY doc_id""",
    // construction-law recompute (q80's discipline — the oracle never
    // parses PNG, inflates zlib, or inverts a filter): a hash match
    // certifies the encoder, Deflater/Inflater round-trip, and all
    // five scanline-filter inverses agree on every document
    "q155_png_decode" -> """
      SELECT doc_id,
        CAST(4 + doc_id % 11 AS INT) AS width,
        CAST(3 + doc_id % 5 AS INT) AS height,
        CAST((4 + doc_id % 11) * (3 + doc_id % 5) AS INT) AS n_pixels,
        CAST(list_sum(list_transform(
          range(0, 3 * (4 + doc_id % 11) * (3 + doc_id % 5)),
          j -> (doc_id * 17 + j) % 256)) AS BIGINT) AS pix_sum
      FROM documents ORDER BY doc_id""",
    // construction-law recompute (q80's discipline — the oracle never
    // parses JPEG, decodes Huffman, or runs an IDCT): per doc the
    // 8×8-block grid's constant values are re-derived and summed; the
    // top-left pixel pins positional correctness, not just totals
    // q157's law extended with the frame index; the oracle never
    // parses AVI or JPEG — every sampled frame's features re-derive
    // from the construction law
    "q170_video_decode" -> """
      WITH dims AS (SELECT doc_id, 2 + doc_id % 4 AS nbx,
                      1 + doc_id % 3 AS nby, 2 + doc_id % 5 AS nf
                    FROM documents),
      fr AS (SELECT doc_id, nbx, nby, nf, unnest(range(0, nf)) AS f
             FROM dims),
      sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
      bx AS (SELECT doc_id, nbx, nby, nf, f, unnest(range(0, nbx)) AS bx
             FROM sampled),
      blocks AS (SELECT doc_id, nbx, nby, nf, f, bx,
                   unnest(range(0, nby)) AS by FROM bx),
      cvals AS (SELECT doc_id, nbx, nby, nf, f,
                  2 * ((doc_id * 31 + f * 17 + bx * 7 + by * 13) % 120)
                    + 8 AS c
                FROM blocks)
      SELECT doc_id,
        CAST(MAX(nf) AS INT) AS n_frames,
        CAST(f AS INT) AS frame_idx,
        CAST(MAX(nbx) * 8 AS INT) AS width,
        CAST(MAX(nby) * 8 AS INT) AS height,
        CAST(3 * 64 * SUM(c) AS BIGINT) AS pix_sum,
        CAST(2 * ((doc_id * 31 + f * 17) % 120) + 8 AS INT) AS top_left
      FROM cvals GROUP BY doc_id, f ORDER BY doc_id, frame_idx""",
    "q157_jpeg_decode" -> """
      WITH dims AS (SELECT doc_id, 2 + doc_id % 4 AS nbx,
                      1 + doc_id % 3 AS nby FROM documents),
      bx AS (SELECT doc_id, nbx, nby, unnest(range(0, nbx)) AS bx
             FROM dims),
      blocks AS (SELECT doc_id, nbx, nby, bx,
                   unnest(range(0, nby)) AS by FROM bx),
      cvals AS (SELECT doc_id, nbx, nby,
                  2 * ((doc_id * 31 + bx * 7 + by * 13) % 120) + 8 AS c
                FROM blocks)
      SELECT doc_id,
        CAST(MAX(nbx) * 8 AS INT) AS width,
        CAST(MAX(nby) * 8 AS INT) AS height,
        CAST(MAX(nbx) * MAX(nby) * 64 AS INT) AS n_pixels,
        CAST(3 * 64 * SUM(c) AS BIGINT) AS pix_sum,
        CAST(2 * ((doc_id * 31) % 120) + 8 AS INT) AS top_left
      FROM cvals GROUP BY doc_id ORDER BY doc_id""",
    // the oracle re-derives the features from the CONSTRUCTION law (it
    // never parses PPM) — a hash match therefore certifies the Scala
    // encoder and byte-level parser agree on every document
    "q80_ppm_decode" -> """
      SELECT doc_id,
        CAST(4 + doc_id % 13 AS INT) AS width,
        CAST(3 + doc_id % 7 AS INT) AS height,
        CAST(255 AS INT) AS maxval,
        CAST((4 + doc_id % 13) * (3 + doc_id % 7) AS INT) AS n_pixels,
        CAST(list_sum(list_transform(
          range(0, 3 * (4 + doc_id % 13) * (3 + doc_id % 7)),
          j -> (doc_id * 31 + j) % 256)) AS BIGINT) AS pix_sum
      FROM documents ORDER BY doc_id""",
    // construction-law recompute, never parses RIFF (q80's discipline);
    // abs/max/sum all integer-exact
    "q108_wav_decode" -> """
      WITH law AS (SELECT doc_id,
          CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
          CAST(50 + doc_id % 97 AS INT) AS n_samples,
          list_transform(range(0, 50 + doc_id % 97),
            j -> abs((doc_id * 37 + j * 13) % 4001 - 2000)) AS mags
        FROM documents)
      SELECT doc_id, sample_rate, n_samples,
        (CAST(n_samples AS BIGINT) * 1000000) // sample_rate AS duration_us,
        CAST(list_sum(mags) AS BIGINT) AS sum_abs,
        CAST(list_max(mags) AS INT) AS peak
      FROM law ORDER BY doc_id""",
    "q61_frame_sample" -> s"""
      WITH cps AS (SELECT doc_id, ascii(substr(text, 1, 1)) AS cp
                   FROM documents),
      frames AS (
        SELECT doc_id,
          ['png', 'jpg', 'wav'][CAST(doc_id % 3 AS INT) + 1] AS format,
          $sqlHeadByte AS header_byte,
          unnest(range(0, $sqlHeadByte % 30)) AS frame_idx
        FROM cps)
      SELECT doc_id, format, frame_idx,
        (header_byte * 31 + frame_idx) % 251 AS frame_sig
      FROM frames WHERE frame_idx % 5 = 0
      ORDER BY doc_id, frame_idx""",
  )
}
