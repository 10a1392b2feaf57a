package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride the
  * pipeline as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs as a batched `mapPartitions`
  * stage (the Scala analog of `mapInPandas`: one partition = one
  * batch, decoder state amortized across the batch).
  *
  * IMAGE decode is REAL: the default [[SniffDecoder]] runs the JDK
  * codec ([[graft.pdf.ImageCodec]], javax.imageio — PNG/JPEG/BMP/GIF/
  * TIFF) on any payload whose magic bytes sniff as an image, emitting
  * decoded dimensions and an 8×8 average-hash perceptual fingerprint
  * of the actual pixels. Payloads that are NOT a recognizable image
  * (audio, video, arbitrary binaries — no audio/video codec exists on
  * this JVM) fall back to [[StubDecoder]], a clearly-marked
  * deterministic fake, so the stage is total and a production
  * deployment swaps only the fallback for a process/JNI decoder —
  * the stage contract (schema, batching, per-batch decoder reuse)
  * does not change.
  */
object Multimodal {

  /** Typed metadata extracted per media object. */
  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      byte_len: Int,
      format: String,
      width: Int,
      height: Int,
      phash: String)

  /** Decoder contract — one instance per partition (batch). */
  trait MediaDecoder extends Serializable {
    def decode(ref: String, bytes: Array[Byte]): MediaFeatures
  }

  /** STUB fallback: deterministic fake decode — md5-derived
    * "dimensions" and pseudo-hash, a pure function of the payload
    * bytes. Used when the payload is NOT a decodable image (the
    * [[SniffDecoder]] fallback for audio/video/binary columns — no
    * audio/video codec exists on this JVM); NOT a real codec. */
  final class StubDecoder(docId: String) extends MediaDecoder {
    private val md = MessageDigest.getInstance("MD5") // reused per batch
    def decode(ref: String, bytes: Array[Byte]): MediaFeatures = {
      md.reset()
      val d = md.digest(bytes)
      def u(i: Int) = d(i) & 0xff
      val format = Seq("png", "jpeg", "webp")(u(0) % 3)
      MediaFeatures(docId, ref, bytes.length, format,
        width = 16 * (1 + u(1) % 64), height = 16 * (1 + u(2) % 64),
        phash = d.take(8).map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  /** REAL metadata decoder for PNG payloads: parses IHDR (width,
    * height) codec-free — used for the actual PNGs materialized from
    * PDF image XObjects ([[graft.pdf.PdfImages]]). Non-PNG payloads
    * degrade to format="unknown" with zero dims (fail-soft). */
  final class PngMetaDecoder(docId: String) extends MediaDecoder {
    private val md = MessageDigest.getInstance("MD5")
    def decode(ref: String, bytes: Array[Byte]): MediaFeatures = {
      md.reset()
      val phash = md.digest(bytes).take(8).map(b => f"${b & 0xff}%02x").mkString
      graft.pdf.PdfImages.pngMeta(bytes) match {
        case Some((w, h, _)) => MediaFeatures(docId, ref, bytes.length, "png", w, h, phash)
        case None => MediaFeatures(docId, ref, bytes.length, "unknown", 0, 0, phash)
      }
    }
  }

  /** REAL default decoder: sniff the payload's container magic and
    * decode through the JDK codec — real dimensions, real pixels, an
    * 8×8 average-hash fingerprint (resize → grayscale → threshold at
    * the mean → 64 bits hex; the standard aHash). Non-image payloads
    * fall back to the deterministic [[StubDecoder]] fake (fail-soft:
    * the stage stays total over arbitrary bytes). */
  final class SniffDecoder(docId: String) extends MediaDecoder {
    private val stub = new StubDecoder(docId)
    def decode(ref: String, bytes: Array[Byte]): MediaFeatures =
      graft.pdf.ImageCodec.decodeToRgbaBounded(bytes) match {
        case Some((w, h, rgba)) =>
          MediaFeatures(docId, ref, bytes.length,
            graft.pdf.ImageCodec.sniffFormat(bytes).getOrElse("img"),
            w, h, averageHash(rgba, w, h))
        case None => stub.decode(ref, bytes)
      }
  }

  /** 8×8 average-hash of an RGBA buffer: nearest-neighbor resize to
    * 8×8, integer grayscale (r+g+b)/3, one bit per cell (1 iff above
    * the 64-cell mean). Deterministic pure pixel math — the
    * perceptual-fingerprint baseline (aHash). */
  def averageHashBits(rgba: Array[Byte], w: Int, h: Int): Long = {
    val small = graft.pdf.PdfImages.resizeRgba(rgba, w, h, 8, 8)
    val gray = new Array[Int](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      gray(i) = ((small(i * 4) & 0xff) + (small(i * 4 + 1) & 0xff) +
        (small(i * 4 + 2) & 0xff)) / 3
      total += gray(i)
      i += 1
    }
    val mean = total / 64
    var bits = 0L
    i = 0
    while (i < 64) { if (gray(i) > mean) bits |= (1L << i); i += 1 }
    bits
  }

  /** [[averageHashBits]] rendered as 16 hex chars. */
  def averageHash(rgba: Array[Byte], w: Int, h: Int): String =
    f"${averageHashBits(rgba, w, h)}%016x"

  /** One decoded image's average-hash as TWO 32-bit halves — the
    * simhash64 convention: an external engine replays 32-bit shift
    * arithmetic without the signed-bit-63 hazards of a full long.
    * `img_id` is LENGTH-PREFIXED (`"<len(doc_id)>:<doc_id>:<ref>"`) so
    * distinct (doc_id, media_ref) pairs can never collide when a
    * doc_id itself contains ':' — a collision would silently swallow
    * a genuine near-dup pair under the `a_id < b_id` predicate. */
  final case class ImageHash(img_id: String, lo: Long, hi: Long)

  /** Perceptual hashes of every DECODABLE image payload (PNG/BMP/
    * JPEG/GIF/TIFF via the JDK codec); non-image payloads are SKIPPED
    * — dedup over stub pseudo-hashes would report fake duplicates,
    * never acceptable. One codec instance per partition batch. */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (d, r, bytes) =>
          graft.pdf.ImageCodec.decodeToRgbaBounded(bytes).map { case (w, h, rgba) =>
            val bits = averageHashBits(rgba, w, h)
            ImageHash(s"${d.length}:$d:$r", bits & 0xFFFFFFFFL, bits >>> 32)
          }
        }
      }
  }

  /** IMAGE NEAR-DUP candidate pairs by perceptual hash — the image
    * twin of the simhash text dedup (the LAION-style image-dedup
    * step a multimodal training pipeline runs before contrastive
    * training): REAL pixel decode → 8×8 aHash → banded LSH → exact
    * Hamming verification. Pairs with distance ≤ `maxHamming` over
    * the 64-bit hash are emitted.
    *
    * Recall is STRUCTURAL, not probabilistic: the hash splits into 4
    * disjoint 16-bit bands, so any pair within Hamming distance 3 (<
    * 4) leaves at least one band untouched (pigeonhole) and MUST
    * collide — banding loses nothing at the default threshold; raise
    * `maxHamming` past bands−1 and the pigeonhole guarantee lapses
    * (declared, like the simhash tiers).
    *
    * Shape at 10^9 images: decode is map-side mapPartitions (one
    * codec per batch); ONE shuffle on the 16-bit band keys; pair
    * verification is a long-xor + bit_count per candidate — never
    * all-pairs. Skewed bands (monochrome web images all hashing 0)
    * are the same hot-bucket tail every LSH family has; the exact
    * verify keeps output correct and the candidate volume is bounded
    * by the band width. Output: (a_id, b_id, hamming), a_id < b_id. */
  def imagePhashPairs(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64,
      s"maxHamming must be in [0,64], got $maxHamming")
    val hashes = imageHashes(spark, media).toDF()
    val banded = hashes.select(col("img_id"), col("lo"), col("hi"),
      posexplode(array(
        expr("lo & 65535"), expr("shiftright(lo, 16) & 65535"),
        expr("hi & 65535"), expr("shiftright(hi, 16) & 65535")))
        .as(Seq("band", "key")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("a_id"), col("b.img_id").as("b_id"),
        col("a.lo").as("alo"), col("a.hi").as("ahi"),
        col("b.lo").as("blo"), col("b.hi").as("bhi"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming",
        expr("bit_count(alo ^ blo) + bit_count(ahi ^ bhi)").cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Input: (doc_id string, media_ref string, payload binary).
    * Output: Dataset[MediaFeatures]. Decoder constructed once per
    * partition — the batching that makes real codecs affordable.
    * Default decoder = [[SniffDecoder]]: REAL image decode, stub
    * fallback for non-image payloads. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] =
    extractFeaturesWith(spark, media, docId => new SniffDecoder(docId))

  /** [[extractFeatures]] with a pluggable decoder factory (e.g.
    * [[PngMetaDecoder]] for real PNG payloads). */
  def extractFeaturesWith(spark: SparkSession, media: DataFrame,
      mkDecoder: String => MediaDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder cache (keyed by doc for the decoders'
        // doc_id capture; a real codec would be one shared instance)
        val cache = scala.collection.mutable.HashMap.empty[String, MediaDecoder]
        it.map { case (docId, ref, bytes) =>
          cache.getOrElseUpdate(docId, mkDecoder(docId)).decode(ref, bytes)
        }
      }
  }

  /** Integer-exact PCM audio summary ([[graft.media.Wav]]). */
  final case class AudioFeatures(doc_id: String, media_ref: String,
      sample_rate: Int, channels: Int, bits: Int, n_frames: Long,
      peak_abs: Long, sum_abs: Long)

  /** REAL audio feature extraction over 16-bit PCM WAV payloads: the
    * RIFF walk and sample scan are pure little-endian arithmetic
    * ([[graft.media.Wav]]), so rate/channels/frames/peak/energy come
    * from the actual samples. Non-WAV / non-PCM payloads are SKIPPED
    * here (they have no PCM samples to summarize — route them through
    * [[extractFeatures]]'s sniffing path instead); a malformed WAV is
    * likewise a skip, never a wrong number. */
  def audioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, ref, bytes) =>
          graft.media.Wav.decode(bytes).map(w =>
            AudioFeatures(docId, ref, w.sampleRate, w.channels, w.bitsPerSample,
              w.nFrames, w.peakAbs, w.sumAbs))
        }
      }
  }

  /** Integer autocorrelation pitch probe of one PCM payload:
    * `best_lag` maximizes R(lag) = Σ x[i]·x[i+lag] over channel-0
    * samples (ties toward the SMALLEST lag — the fundamental, not a
    * multiple), `energy` = R(0). */
  final case class AudioPitch(doc_id: String, media_ref: String,
      n_frames: Long, energy: Long, best_lag: Int, best_corr: Long)

  /** PITCH/PERIODICITY probe over 16-bit PCM WAV payloads by exact
    * INTEGER autocorrelation — the classic time-domain pitch detector
    * (autocorrelation method; Rabiner, IEEE TASSP 1977), in integer
    * arithmetic so the DuckDB twin replays every product: R(lag) over
    * channel 0 for lag = 1..maxLag, argmax with ties to the smallest
    * lag. A periodic waveform peaks at its period (in frames);
    * `sample_rate / best_lag` is then the pitch estimate. Products
    * are |x|² ≤ 2^30 per term in Long — no overflow below 2^33
    * frames. Per-payload map-side work, same skip contract as
    * [[audioFeatures]]: non-WAV/non-PCM rows (or payloads shorter
    * than 2 frames) are skipped, never a wrong number. */
  def audioPitch(spark: SparkSession, media: DataFrame,
      maxLag: Int = 32): Dataset[AudioPitch] = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, ref, bytes) =>
          graft.media.Wav.samples(bytes).flatMap { case (_, channels, all) =>
            val n = all.length / channels
            if (n < 2) None
            else {
              val x = new Array[Long](n)
              var i = 0
              while (i < n) { x(i) = all(i * channels).toLong; i += 1 }
              var energy = 0L
              i = 0
              while (i < n) { energy += x(i) * x(i); i += 1 }
              var bestLag = 0
              var bestCorr = Long.MinValue
              var lag = 1
              while (lag <= math.min(maxLag, n - 1)) {
                var r = 0L
                var j = 0
                while (j < n - lag) { r += x(j) * x(j + lag); j += 1 }
                if (r > bestCorr) { bestCorr = r; bestLag = lag }
                lag += 1
              }
              Some(AudioPitch(docId, ref, n.toLong, energy, bestLag, bestCorr))
            }
          }
        }
      }
  }

  /** One fixed-length analysis window of a PCM payload (channel 0):
    * zero-crossing count, energy and peak amplitude — all integer. */
  final case class AudioFrame(doc_id: String, media_ref: String,
      frame_idx: Int, n: Int, zcr: Int, energy: Long, peak: Int)

  /** FRAMED short-time features over 16-bit PCM WAV payloads — the
    * standard front-end windowing before any spectral/VAD stage
    * (short-time energy + zero-crossing rate; Rabiner & Schafer,
    * "Digital Processing of Speech Signals" ch. 4), integer-exact so
    * the DuckDB twin replays every window: channel 0 is cut into
    * consecutive `frameLen`-sample windows (full windows only — a
    * trailing partial window is dropped, same both engines), each
    * emitting the in-window zero-crossing count (sign change between
    * adjacent samples, zero counted as non-negative), Σx² energy and
    * max |x| peak. Per-payload map-side work; same skip contract as
    * [[audioFeatures]]: non-WAV/non-PCM payloads are skipped, never a
    * wrong number. */
  def audioFrames(spark: SparkSession, media: DataFrame,
      frameLen: Int = 60): Dataset[AudioFrame] = {
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, ref, bytes) =>
          graft.media.Wav.samples(bytes).toSeq.flatMap { case (_, channels, all) =>
            val n = all.length / channels
            (0 until n / frameLen).map { fi =>
              var zcr = 0
              var energy = 0L
              var peak = 0
              var j = 0
              while (j < frameLen) {
                val x = all((fi * frameLen + j) * channels).toInt
                energy += x.toLong * x
                if (math.abs(x) > peak) peak = math.abs(x)
                if (j > 0) {
                  val prev = all((fi * frameLen + j - 1) * channels).toInt
                  if ((x >= 0) != (prev >= 0)) zcr += 1
                }
                j += 1
              }
              AudioFrame(docId, ref, fi, frameLen, zcr, energy, peak)
            }
          }
        }
      }
  }

  /** One Goertzel probe result: the final recurrence state pair and
    * the tone power at the probed frequency. */
  final case class GoertzelRow(doc_id: String, media_ref: String,
      frame_idx: Int, coef: Int, s1: Long, s2: Long, power: Long)

  /** INTEGER GOERTZEL tone probe over the framed windows (Goertzel
    * 1958; the single-bin DFT a VAD/DTMF front-end runs instead of a
    * full FFT): for each `frameLen`-sample window of channel 0 and
    * each probed coefficient c = 2·cos(ω) the recurrence
    * `s[n] = x[n] + c·s[n−1] − s[n−2]` runs once, and the bin power
    * is `s1² + s2² − c·s1·s2`. Probes are restricted to the INTEGER
    * coefficients c ∈ {1, 0, −1} — ω = π/3, π/2, 2π/3, i.e. bins
    * frameLen/6, /4, /3 — so every step is exact 64-bit integer
    * arithmetic (|s| ≤ frameLen·32768 for |c| ≤ 1: squares fit a long
    * with 2^20 headroom at frameLen 60) and the DuckDB twin can
    * replay it CLOSED-FORM: for |c| ≤ 1 the recurrence kernel u[m] =
    * c·u[m−1] − u[m−2] is periodic (period 6/4/3), so
    * s[n] = Σ x[j]·u[(n−j) mod P] is a plain weighted sum — two
    * independent derivations of the same integers, a recurrence bug
    * cannot hide. Same windowing and skip contract as
    * [[audioFrames]]. */
  def audioGoertzel(spark: SparkSession, media: DataFrame,
      frameLen: Int = 60, coefs: Seq[Int] = Seq(1, 0, -1)): Dataset[GoertzelRow] = {
    require(frameLen >= 2, s"frameLen must be >= 2, got $frameLen")
    // upper bound pins the exact-integer contract: the power term
    // s1² + s2² − c·s1·s2 overflows a long once |s| ≈ frameLen·32768
    // passes ~3·10⁹ (frameLen ≳ 92k at full-scale PCM); 65536 keeps
    // ≥ 2^20 headroom on every product
    require(frameLen <= 65536, s"frameLen must be <= 65536 to keep the " +
      s"integer power arithmetic exact at full-scale PCM, got $frameLen")
    require(coefs.nonEmpty && coefs.forall(c => c >= -1 && c <= 1),
      s"integer Goertzel probes need coefficients in {-1,0,1}, got $coefs")
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, ref, bytes) =>
          graft.media.Wav.samples(bytes).toSeq.flatMap { case (_, channels, all) =>
            val n = all.length / channels
            for {
              fi <- 0 until n / frameLen
              c <- coefs
            } yield {
              var s1 = 0L // s[n-1]
              var s2 = 0L // s[n-2]
              var j = 0
              while (j < frameLen) {
                val x = all((fi * frameLen + j) * channels).toLong
                val s0 = x + c * s1 - s2
                s2 = s1
                s1 = s0
                j += 1
              }
              GoertzelRow(docId, ref, fi, c, s1, s2,
                s1 * s1 + s2 * s2 - c * s1 * s2)
            }
          }
        }
      }
  }

  /** One sampled frame of a video-like payload. `frame_off` is the
    * absolute payload offset of the frame's bytes; `frame_ms` the
    * decode timestamp (−1 on the stub-chunker path, which has no
    * timebase). */
  final case class FrameRow(doc_id: String, media_ref: String, frame_idx: Int,
      frame_md5: String, frame_off: Long, frame_ms: Long)

  /** Frame sampling over video payloads: take every `stride`-th
    * sample up to `maxFrames` — the standard decimation step before
    * per-frame feature extraction. ISO-BMFF (MP4) payloads are
    * DEMUXED for real ([[graft.media.Mp4Demux]] box-walks
    * moov/trak/stbl and resolves each sample's file offset, size and
    * timestamp — pure big-endian arithmetic, no codec needed), so a
    * "frame" is the actual addressed sample. Non-BMFF (or
    * undemuxable) payloads keep the clearly-marked STUB chunker —
    * fixed `frameBytes` chunks, `frame_ms = -1` — because frame
    * decode without a codec would be silently wrong; a real
    * deployment swaps only that branch. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 2, maxFrames: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition, reused
        def hex(chunk: Array[Byte]): String = {
          md.reset()
          md.digest(chunk).map(b => f"${b & 0xff}%02x").mkString
        }
        it.flatMap { case (docId, ref, bytes) =>
          graft.media.Mp4Demux.demux(bytes) match {
            case Some(track) =>
              (track.samples.indices by stride).take(maxFrames).map { f =>
                val s = track.samples(f)
                val end = math.min(s.offset + s.size, bytes.length.toLong).toInt
                val chunk = java.util.Arrays.copyOfRange(bytes, s.offset.toInt, end)
                FrameRow(docId, ref, f, hex(chunk), s.offset, s.dtsMs)
              }
            case None =>
              val total = (bytes.length + frameBytes - 1) / frameBytes
              (0 until total by stride).take(maxFrames).map { f =>
                val from = f * frameBytes
                val chunk = java.util.Arrays.copyOfRange(bytes, from,
                  math.min(from + frameBytes, bytes.length))
                FrameRow(docId, ref, f, hex(chunk), from.toLong, -1L)
              }
          }
        }
      }
  }

  /** Deterministic synthetic media table (doc_id, media_ref, payload)
    * for tests/benches: payload bytes are a pure function of (i, j). */
  def syntheticMedia(spark: SparkSession, nDocs: Int, perDoc: Int): DataFrame = {
    import spark.implicits._
    spark.range(nDocs.toLong * perDoc).select(
      format_string("doc%08d", floor(col("id") / perDoc).cast("long")).as("doc_id"),
      format_string("m_%d_%d.bin", floor(col("id") / perDoc).cast("long"),
        pmod(col("id"), lit(perDoc))).as("media_ref"),
      // payload: md5-hex of the id, repeated — deterministic bytes
      repeat(md5(col("id").cast("string")), 4).cast("binary").as("payload"))
  }
}
