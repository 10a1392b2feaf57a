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
  * The sandbox has no image/audio codecs, so [[StubDecoder]] is a
  * clearly-marked deterministic fake — a pure function of the payload
  * bytes — while everything Spark-grade around it (schema, typed
  * Dataset stage, partition batching, per-batch decoder reuse) is real
  * and tested. Swap `StubDecoder` for a JNI/process-backed decoder in
  * production; the stage contract does not change.
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

  /** STUB: deterministic fake decode — md5-derived "dimensions" and
    * perceptual-hash. Stands in for a real image decoder (none is
    * available in this container); NOT a real codec. */
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

  /** Input: (doc_id string, media_ref string, payload binary).
    * Output: Dataset[MediaFeatures]. Decoder constructed once per
    * partition — the batching that makes real codecs affordable. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] =
    extractFeaturesWith(spark, media, docId => new StubDecoder(docId))

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

  /** One sampled frame of a video-like payload. */
  final case class FrameRow(doc_id: String, media_ref: String, frame_idx: Int,
      frame_md5: String)

  /** Frame sampling over opaque video payloads: take every `stride`-th
    * frame up to `maxFrames` — the standard decimation step before
    * per-frame feature extraction. The Spark plumbing (typed explode
    * inside the batched partition stage, schema, ordering) is REAL;
    * the frame DECODE is a clearly-marked STUB (no video codec in this
    * container): a "frame" is a fixed-size byte chunk of the payload,
    * fingerprinted by md5. A real deployment swaps the chunker for a
    * demuxer; nothing downstream changes. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int = 32, stride: Int = 2, maxFrames: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    media.select(col("doc_id").cast("string"), col("media_ref").cast("string"),
        col("payload").cast("binary"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // per-partition, reused
        it.flatMap { case (docId, ref, bytes) =>
          val total = (bytes.length + frameBytes - 1) / frameBytes
          (0 until total by stride).take(maxFrames).map { f =>
            md.reset()
            val from = f * frameBytes
            val chunk = java.util.Arrays.copyOfRange(bytes, from,
              math.min(from + frameBytes, bytes.length))
            FrameRow(docId, ref, f,
              md.digest(chunk).map(b => f"${b & 0xff}%02x").mkString)
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
