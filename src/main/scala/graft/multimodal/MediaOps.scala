package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages (north-star multimodal operators).
  *
  * The Spark-side plumbing is real — schema, per-partition batched
  * execution, deterministic output — while the codec itself is a STUB: no
  * image/audio libraries exist in this environment, so "decode" parses a
  * deterministic synthetic container format (`GRFT` header + seeded
  * payload). In production the stub body is replaced by the real codec
  * call (JNI/javacv or an Arrow `mapInArrow`/`mapInPandas` hop to a Python
  * worker); every signature, batch shape, and downstream schema stays
  * unchanged.
  *
  * Execution shape: `mapPartitions` over the binary rows — the Scala
  * analogue of `mapInPandas` batches. Per-row independent compute: no
  * shuffle, linear scans, embarrassingly parallel at any scale; binary
  * blobs never leave the executor that read them.
  */
object MediaOps {

  /** Raw media row: what a 100 TB media lakehouse table looks like. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata + derived features. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      channels: Int,
      n_bytes: Int,
      thumb_w: Int,
      thumb_h: Int,
      n_frames: Int,
      frame_offsets: Seq[Int],
      embedding: Seq[Double])

  val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
  val EmbDim = 16
  val ThumbMax = 64

  /** Deterministic synthetic container: GRFT | w u16 | h u16 | ch u8 |
    * frames u8 | payload (seeded bytes). */
  def synthesize(id: Long, kind: String): Array[Byte] = {
    val rnd = new scala.util.Random(id * 2654435761L + kind.hashCode)
    val w = 16 + rnd.nextInt(240)
    val h = 16 + rnd.nextInt(240)
    val ch = if (kind == "audio") 1 else 3
    val frames = if (kind == "video") 1 + rnd.nextInt(30) else 1
    val payload = new Array[Byte](64 + rnd.nextInt(192))
    rnd.nextBytes(payload)
    Array[Byte](Magic(0), Magic(1), Magic(2), Magic(3),
      (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
      ch.toByte, frames.toByte) ++ payload
  }

  /** STUB decode — replace the body with the real codec in production.
    * Parses the container header; malformed blobs yield width = -1 rows
    * (never throws — the 100 TB corpus WILL contain garbage). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Int) =
    if (bytes.length < 10 || !bytes.take(4).sameElements(Magic)) (-1, -1, -1, -1)
    else (
      ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff),
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff),
      bytes(8) & 0xff,
      bytes(9) & 0xff)

  /** Aspect-preserving resize-to-fit (pure arithmetic; the real op would
    * emit resampled pixels). */
  def thumbDims(w: Int, h: Int): (Int, Int) =
    if (w <= 0 || h <= 0) (0, 0)
    else if (w >= h) (ThumbMax, math.max(1, h * ThumbMax / w))
    else (math.max(1, w * ThumbMax / h), ThumbMax)

  /** Uniform frame sampling: byte offsets of ≤ 8 sampled frames. */
  def sampleFrames(nFrames: Int, nBytes: Int): Seq[Int] = {
    val take = math.min(8, math.max(nFrames, 1))
    val stride = math.max(1, nFrames / take)
    (0 until take).map(i => 10 + (i * stride * math.max(1, (nBytes - 10) / math.max(nFrames, 1))))
  }

  /** STUB feature extraction: 16-dim embedding = per-chunk byte means
    * (deterministic; the real op runs an encoder model). */
  def embed(bytes: Array[Byte]): Seq[Double] = {
    val payload = bytes.drop(10)
    if (payload.isEmpty) Seq.fill(EmbDim)(0.0)
    else {
      val chunk = math.max(1, payload.length / EmbDim)
      (0 until EmbDim).map { i =>
        val part = payload.slice(i * chunk, math.min((i + 1) * chunk, payload.length))
        if (part.isEmpty) 0.0
        else math.floor(part.map(b => (b & 0xff).toDouble).sum / part.length * 1e6 + 0.5) / 1e6
      }
    }
  }

  /** The pipeline: binary rows → per-partition batched decode + features.
    * (`mapPartitions` = the batch boundary where a real implementation
    * hands Arrow record batches to the codec.) */
  def extract(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, ch, fr) = decode(r.bytes)
        val (tw, th) = thumbDims(w, h)
        MediaFeatures(r.media_id, r.kind, w, h, ch, r.bytes.length, tw, th,
          fr, sampleFrames(fr, r.bytes.length), embed(r.bytes))
      }
    }
  }

  /** Deterministic demo corpus (no media files ship with the harness). */
  def corpus(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].map { id =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      MediaRow(id, kind, synthesize(id, kind))
    }
  }
}
