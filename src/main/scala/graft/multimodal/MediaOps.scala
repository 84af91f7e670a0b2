package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages (north-star multimodal operators).
  *
  * The metadata decode is REAL for the two formats a JVM can parse with no
  * external libraries: PNG (signature + IHDR width/height/channels, CRC32-
  * verified) and WAV (RIFF chunk walk → fmt sample-rate/channels/bits +
  * data frame count). Header parsing is also the right 100 TB shape: a
  * metadata pass must not decompress pixels/samples to learn dimensions.
  * Only two stages remain declared stubs — the video container (no
  * standard video format parses trivially in pure JVM; the `GRFT`
  * synthetic container stands in) and the embedding (per-chunk byte means
  * where production runs an encoder model). In production those bodies
  * become the real codec call (JNI/javacv or an Arrow `mapInArrow`/
  * `mapInPandas` hop to a Python worker); every signature, batch shape,
  * and downstream schema stays unchanged.
  *
  * Execution shape: `mapPartitions` over the binary rows — the Scala
  * analogue of `mapInPandas` batches. Per-row independent compute: no
  * shuffle, linear scans, embarrassingly parallel at any scale; binary
  * blobs never leave the executor that read them. Malformed blobs yield
  * width = -1 rows (never throw — a 100 TB corpus WILL contain garbage).
  */
object MediaOps {

  /** Raw media row: what a 100 TB media lakehouse table looks like. */
  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata + derived features. For audio, `width` carries the
    * sample rate and `height` the bits per sample (the natural "dims" of a
    * PCM stream); `n_frames` is sample frames for audio, container frames
    * for video, 1 for stills. */
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

  /** One sampled frame's feature row (the per-frame table a video
    * pipeline lands): the byte window at the sampled offset summarized as
    * an exact unsigned-byte sum — a STUB for the codec's frame decode;
    * the Spark-side plumbing (flatMap explosion, schema, bounds) is
    * real. `media_bytes` rides along so the offset contract is checkable
    * downstream without rejoining the blob table. */
  final case class FrameFeature(
      media_id: Long,
      kind: String,
      frame_idx: Int,
      frame_off: Int,
      media_bytes: Int,
      win_len: Int,
      byte_sum: Long)

  val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
  val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  val EmbDim = 16
  val ThumbMax = 64
  /** Per-frame summarization window, bytes. */
  val FrameWin = 64

  private def u32be(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length &&
      s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  private val Corrupt = (-1, -1, -1, -1)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per spec):
    * length(4) "IHDR" width(4,BE) height(4,BE) bitDepth(1) colorType(1)
    * … crc(4, over type+data). The CRC is verified — a torn blob with an
    * intact prefix must not yield plausible-looking dimensions. Returns
    * (width, height, channels-from-color-type, 1). */
  def decodePng(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    if (bytes.length < 33 || !bytes.take(8).sameElements(PngSig)) return Corrupt
    if (u32be(bytes, 8) != 13 || !ascii(bytes, 12, "IHDR")) return Corrupt
    val crc = new java.util.zip.CRC32()
    crc.update(bytes, 12, 17) // "IHDR" + 13 data bytes
    if (crc.getValue != u32be(bytes, 29)) return Corrupt
    val w = u32be(bytes, 16)
    val h = u32be(bytes, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return Corrupt
    val channels = (bytes(25) & 0xff) match {
      case 0 => 1 // greyscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // grey + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return Corrupt
    }
    (w.toInt, h.toInt, channels, 1)
  }

  /** WAV: "RIFF" … "WAVE", then a chunk walk for "fmt " (channels,
    * sample rate, block align, bits/sample) and "data" (payload size).
    * Returns (sampleRate, bitsPerSample, channels, sampleFrames). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    if (!ascii(bytes, 0, "RIFF") || !ascii(bytes, 8, "WAVE")) return Corrupt
    // The walk offset is a LONG: chunk sizes are u32 (up to 4 GiB-1), and
    // Int advance arithmetic can wrap negative on a >1 GiB blob whose
    // chunk sizes pass the length guard — the next access would then throw
    // AIOOBE, violating the never-throw contract (ADVICE round 5). Every
    // byte access below is guarded by `off + 8 <= bytes.length`, so the
    // Int cast at the access site is exact.
    var off = 12L
    var rate = -1; var bits = -1; var ch = -1; var blockAlign = -1
    var dataLen = -1L
    var walking = true
    while (walking && off + 8 <= bytes.length) {
      val o = off.toInt
      val size = u32le(bytes, o + 4)
      if (size > bytes.length) walking = false // torn chunk header: stop,
      else {                                   // keep whatever parsed so far
        // fmt fields are read only when the chunk DECLARES them: a
        // malformed fmt chunk with size < 16 must yield the corrupt row,
        // not silently read the next chunk's header bytes as
        // rate/channels/bits (ADVICE round 5).
        if (ascii(bytes, o, "fmt ") && size >= 16 && off + 8 + 16 <= bytes.length) {
          ch = u16le(bytes, o + 10)
          rate = u32le(bytes, o + 12).toInt
          blockAlign = u16le(bytes, o + 20)
          bits = u16le(bytes, o + 22)
        } else if (ascii(bytes, o, "data")) {
          dataLen = math.min(size, bytes.length - off - 8L)
        }
        // Chunks are word-aligned: odd sizes carry a pad byte.
        off += 8L + size + (size & 1L)
      }
    }
    if (rate <= 0 || ch <= 0) Corrupt
    else {
      val frames =
        if (dataLen < 0 || blockAlign <= 0) 0
        else math.min(dataLen / blockAlign, Int.MaxValue.toLong).toInt
      (rate, bits, ch, frames)
    }
  }

  /** JPEG: SOI (FF D8), then a marker walk — FF xx markers, each (except
    * the standalone RST/TEM markers) carrying a 2-byte big-endian length
    * that includes itself — until a SOF frame header (C0-CF minus the
    * non-frame C4/C8/CC): precision(1) height(2,BE) width(2,BE)
    * nComponents(1). Dimensions come from the frame header alone — no
    * entropy-coded data is touched, the right metadata-pass shape.
    * Returns (width, height, components, 1). */
  def decodeJpeg(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    if (bytes.length < 4 ||
      (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8) return Corrupt
    var off = 2L // Long for the same >1 GiB wrap reason as the WAV walk
    while (off + 4 <= bytes.length) {
      var o = off.toInt
      if ((bytes(o) & 0xff) != 0xff) return Corrupt
      // Consecutive 0xFF bytes between segments are legal fill (ITU T.81
      // §B.1.1.2): skip them so a padded file isn't misread as a marker
      // 0xFF with two payload bytes as its length (round-6 ADVICE).
      while (o + 4 <= bytes.length && (bytes(o + 1) & 0xff) == 0xff) {
        o += 1; off += 1
      }
      if (o + 4 > bytes.length) return Corrupt // fill ran into the tail
      val marker = bytes(o + 1) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        off += 2 // standalone markers: no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return Corrupt // EOI or start-of-scan before any SOF: no frame header
      } else {
        val len = ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
        if (len < 2 || off + 2 + len > bytes.length) return Corrupt
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (len < 8) return Corrupt // must hold precision+dims+ncomp
          val h = ((bytes(o + 5) & 0xff) << 8) | (bytes(o + 6) & 0xff)
          val w = ((bytes(o + 7) & 0xff) << 8) | (bytes(o + 8) & 0xff)
          val nc = bytes(o + 9) & 0xff
          if (w <= 0 || h <= 0 || nc <= 0) return Corrupt
          return (w, h, nc, 1)
        }
        off += 2L + len
      }
    }
    Corrupt
  }

  /** Synthetic `GRFT` container (the declared VIDEO stub — no standard
    * video container parses trivially in pure JVM): GRFT | w u16 | h u16 |
    * ch u8 | frames u8 | payload. */
  def decodeGrft(bytes: Array[Byte]): (Int, Int, Int, Int) =
    if (bytes.length < 10 || !bytes.take(4).sameElements(Magic)) Corrupt
    else (
      ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff),
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff),
      bytes(8) & 0xff,
      bytes(9) & 0xff)

  /** Format dispatch on magic bytes — the shape of a real media-lake
    * decode stage (the column is opaque binary; the FORMAT is data). */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Int) =
    if (bytes == null || bytes.length < 4) Corrupt
    else if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) decodePng(bytes)
    else if (ascii(bytes, 0, "RIFF")) decodeWav(bytes)
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) decodeJpeg(bytes)
    else if (bytes.take(4).sameElements(Magic)) decodeGrft(bytes)
    else Corrupt

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

  /** Frame explosion: one row per sampled frame of every DECODABLE blob
    * (corrupt rows contribute none — they are the metadata pass's
    * `media_features` n_corrupt problem, not the frame table's). The
    * shape is the scale contract: a flatMap over the blob scan whose
    * output is rows-per-frame, never a collected frame list — at 100 TB
    * the frame table is written directly from this pass, partitioned
    * like its source. */
  def frameFeatures(media: Dataset[MediaRow]): Dataset[FrameFeature] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val (w, _, _, fr) = decode(r.bytes)
      if (w == -1) Seq.empty
      else sampleFrames(fr, r.bytes.length).zipWithIndex.map { case (off, i) =>
        val win = r.bytes.slice(off, math.min(off + FrameWin, r.bytes.length))
        FrameFeature(r.media_id, r.kind, i, off, r.bytes.length, win.length,
          win.map(b => (b & 0xff).toLong).sum)
      }
    }
  }

  // ---------------------------------------------------------------------
  // Content planes: the byte region a CODEC would decode to pixels/samples.
  // The container walk (chunk/marker/RIFF parsing) is real; what a codec
  // would do with the extracted region is the declared stub boundary —
  // perceptual features below operate on the raw plane bytes where
  // production would operate on decoded pixels (same signatures, same
  // downstream schema).
  // ---------------------------------------------------------------------

  /** The content plane of a blob: PNG → concatenated IDAT payloads (a real
    * chunk walk, CRC-gated IHDR as in [[decodePng]]), JPEG → the
    * entropy-coded region between SOS and EOI, WAV → the data chunk,
    * GRFT → the post-header payload. Corrupt/unknown → empty (the blob
    * contributes no perceptual rows — never throws). */
  def contentPlane(bytes: Array[Byte]): Array[Byte] = {
    if (bytes == null || bytes.length < 4) return Array.emptyByteArray
    if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) {
      if (decodePng(bytes)._1 == -1) return Array.emptyByteArray
      val out = new java.io.ByteArrayOutputStream()
      var off = 8L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val size = u32be(bytes, o)
        if (size > bytes.length || off + 8 + size > bytes.length) off = bytes.length
        else {
          if (ascii(bytes, o + 4, "IDAT")) out.write(bytes, o + 8, size.toInt)
          off += 12L + size // len(4) + type(4) + data + crc(4)
        }
      }
      out.toByteArray
    } else if (ascii(bytes, 0, "RIFF")) {
      if (decodeWav(bytes)._1 == -1) return Array.emptyByteArray
      var off = 12L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val size = u32le(bytes, o + 4)
        if (size > bytes.length) return Array.emptyByteArray
        if (ascii(bytes, o, "data")) {
          val n = math.min(size, bytes.length - off - 8L).toInt
          return java.util.Arrays.copyOfRange(bytes, o + 8, o + 8 + n)
        }
        off += 8L + size + (size & 1L)
      }
      Array.emptyByteArray
    } else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      if (decodeJpeg(bytes)._1 == -1) return Array.emptyByteArray
      // Scan for the SOS marker, then take everything up to EOI.
      var i = 2
      while (i + 4 <= bytes.length) {
        if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xda) {
          val len = ((bytes(i + 2) & 0xff) << 8) | (bytes(i + 3) & 0xff)
          val start = i + 2 + len
          val end = // strip the trailing EOI if present
            if (bytes.length >= 2 && (bytes(bytes.length - 2) & 0xff) == 0xff &&
              (bytes(bytes.length - 1) & 0xff) == 0xd9) bytes.length - 2
            else bytes.length
          return if (start >= end) Array.emptyByteArray
          else java.util.Arrays.copyOfRange(bytes, start, end)
        }
        i += 1
      }
      Array.emptyByteArray
    } else if (bytes.take(4).sameElements(Magic)) {
      if (bytes.length <= 10) Array.emptyByteArray
      else java.util.Arrays.copyOfRange(bytes, 10, bytes.length)
    } else Array.emptyByteArray
  }

  /** 64-bit average-hash (blockhash family) over the content plane: the
    * plane is split into 64 equal chunks; bit i (MSB-first) is set when
    * chunk i's mean byte value ≥ 128 — a FIXED mid-scale threshold, not
    * the plane mean, so a local perturbation can only flip the bits of
    * the chunks it touches (no global coupling; this is what makes the
    * planted-recall contract in `media_phash_dedup` structural rather
    * than statistical). Planes shorter than 64 bytes hash to 0L exactly
    * like empty planes — callers treat 0 as "no perceptual content".
    * Integer-exact: bit i set ⇔ 2·chunkSum ≥ 256·chunkLen. */
  def aHash64(plane: Array[Byte]): Long = {
    val L = plane.length
    if (L < 64) return 0L
    var h = 0L
    var i = 0
    while (i < 64) {
      val from = (i.toLong * L / 64).toInt
      val to = ((i + 1).toLong * L / 64).toInt
      var sum = 0L
      var j = from
      while (j < to) { sum += (plane(j) & 0xff); j += 1 }
      if (2 * sum >= 256L * (to - from)) h |= 1L << (63 - i)
      i += 1
    }
    h
  }

  /** Hamming distance between two 64-bit perceptual hashes. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---------------------------------------------------------------------
  // PCM sample features (the audio analogue of the frame table): real
  // 16-bit little-endian decode of the WAV data chunk.
  // ---------------------------------------------------------------------

  /** Interleaved signed 16-bit PCM samples of a WAV blob (all channels,
    * frame order — windowed features below don't de-interleave, matching
    * an energy/activity pass that treats the stream as one signal).
    * Non-WAV/corrupt/odd-length planes → empty. */
  def pcmSamples(bytes: Array[Byte]): Array[Int] = {
    if (!ascii(bytes, 0, "RIFF")) return Array.emptyIntArray
    val (_, bits, _, _) = decodeWav(bytes)
    if (bits != 16) return Array.emptyIntArray
    val plane = contentPlane(bytes)
    val n = plane.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((plane(2 * i) & 0xff) | (plane(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** One audio analysis window: exact integer features over [[WinSamples]]
    * PCM samples (the last partial window is dropped — every emitted
    * window has exactly [[WinSamples]] samples, which keeps the energy
    * scale comparable across windows and the contract checkable). */
  final case class AudioWindow(
      media_id: Long,
      rate: Int,
      win_idx: Int,
      n_samples: Int,
      sum_sq: Long,
      zero_crossings: Int,
      peak: Int)

  /** Samples per analysis window. */
  val WinSamples = 64

  /** Windowed PCM features: energy (exact Σx², BIGINT), zero-crossing
    * count (sign changes between consecutive samples, zeros carrying the
    * previous sign), peak |x|. flatMap shape: one row per window straight
    * off the blob scan, no shuffle — the media_frames explosion contract
    * applied to audio. */
  def audioWindows(media: Dataset[MediaRow]): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val pcm = pcmSamples(r.bytes)
      val (rate, _, _, _) = decodeWav(r.bytes)
      if (pcm.length < WinSamples || rate <= 0) Seq.empty
      else (0 until pcm.length / WinSamples).map { wi =>
        var sumSq = 0L; var zc = 0; var peak = 0
        var lastSign = 0
        var j = wi * WinSamples
        val end = j + WinSamples
        while (j < end) {
          val x = pcm(j)
          sumSq += x.toLong * x
          val a = math.abs(x)
          if (a > peak) peak = a
          val sign = if (x > 0) 1 else if (x < 0) -1 else lastSign
          if (sign != 0 && lastSign != 0 && sign != lastSign) zc += 1
          if (sign != 0) lastSign = sign
          j += 1
        }
        AudioWindow(r.media_id, rate, wi, WinSamples, sumSq, zc, peak)
      }
    }
  }

  // ---------------------------------------------------------------------
  // Deterministic synthetic corpus (no media files ship with the harness;
  // the IMAGE and AUDIO blobs are real PNG/WAV bytes — a stock decoder
  // would accept their headers).
  // ---------------------------------------------------------------------

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (24 to 0 by -8).foreach(s => out.write(((v >> s) & 0xff).toInt))
    w32(data.length)
    val body = chunkType.getBytes("US-ASCII") ++ data
    out.write(body, 0, body.length)
    val crc = new java.util.zip.CRC32()
    crc.update(body)
    w32(crc.getValue)
    out.toByteArray
  }

  /** Real PNG bytes: signature + CRC-correct IHDR + one (junk-payload)
    * IDAT + IEND. Header-complete; only the pixel payload is filler. */
  def synthesizePng(w: Int, h: Int, colorType: Int, payload: Array[Byte]): Array[Byte] = {
    val ihdr = Array[Byte](
      ((w >> 24) & 0xff).toByte, ((w >> 16) & 0xff).toByte,
      ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
      ((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
      ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
      8, colorType.toByte, 0, 0, 0) // bit depth 8, deflate, std filter, no interlace
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", payload) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Real PCM WAV bytes: RIFF/WAVE + fmt + data. */
  def synthesizeWav(rate: Int, channels: Int, bits: Int, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 to 24 by 8).foreach(s => out.write(((v >> s) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    val blockAlign = channels * bits / 8
    tag("RIFF"); w32(36L + data.length); tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(channels); w32(rate.toLong)
    w32(rate.toLong * blockAlign); w16(blockAlign); w16(bits)
    tag("data"); w32(data.length)
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** Real JPEG bytes: SOI + JFIF APP0 + SOF0 with the given dims + a
    * minimal SOS + junk entropy payload + EOI. Header-complete for any
    * marker-walking parser; only the entropy-coded data is filler. */
  def synthesizeJpeg(w: Int, h: Int, channels: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8) // SOI
    b(0xff); b(0xe0); w16(16) // APP0, JFIF v1.1
    out.write("JFIF".getBytes("US-ASCII"), 0, 4); b(0)
    b(1); b(1); b(0); w16(1); w16(1); b(0); b(0)
    b(0xff); b(0xc0); w16(8 + 3 * channels) // SOF0 frame header
    b(8); w16(h); w16(w); b(channels)
    (0 until channels).foreach { c => b(c + 1); b(0x11); b(0) }
    b(0xff); b(0xda); w16(6 + 2 * channels) // SOS
    b(channels)
    (0 until channels).foreach { c => b(c + 1); b(0) }
    b(0); b(63); b(0)
    out.write(payload, 0, payload.length)
    b(0xff); b(0xd9) // EOI
    out.toByteArray
  }

  /** Deterministic per-id blob: image → PNG or JPEG (alternating — kind is
    * the MODALITY, the byte format is data), audio → WAV, video → GRFT;
    * every 50th id is torn garbage (the resilience path must be exercised
    * by the corpus, not just by specs). */
  def synthesize(id: Long, kind: String): Array[Byte] = {
    val rnd = new scala.util.Random(id * 2654435761L + kind.hashCode)
    if (id % 50 == 49) {
      val junk = new Array[Byte](8 + rnd.nextInt(64))
      rnd.nextBytes(junk)
      return junk
    }
    kind match {
      case "image" =>
        val payload = new Array[Byte](64 + rnd.nextInt(192))
        rnd.nextBytes(payload)
        val w = 16 + rnd.nextInt(240)
        val h = 16 + rnd.nextInt(240)
        if (id % 2 == 0) {
          val colorType = Seq(0, 2, 6)(rnd.nextInt(3))
          synthesizePng(w, h, colorType, payload)
        } else {
          synthesizeJpeg(w, h, Seq(1, 3)(rnd.nextInt(2)), payload)
        }
      case "audio" =>
        val data = new Array[Byte](128 + rnd.nextInt(256))
        rnd.nextBytes(data)
        val rate = Seq(8000, 16000, 22050, 44100)(rnd.nextInt(4))
        synthesizeWav(rate, 1 + rnd.nextInt(2), 16, data)
      case _ =>
        val w = 16 + rnd.nextInt(240)
        val h = 16 + rnd.nextInt(240)
        val frames = 1 + rnd.nextInt(30)
        val payload = new Array[Byte](64 + rnd.nextInt(192))
        rnd.nextBytes(payload)
        Array[Byte](Magic(0), Magic(1), Magic(2), Magic(3),
          (w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte,
          3, frames.toByte) ++ payload
    }
  }

  /** Deterministic image corpus WITH PLANTED NEAR-DUPLICATES for the
    * perceptual-dedup query: ids come in triples — 3k is a base image,
    * 3k+1 a re-encode-style near-dup of it (same dims, same payload
    * length, ≤ 6 bytes bumped, all within the FIRST HALF of the payload
    * so at most 6 of the 64 aHash chunks — all in the top two 16-bit
    * bands — can change; the bottom two bands are bit-identical BY
    * CONSTRUCTION, which is what makes LSH-band recall a structural
    * guarantee), 3k+2 an unrelated image. PNG/JPEG alternate per triple
    * (the near-dup shares its base's byte format — planes must align).
    * Every 50th id is torn garbage, as in [[corpus]]. */
  def phashCorpus(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).select(col("id")).as[Long].map { id =>
      MediaRow(id, "image", synthesizeNearDup(id))
    }
  }

  /** Blob builder for [[phashCorpus]] (exposed for spec use). */
  def synthesizeNearDup(id: Long): Array[Byte] = {
    if (id % 50 == 49) {
      val rnd = new scala.util.Random(id * 2654435761L + 17)
      val junk = new Array[Byte](8 + rnd.nextInt(64))
      rnd.nextBytes(junk)
      return junk
    }
    val base = id - (id % 3)
    val baseRnd = new scala.util.Random(base * 2654435761L + 7)
    val w = 16 + baseRnd.nextInt(240)
    val h = 16 + baseRnd.nextInt(240)
    val png = base % 2 == 0
    val basePayload = new Array[Byte](96 + baseRnd.nextInt(160))
    baseRnd.nextBytes(basePayload)
    val payload = (id % 3) match {
      case 0 => basePayload
      case 1 =>
        val p = basePayload.clone()
        val vr = new scala.util.Random(id * 2654435761L + 13)
        val bumps = 1 + vr.nextInt(6)
        (0 until bumps).foreach { _ =>
          val pos = vr.nextInt(math.max(1, p.length / 2 - 4))
          p(pos) = (p(pos) + 1 + vr.nextInt(16)).toByte
        }
        p
      case _ =>
        val vr = new scala.util.Random(id * 2654435761L + 29)
        val p = new Array[Byte](basePayload.length)
        vr.nextBytes(p)
        p
    }
    if (png) synthesizePng(w, h, 2, payload)
    else synthesizeJpeg(w, h, 3, payload)
  }

  /** Deterministic demo corpus. */
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
