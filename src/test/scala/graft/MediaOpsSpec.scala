package graft

import graft.multimodal.MediaOps

/** Real-header media decode spec: hand-built PNG/WAV byte fixtures (written
  * out field by field in the test, independent of MediaOps' own
  * synthesizers) must yield the planted dimensions; torn or CRC-broken
  * blobs must degrade to the corrupt row, never throw. */
class MediaOpsSpec extends SparkSpec {

  /** Hand-built PNG: signature, IHDR(49×37, bit depth 8, color type 6 =
    * RGBA), computed CRC — byte-for-byte per the PNG spec, not via
    * MediaOps.synthesizePng. */
  private def handPng(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdrData = Array[Byte](
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      8, colorType.toByte, 0, 0, 0)
    val typed = "IHDR".getBytes("US-ASCII") ++ ihdrData
    val crc = new java.util.zip.CRC32()
    crc.update(typed)
    val c = crc.getValue
    sig ++ Array[Byte](0, 0, 0, 13) ++ typed ++
      Array[Byte]((c >> 24).toByte, (c >> 16).toByte, (c >> 8).toByte, c.toByte)
  }

  /** Hand-built 16-bit stereo PCM WAV at 44100 Hz with 400 data bytes. */
  private def handWav(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 to 24 by 8).foreach(s => out.write(((v >> s) & 0xff).toInt))
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("RIFF".getBytes, 0, 4); w32(36 + 400); out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); w32(16)
    w16(1); w16(2); w32(44100); w32(44100L * 4); w16(4); w16(16)
    out.write("data".getBytes, 0, 4); w32(400)
    out.write(new Array[Byte](400), 0, 400)
    out.toByteArray
  }

  test("PNG IHDR parses width/height/channels; CRC is enforced") {
    assert(MediaOps.decode(handPng(49, 37, 6)) == (49, 37, 4, 1))
    assert(MediaOps.decode(handPng(300, 1, 0)) == (300, 1, 1, 1))
    assert(MediaOps.decode(handPng(16, 16, 2)) == (16, 16, 3, 1))
    // Flip one IHDR byte without recomputing the CRC → corrupt, not 48×37.
    val broken = handPng(49, 37, 6)
    broken(16 + 3) = 48.toByte
    assert(MediaOps.decode(broken) == (-1, -1, -1, -1))
    // Truncated mid-IHDR → corrupt.
    assert(MediaOps.decode(handPng(49, 37, 6).take(20)) == (-1, -1, -1, -1))
  }

  test("WAV fmt/data chunks parse rate/bits/channels/frames") {
    // 400 data bytes / blockAlign 4 = 100 sample frames.
    assert(MediaOps.decode(handWav()) == (44100, 16, 2, 100))
    // Torn after the fmt chunk: rate/channels survive, frames = 0.
    assert(MediaOps.decode(handWav().take(40)) == (44100, 16, 2, 0))
    // RIFF but not WAVE → corrupt.
    val avi = handWav(); avi(8) = 'A'; avi(9) = 'V'; avi(10) = 'I'; avi(11) = ' '
    assert(MediaOps.decode(avi) == (-1, -1, -1, -1))
  }

  /** Hand-built baseline JPEG: SOI, APP0 (JFIF), a DQT filler segment, SOF0
    * with the planted dims, SOS, junk entropy data, EOI — written marker by
    * marker per the JPEG spec, independent of MediaOps.synthesizeJpeg. */
  private def handJpeg(w: Int, h: Int, nc: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { b(v >> 8); b(v) }
    b(0xff); b(0xd8)
    b(0xff); b(0xe0); w16(16)
    out.write("JFIF".getBytes, 0, 4); b(0); b(1); b(2); b(0); w16(72); w16(72); b(0); b(0)
    b(0xff); b(0xdb); w16(2 + 65); b(0) // DQT: the walk must skip it
    (0 until 64).foreach(i => b(i))
    b(0xff); b(0xc0); w16(8 + 3 * nc)
    b(8); w16(h); w16(w); b(nc)
    (0 until nc).foreach { c => b(c + 1); b(0x22); b(0) }
    b(0xff); b(0xda); w16(6 + 2 * nc); b(nc)
    (0 until nc).foreach { c => b(c + 1); b(0) }
    b(0); b(63); b(0)
    b(0x12); b(0x34); b(0x56)
    b(0xff); b(0xd9)
    out.toByteArray
  }

  test("JPEG SOF0 marker walk parses width/height/components") {
    assert(MediaOps.decode(handJpeg(640, 480, 3)) == (640, 480, 3, 1))
    assert(MediaOps.decode(handJpeg(1, 2, 1)) == (1, 2, 1, 1))
    // Truncated before SOF0 → corrupt, not a throw.
    assert(MediaOps.decode(handJpeg(640, 480, 3).take(12)) == (-1, -1, -1, -1))
    // SOI + EOI only (no frame header) → corrupt.
    assert(MediaOps.decode(Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte)) ==
      (-1, -1, -1, -1))
  }

  test("WAV fmt chunk shorter than 16 declared bytes is corrupt, not misparsed") {
    // fmt declares size 4: the 16 format bytes are NOT there — reading
    // them would interpret the next chunk's header as rate/channels
    // (ADVICE round 5). Must yield the corrupt row.
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 to 24 by 8).foreach(s => out.write(((v >> s) & 0xff).toInt))
    out.write("RIFF".getBytes, 0, 4); w32(100); out.write("WAVE".getBytes, 0, 4)
    out.write("fmt ".getBytes, 0, 4); w32(4); w32(0) // short fmt, 4 junk bytes
    out.write("data".getBytes, 0, 4); w32(8); w32(0); w32(0)
    assert(MediaOps.decode(out.toByteArray) == (-1, -1, -1, -1))
  }

  test("synthesized corpus blobs are real PNG/WAV; corrupt ids degrade") {
    assert(MediaOps.decode(MediaOps.synthesize(0, "image"))._3 >= 1) // PNG channels
    assert(MediaOps.synthesize(0, "image").take(4).sameElements(
      Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)))
    // Odd image ids are JPEG (SOI marker), and their dims parse.
    assert(MediaOps.synthesize(3, "image").take(2).sameElements(
      Array(0xff, 0xd8).map(_.toByte)))
    val (jw, jh, jc, _) = MediaOps.decode(MediaOps.synthesize(3, "image"))
    assert(jw >= 16 && jw <= 255 && jh >= 16 && jh <= 255 && (jc == 1 || jc == 3))
    assert(new String(MediaOps.synthesize(1, "audio").take(4), "US-ASCII") == "RIFF")
    assert(new String(MediaOps.synthesize(2, "video").take(4), "US-ASCII") == "GRFT")
    // Every 50th id is torn garbage → the corrupt row.
    assert(MediaOps.decode(MediaOps.synthesize(49, "audio")) == (-1, -1, -1, -1))
  }

  test("contentPlane extracts exactly the codec payload per container") {
    val payload = Array.tabulate(120)(i => (i * 7 + 3).toByte)
    assert(MediaOps.contentPlane(
      MediaOps.synthesizePng(20, 30, 2, payload)).sameElements(payload))
    assert(MediaOps.contentPlane(
      MediaOps.synthesizeJpeg(20, 30, 3, payload)).sameElements(payload))
    assert(MediaOps.contentPlane(
      MediaOps.synthesizeWav(8000, 1, 16, payload)).sameElements(payload))
    // Corrupt blobs yield the empty plane, never throw.
    assert(MediaOps.contentPlane(Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(MediaOps.contentPlane(null).isEmpty)
  }

  test("aHash64: fixed-threshold block bits, hand-computed") {
    // 64-byte plane: first 32 chunks (1 byte each) at 255, rest at 0 →
    // exactly the 32 high bits set.
    val plane = Array.tabulate(64)(i => if (i < 32) 0xff.toByte else 0x00.toByte)
    assert(MediaOps.aHash64(plane) == 0xFFFFFFFF00000000L)
    // Short planes are the no-content sentinel.
    assert(MediaOps.aHash64(new Array[Byte](63)) == 0L)
    // A single-byte bump in the first half can only touch high-band bits.
    val p2 = plane.clone(); p2(5) = 0x00.toByte
    val d = MediaOps.aHash64(plane) ^ MediaOps.aHash64(p2)
    assert((d & 0xFFFFFFFFL) == 0L && java.lang.Long.bitCount(d) == 1)
  }

  test("phash near-dup corpus: variant within 6 bits, low bands identical") {
    (0 until 60 by 3).filter(b => b % 50 != 49 && (b + 1) % 50 != 49)
      .foreach { b =>
        val hb = MediaOps.aHash64(MediaOps.contentPlane(
          MediaOps.synthesizeNearDup(b)))
        val hv = MediaOps.aHash64(MediaOps.contentPlane(
          MediaOps.synthesizeNearDup(b + 1)))
        assert(hb != 0L && hv != 0L)
        assert(MediaOps.hamming64(hb, hv) <= 6, s"triple $b drifted")
        assert((hb & 0xFFFFFFFFL) == (hv & 0xFFFFFFFFL),
          s"triple $b: low bands must be untouched by first-half bumps")
      }
    // Torn ids hash to the sentinel.
    assert(MediaOps.aHash64(MediaOps.contentPlane(
      MediaOps.synthesizeNearDup(49))) == 0L)
  }

  test("pcmSamples round-trips signed 16-bit little-endian PCM") {
    val samples = Array[Int](0, 100, -100, 32767, -32768, 1, -1)
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (x, i) =>
      data(2 * i) = (x & 0xff).toByte; data(2 * i + 1) = ((x >> 8) & 0xff).toByte
    }
    val wav = MediaOps.synthesizeWav(16000, 1, 16, data)
    assert(MediaOps.pcmSamples(wav).sameElements(samples))
    assert(MediaOps.pcmSamples(Array[Byte](1, 2, 3, 4)).isEmpty)
  }

  test("audioWindows: exact energy/zero-crossing/peak on a square wave") {
    import spark.implicits._
    // 130 samples alternating +100/−100: 2 full 64-sample windows (the
    // trailing partial 2 samples drop), every adjacent pair crosses.
    val data = new Array[Byte](260)
    (0 until 130).foreach { i =>
      val x = if (i % 2 == 0) 100 else -100
      data(2 * i) = (x & 0xff).toByte; data(2 * i + 1) = ((x >> 8) & 0xff).toByte
    }
    val wav = MediaOps.synthesizeWav(8000, 1, 16, data)
    val rows = MediaOps.audioWindows(
      Seq(MediaOps.MediaRow(7L, "audio", wav)).toDS()).collect()
      .sortBy(_.win_idx)
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.n_samples == 64 && r.sum_sq == 64L * 10000 && r.peak == 100)
      assert(r.rate == 8000)
    }
    // Window 0 starts sign-free: 63 crossings; window 1 inherits no state
    // across windows (lastSign resets), also 63.
    assert(rows.forall(_.zero_crossings == 63))
  }

  test("phash banding economics: candidate pairs track planted + birthday bound") {
    import org.apache.spark.sql.functions._
    // The scale contract of 4×16-bit-band LSH: candidates = planted
    // near-dups (linear in n) + accidental band collisions, whose count
    // must match the analytic birthday rate 4·C(m,2)/2^16 — NOT a
    // quadratic blow-up. Checked at two corpus sizes so a banding
    // regression (e.g. a shrunken key space) fails the bound at the
    // larger n where it hurts.
    Seq(1800, 5400).foreach { n =>
      import spark.implicits._
      val hashed = graft.multimodal.MediaOps.phashCorpus(spark, n)
        .map(r => (r.media_id,
          graft.multimodal.MediaOps.aHash64(
            graft.multimodal.MediaOps.contentPlane(r.bytes))))
        .toDF("media_id", "phash").filter(col("phash") =!= 0L)
      val bands = hashed.select(col("media_id"),
        explode(array((0 until 4).map(j =>
          shiftrightunsigned(col("phash"), 16 * j).bitwiseAND(lit(65535L)) +
            lit(j * 65536L)): _*)).as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.bk") === col("y.bk") && col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id"), col("y.media_id")).distinct().count()
      val m = hashed.count()
      val planted = hashed.as("x").join(hashed.as("y"),
        col("y.media_id") === col("x.media_id") + 1 &&
          col("x.media_id") % 3 === 0).count()
      val birthday = 4.0 * m * (m - 1) / 2 / 65536.0
      assert(cand >= planted, s"n=$n: banding must find every planted pair")
      assert(cand - planted <= 2 * birthday + 50,
        s"n=$n: accidental collisions $cand-$planted exceed 2x the " +
          s"birthday bound $birthday — band key space shrunk?")
    }
  }

  test("extract pipeline over a mixed corpus: real dims, corrupt rows counted") {
    val feats = MediaOps.extract(MediaOps.corpus(spark, 150)).collect()
    assert(feats.length == 150)
    val byKind = feats.groupBy(_.kind)
    // Images: PNG dims within the synthesizer's 16..255 range.
    assert(byKind("image").filter(_.width > 0)
      .forall(f => f.width >= 16 && f.width <= 255 && f.channels >= 1))
    // Audio: width carries the sample rate.
    assert(byKind("audio").filter(_.width > 0)
      .forall(f => Set(8000, 16000, 22050, 44100)(f.width) && f.n_frames > 0))
    // ids 49, 99, 149 are torn (one per kind here).
    assert(feats.count(_.width == -1) == 3)
    // Determinism: the whole pipeline is seed-driven.
    val again = MediaOps.extract(MediaOps.corpus(spark, 150)).collect()
    assert(feats.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
