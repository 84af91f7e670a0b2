package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.MediaOps
import graft.sources.Pcap

/** Custom-source suite: the PCAP binary decode chain (SURVEY §2.1 S2-S4 —
  * the reference's one genuinely custom source) and the multimodal
  * binary-column pipeline. No pcap/media files ship with the harness, so
  * both queries synthesize deterministic binary inputs driver-side,
  * distribute them, and run the real executor-side decode path — the same
  * plan shape as production (binaryFiles → flatMap decode → toDF), minus
  * only the filesystem hop.
  *
  * Oracle strategy: DuckDB cannot decode pcap, but the decoded packet
  * table is perfectly relational — so the decode output is dumped ONCE per
  * JVM to a pid-keyed parquet directory and every aggregate gets a DuckDB
  * twin over that dump. The Spark side still aggregates the LIVE decode
  * plan, so a decode/aggregation divergence (or a dump that drifts from
  * the live rows) fails the hash. `pcap_decode_v2` aggregates the
  * DataSource-V2 route but keeps the RDD-route dump as its oracle input —
  * the oracle therefore also pins cross-route decode equality. Byte-level
  * decode correctness stays pinned by PcapDecoderSpec round-trips.
  */
object SourceQueries {
  import QuerySpec._

  /** Deterministic per-file packet specs (shared by the RDD and V2 query
    * twins). Small address/port pools → flows recur, so IAT/jitter KPIs
    * see real multi-packet sequences (random 5-tuples would make every
    * flow a singleton and zero out the temporal block). */
  private def fileSpecs(f: Int, perFile: Int) =
    (0 until perFile).map { i =>
      val rnd = new scala.util.Random(f * 100000L + i)
      (1700000000L + i / 50, rnd.nextInt(1000000).toLong,
        1 + rnd.nextInt(6), 1 + rnd.nextInt(6),
        1000 + rnd.nextInt(4), if (rnd.nextBoolean()) 80 else 443,
        if (rnd.nextBoolean()) 6 else 17,
        rnd.nextInt(1 << 30).toLong, if (rnd.nextInt(20) == 0) 0x04 else 0x10,
        rnd.nextInt(65536), rnd.nextInt(256))
    }

  private val SliceNames = Seq("eMBB", "URLLC", "mMTC")

  /** Deterministic synthetic pcap corpus decoded on executors, with a
    * within-file packet index (`pkt_idx`). The index makes per-flow window
    * ordering TOTAL — `(ts_sec, fileName, pkt_idx)` is unique by
    * construction — so lag-derived IAT is deterministic under any
    * partitioning and reproducible in the DuckDB twin (a seq/port
    * tie-break would only be probabilistically unique). */
  private def decodedPackets(s: SparkSession): DataFrame = {
    import s.implicits._
    val filesRdd = s.sparkContext.parallelize(0 until 8, 8).map { f =>
      val slice = SliceNames(f % 3)
      (s"file_$f.pcap", slice, Pcap.synthesize(fileSpecs(f, 500)))
    }
    filesRdd.flatMap { case (name, slice, bytes) =>
      Pcap.decodeStream(new java.io.ByteArrayInputStream(bytes), slice, name)
        .zipWithIndex.map { case (p, i) => (p, i.toLong) }
    }.toDF("p", "pkt_idx").select(col("p.*"), col("pkt_idx"))
  }

  /** Parquet dump of [[decodedPackets]] for the DuckDB oracles. Pid-keyed:
    * Bench and Verify run as separate JVMs sharing java.io.tmpdir, and a
    * shared path could race (ADVICE round 4). Written once per JVM; the
    * oracle SQL built in the same JVM references the same path. */
  private val DumpDir = TmpDirs.persistent(
    s"graft_pcap_dump_${ProcessHandle.current().pid()}").getAbsolutePath

  /** Oracle-dump dir for the decoded media feature rows (same lifecycle). */
  private val MediaDumpDir = TmpDirs.persistent(
    s"graft_media_dump_${ProcessHandle.current().pid()}").getAbsolutePath

  /** Oracle-dump dir for the per-frame feature rows (same lifecycle). */
  private val FrameDumpDir = TmpDirs.persistent(
    s"graft_frame_dump_${ProcessHandle.current().pid()}").getAbsolutePath

  /** Per-frame feature rows as a LocalRelation, dumped ONCE per JVM for
    * the DuckDB twins (shared by media_frames and media_scene_cuts — the
    * dump must exist for either query's oracle regardless of which of
    * the two runs in a filtered Verify). Bounded: ≤ 8 × 3 000 rows. */
  @volatile private var framesDumped = false
  private def framesLocal(s: SparkSession): DataFrame = {
    val frames = MediaOps.frameFeatures(MediaOps.corpus(s, 3000)).toDF()
    val rows = frames.collect()
    val local = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), frames.schema)
    if (!framesDumped) synchronized {
      if (!framesDumped) {
        local.coalesce(1).write.mode("overwrite").parquet(FrameDumpDir)
        framesDumped = true
      }
    }
    local
  }

  /** Oracle-dump dir for the perceptual-hash rows (same lifecycle). */
  private val PhashDumpDir = TmpDirs.persistent(
    s"graft_phash_dump_${ProcessHandle.current().pid()}").getAbsolutePath

  /** Oracle-dump dir for the audio-window rows (same lifecycle). */
  private val AudioDumpDir = TmpDirs.persistent(
    s"graft_audio_dump_${ProcessHandle.current().pid()}").getAbsolutePath
  @volatile private var dumped = false
  private def packetDump(s: SparkSession): String = {
    if (!dumped) synchronized {
      if (!dumped) {
        decodedPackets(s).coalesce(1).write.mode("overwrite").parquet(DumpDir)
        dumped = true
      }
    }
    DumpDir
  }

  /** Census aggregate shared by both decode routes (the reference's
    * protocol census, PcapKpiExtractor.scala:398-401). */
  private def census(pkt: DataFrame): DataFrame =
    pkt.groupBy("sliceType", "protocol")
      .agg(
        count(lit(1)).as("n_packets"),
        sum(col("capturedLen")).as("total_bytes"),
        count_distinct(col("flowId")).as("n_flows"),
        sum(when(col("tcpFlags").bitwiseAND(0x04) =!= 0, 1L).otherwise(0L)).as("rst_count"))

  private val censusSql: String =
    s"""SELECT sliceType, protocol, count(*) AS n_packets,
       |  CAST(sum(capturedLen) AS BIGINT) AS total_bytes,
       |  count(DISTINCT flowId) AS n_flows,
       |  CAST(sum(CASE WHEN (tcpFlags & 4) <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS rst_count
       |FROM read_parquet('$DumpDir/*.parquet')
       |GROUP BY 1, 2""".stripMargin

  /** DuckDB twin of the full decode→IAT→38-KPI pipeline, over the packet
    * dump, at the reference's own operating point. */
  private val kpiPipelineSql: String = {
    val kpis = graft.functions.KpiExprs.kpis(
      idleThr = 0.1, smallLen = 100.0, largeLen = 1400.0)
    s"""WITH pkt AS (SELECT sliceType AS slice, flowId AS flow,
       |    "timestamp" AS ts_sec, CAST(capturedLen AS DOUBLE) AS len,
       |    protocol AS proto, srcPort AS src_port, dstPort AS dst_port,
       |    CAST(tcpWindow AS DOUBLE) AS win_size, tcpFlags AS flags,
       |    tcpSeq AS seq, fileName AS file, pkt_idx
       |  FROM read_parquet('$DumpDir/*.parquet')),
       |seqd AS (SELECT *, COALESCE(ts_sec - lag(ts_sec, 1)
       |    OVER (PARTITION BY slice, flow ORDER BY ts_sec, file, pkt_idx),
       |    0.0) AS iat
       |  FROM pkt)
       |SELECT slice, CAST(floor(ts_sec) AS BIGINT) AS window_start,
       |${kpis.map(_.duckNamed).mkString(",\n")}
       |FROM seqd
       |GROUP BY slice, CAST(floor(ts_sec) AS BIGINT)""".stripMargin
  }

  val all: Seq[QuerySpec] = Seq(

    // S3/S4: packet decode → per (slice, protocol) traffic profile. The
    // oracle reads the parquet dump of the same decode — round 5 closes
    // the round-4 blind spot where this path was rows-only.
    checked("pcap_decode", censusSql) { (s, _) =>
      packetDump(s)
      census(decodedPackets(s))
    },

    // S2 alternative route: the same decode through the DataSource V2
    // reader (`spark.read.format("pcap")`) — Catalyst-integrated scan with
    // one partition per file and column pruning reaching the decoder
    // (graft.sources.v2.PcapDataSource). The corpus is written to a
    // deterministic temp dir (slice = parent dir, as in the reference's
    // HDFS layout) and the same census aggregate runs on top; only the
    // pruned 4 columns are materialized from each packet. The oracle input
    // is the RDD-route dump, so this check also pins cross-route decode
    // equality (previously only PcapV2Spec asserted it).
    checked("pcap_decode_v2", censusSql) { (s, _) =>
      packetDump(s)
      val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_pcap_v2")
      (0 until 8).foreach { f =>
        val dir = new java.io.File(root, SliceNames(f % 3))
        dir.mkdirs()
        val file = new java.io.File(dir, s"file_$f.pcap")
        val bytes = Pcap.synthesize(fileSpecs(f, 500))
        // Reuse only a byte-complete file: a truncated leftover from an
        // interrupted run would decode short forever (the decoder tolerates
        // truncation and the rows-only gate wouldn't notice). Stage to a
        // .tmp name (the scan lists *.pcap only) and atomically rename, so
        // a concurrent run never observes a partial file.
        if (file.length() != bytes.length) {
          val tmp = java.nio.file.Files.createTempFile(dir.toPath, s".file_$f", ".tmp")
          java.nio.file.Files.write(tmp, bytes)
          java.nio.file.Files.move(tmp, file.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
      census(s.read.format("pcap")
        .load(SliceNames.map(sl => new java.io.File(root, sl).getAbsolutePath): _*))
    },

    // The reference's FULL lifecycle composed end-to-end on real packet
    // rows (what PcapKpiExtractor.main + KafkaKpiPipeline's batch path
    // compute together): binary decode → per-flow lag IAT → the 38-KPI
    // aggregate per (slice, 1-second epoch window), at the reference's own
    // operating point (idle 0.1 s, small <100 B, large >1400 B, floor-epoch
    // windows — KafkaKpiPipeline.scala:25-27, :418). A user of the
    // reference runs exactly this table. Oracle: the same IAT window + KPI
    // expressions (KpiExprs duck twins) over the packet dump.
    checked("pcap_kpi_pipeline", kpiPipelineSql) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      packetDump(s)
      val pkt = decodedPackets(s).select(
        col("sliceType").as("slice"), col("flowId").as("flow"),
        // KpiExprs takes len/win_size as DOUBLE: the moment aggregates
        // raise c to the 4th power pre-cast, which overflows 32/64-bit
        // integers under ANSI (60000⁴ ≈ 1.3e19).
        col("timestamp").as("ts_sec"), col("capturedLen").cast("double").as("len"),
        col("protocol").as("proto"), col("srcPort").as("src_port"),
        col("dstPort").as("dst_port"), col("tcpWindow").cast("double").as("win_size"),
        col("tcpFlags").as("flags"), col("tcpSeq").as("seq"),
        col("fileName").as("file"), col("pkt_idx"))
      val w = Window.partitionBy("slice", "flow")
        .orderBy(col("ts_sec"), col("file"), col("pkt_idx"))
      val seqd = pkt.withColumn("iat",
        coalesce(col("ts_sec") - lag(col("ts_sec"), 1).over(w), lit(0.0)))
      val kpis = graft.functions.KpiExprs.kpis(
        idleThr = 0.1, smallLen = 100.0, largeLen = 1400.0)
      seqd
        .groupBy(col("slice"), floor(col("ts_sec")).cast("long").as("window_start"))
        .agg(kpis.head.sparkNamed, kpis.tail.map(_.sparkNamed): _*)
    },

    // Multimodal binary pipeline: decode → resize → frame-sample → embed,
    // summarized per media kind. The decode itself isn't SQL-expressible,
    // but the decoded FEATURE ROWS are perfectly relational — so they are
    // dumped per-media (the pcap pattern) and DuckDB recomputes the entire
    // per-kind aggregate from the dump with the same DetAgg arithmetic,
    // pinning the aggregation end-to-end. The decode CONTRACT rides along
    // as measured booleans vs literal-true twins: corrupt rows are marked
    // (never plausible-looking dims from garbage), audio rates land in the
    // synthesizer's set, image dims/channels are in-spec, and exactly the
    // planted 1-in-50 torn blobs decode as corrupt — a codec regression
    // (e.g. JPEG SOF0 misparse) flips a boolean and fails the hash.
    checked("media_features",
      s"""SELECT kind, count(*) AS n_media,
         |  ${graft.functions.DetAgg.sqlAvg("CASE WHEN width <> -1 THEN width END")} AS avg_width,
         |  ${graft.functions.DetAgg.sqlAvg("CASE WHEN width <> -1 THEN thumb_w END")} AS avg_thumb_w,
         |  ${graft.functions.DetAgg.sqlAvg("CASE WHEN width <> -1 THEN n_frames END")} AS avg_frames,
         |  ${graft.functions.DetAgg.sqlAvg("emb0")} AS avg_emb0,
         |  CAST(sum(CASE WHEN width = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         |  true AS decode_marks_corrupt, true AS audio_rates_ok,
         |  true AS image_dims_ok, true AS corrupt_rate_ok
         |FROM read_parquet('$MediaDumpDir/*.parquet')
         |GROUP BY kind""".stripMargin) { (s, _) =>
      import graft.functions.DetAgg.davg
      val feats = MediaOps.extract(MediaOps.corpus(s, 3000)).toDF()
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("channels"), col("n_bytes"), col("thumb_w"), col("thumb_h"),
          col("n_frames"), element_at(col("embedding"), 1).as("emb0"))
      // One execution feeds both dump and aggregate (LocalRelation over the
      // collected rows — 3 000 bounded feature rows, the same shape a
      // metadata-pass summary would collect).
      val rows = feats.collect()
      val local = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), feats.schema)
      local.coalesce(1).write.mode("overwrite").parquet(MediaDumpDir)
      val decoded = col("width") =!= -1
      local.groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          davg(when(decoded, col("width"))).as("avg_width"),
          davg(when(decoded, col("thumb_w"))).as("avg_thumb_w"),
          davg(when(decoded, col("n_frames"))).as("avg_frames"),
          davg(col("emb0")).as("avg_emb0"),
          sum(when(col("width") === -1, 1L).otherwise(0L)).as("n_corrupt"),
          bool_and((col("width") > 0) === decoded).as("decode_marks_corrupt"),
          bool_and(when(col("kind") === "audio" && decoded,
            col("width").isin(8000, 16000, 22050, 44100)).otherwise(lit(true)))
            .as("audio_rates_ok"),
          bool_and(when(col("kind") === "image" && decoded,
            col("width").between(1, 65535) && col("height").between(1, 65535) &&
              col("channels").between(1, 4)).otherwise(lit(true)))
            .as("image_dims_ok"))
        .withColumn("corrupt_rate_ok", col("n_corrupt") * 50 === col("n_media"))
    },

    // Per-FRAME feature table — the video-pipeline explosion shape the
    // per-media metadata pass above summarizes away: every decodable blob
    // flatMaps to one row per sampled frame (offset + exact byte-window
    // sum; the window summarization stubs the codec's frame decode, the
    // explosion/schema/bounds plumbing is real). Dumped like the other
    // binary pipelines, and DuckDB recomputes the whole per-kind rollup
    // from the dump; the sampling CONTRACT rides as measured booleans —
    // ≤ 8 frames per media, offsets past the 10-byte header and inside
    // the blob, windows non-empty and capped — so a sampler or slicing
    // regression flips a boolean and fails the hash.
    checked("media_frames",
      s"""WITH f AS (SELECT * FROM read_parquet('$FrameDumpDir/*.parquet')),
         |pm AS (SELECT kind, media_id, count(*) AS nf FROM f GROUP BY 1, 2)
         |SELECT f.kind, CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(count(DISTINCT f.media_id) AS BIGINT) AS n_media,
         |  CAST(sum(f.byte_sum) AS BIGINT) AS byte_sum_total,
         |  ${graft.functions.DetAgg.sqlAvg("f.byte_sum")} AS avg_byte_sum,
         |  (SELECT max(nf) FROM pm p WHERE p.kind = f.kind) <= 8
         |    AS frames_capped,
         |  bool_and(f.frame_off >= 10 AND f.frame_off < f.media_bytes) AS offsets_ok,
         |  bool_and(f.win_len BETWEEN 1 AND ${MediaOps.FrameWin}) AS windows_ok
         |FROM f GROUP BY f.kind""".stripMargin) { (s, _) =>
      import graft.functions.DetAgg.davg
      val local = framesLocal(s)
      val perMedia = local.groupBy("kind", "media_id")
        .agg(count(lit(1)).as("nf"))
        .groupBy("kind").agg(max(col("nf")).as("max_nf"))
      local.groupBy("kind")
        .agg(count(lit(1)).as("n_frames"),
          countDistinct(col("media_id")).as("n_media"),
          sum(col("byte_sum")).as("byte_sum_total"),
          davg(col("byte_sum")).as("avg_byte_sum"),
          bool_and(col("frame_off") >= 10 && col("frame_off") < col("media_bytes"))
            .as("offsets_ok"),
          bool_and(col("win_len").between(1, MediaOps.FrameWin))
            .as("windows_ok"))
        .join(broadcast(perMedia), "kind")
        .select(col("kind"), col("n_frames"), col("n_media"),
          col("byte_sum_total"), col("avg_byte_sum"),
          (col("max_nf") <= 8).as("frames_capped"),
          col("offsets_ok"), col("windows_ok"))
    },

    // Perceptual near-duplicate detection over IMAGES — the multimodal
    // analogue of dedup_simhash: a 64-bit average-hash (blockhash family)
    // over each blob's REAL container-extracted content plane (PNG IDAT
    // chunk walk / JPEG SOS→EOI region; the pixel decode itself is the
    // declared stub boundary), then LSH over 4×16-bit hash bands so only
    // band-bucket collisions are ever paired — never all-pairs — and a
    // bit_count(xor) Hamming verify on the candidates. The corpus plants
    // one near-dup per id-triple with perturbations confined to the first
    // half of the plane, so the two LOW bands are bit-identical by
    // construction: 100 % planted recall is a STRUCTURAL property here,
    // and `recall_ok`/`low_bands_identical` gate it. Hashes are dumped
    // once (pcap pattern) and DuckDB re-runs the ENTIRE band-join +
    // Hamming pipeline from the dump — candidate and dup-pair counts are
    // exact-matched, not spot-checked. Torn blobs (1 in 50) hash to the
    // 0L no-content sentinel and are excluded before banding (a bucket of
    // garbage zeros would otherwise all-pair with itself).
    checked("media_phash_dedup",
      s"""WITH h AS (SELECT media_id, phash
         |    FROM read_parquet('$PhashDumpDir/*.parquet') WHERE phash <> 0),
         |b AS (SELECT media_id, phash,
         |    j * 65536 + ((phash >> (j * 16)) & 65535) AS bk
         |  FROM h, (SELECT unnest([0, 1, 2, 3]) AS j)),
         |cand AS (SELECT DISTINCT x.media_id AS ia, y.media_id AS ib,
         |    x.phash AS ha, y.phash AS hb
         |  FROM b x JOIN b y ON x.bk = y.bk AND x.media_id < y.media_id),
         |pl AS (SELECT x.media_id AS pa, x.phash AS pha, y.phash AS phb
         |  FROM h x JOIN h y ON y.media_id = x.media_id + 1
         |    AND x.media_id % 3 = 0)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_hashed,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidate_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cand
         |    WHERE bit_count(xor(ha, hb)) <= 8) AS n_dup_pairs,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pl) AS n_planted,
         |  (SELECT CAST(count(*) AS BIGINT) FROM cand
         |    WHERE bit_count(xor(ha, hb)) <= 8 AND ia % 3 = 0
         |      AND ib = ia + 1) AS n_planted_found,
         |  (SELECT count(*) FROM cand WHERE bit_count(xor(ha, hb)) <= 8
         |      AND ia % 3 = 0 AND ib = ia + 1)
         |    = (SELECT count(*) FROM pl) AS recall_ok,
         |  (SELECT bool_and((pha & 4294967295) = (phb & 4294967295))
         |    FROM pl) AS low_bands_identical""".stripMargin) { (s, _) =>
      import s.implicits._
      val HamThr = 8
      val feats = MediaOps.phashCorpus(s, 1800)
        .mapPartitions(rows => rows.map(r =>
          (r.media_id, MediaOps.aHash64(MediaOps.contentPlane(r.bytes)))))
        .toDF("media_id", "phash")
      val rows = feats.collect() // bounded: 1 800 (id, hash) pairs
      val local = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), feats.schema)
      local.coalesce(1).write.mode("overwrite").parquet(PhashDumpDir)
      val hashed = local.filter(col("phash") =!= 0L)
      val bands = hashed.select(col("media_id"), col("phash"),
        explode(array((0 until 4).map(j =>
          shiftrightunsigned(col("phash"), 16 * j).bitwiseAND(lit(65535L)) +
            lit(j * 65536L)): _*)).as("bk"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.bk") === col("y.bk") &&
            col("x.media_id") < col("y.media_id"))
        .select(col("x.media_id").as("ia"), col("y.media_id").as("ib"),
          col("x.phash").as("ha"), col("y.phash").as("hb"))
        .distinct()
      val ham = bit_count(col("ha").bitwiseXOR(col("hb")))
      val candAgg = cand.agg(
        count(lit(1)).as("n_candidate_pairs"),
        sum(when(ham <= HamThr, 1L).otherwise(0L)).as("n_dup_pairs"),
        sum(when(ham <= HamThr && col("ia") % 3 === 0 &&
          col("ib") === col("ia") + 1, 1L).otherwise(0L)).as("n_planted_found"))
      val plantedAgg = hashed.as("x").join(hashed.as("y"),
          col("y.media_id") === col("x.media_id") + 1 &&
            col("x.media_id") % 3 === 0)
        .agg(count(lit(1)).as("n_planted"),
          bool_and((col("x.phash").bitwiseAND(lit(4294967295L))) ===
            (col("y.phash").bitwiseAND(lit(4294967295L))))
            .as("low_bands_identical"))
      hashed.agg(count(lit(1)).as("n_hashed"))
        .crossJoin(candAgg).crossJoin(plantedAgg)
        .select(col("n_hashed"), col("n_candidate_pairs"), col("n_dup_pairs"),
          col("n_planted"), col("n_planted_found"),
          (col("n_planted_found") === col("n_planted")).as("recall_ok"),
          col("low_bands_identical"))
    },

    // Windowed PCM features over AUDIO — the audio analogue of the
    // media_frames explosion: every decodable WAV's data chunk is decoded
    // as REAL signed 16-bit little-endian samples (the container walk and
    // sample decode are genuine; no codec is involved for PCM) and
    // flatMapped into fixed 64-sample analysis windows with exact integer
    // features — energy Σx² (BIGINT), zero-crossing count, peak |x| —
    // one row per window straight off the blob scan, no shuffle. Window
    // rows are dumped once (pcap pattern) and DuckDB recomputes the
    // whole per-sample-rate rollup from the dump; the windowing CONTRACT
    // rides as measured booleans — every window exactly 64 samples,
    // zero-crossings bounded by window length − 1, peak within the s16
    // range — so a sample-decode or windowing regression flips a boolean
    // and fails the hash.
    checked("media_audio_features",
      s"""SELECT rate, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
         |  CAST(sum(sum_sq) AS BIGINT) AS energy_total,
         |  ${graft.functions.DetAgg.sqlAvg("sum_sq")} AS avg_energy,
         |  CAST(sum(zero_crossings) AS BIGINT) AS zc_total,
         |  CAST(max(peak) AS INTEGER) AS max_peak,
         |  bool_and(n_samples = ${MediaOps.WinSamples}) AS windows_exact,
         |  bool_and(zero_crossings BETWEEN 0 AND ${MediaOps.WinSamples} - 1)
         |    AS zc_bounded,
         |  bool_and(peak BETWEEN 0 AND 32768) AS peak_in_range
         |FROM read_parquet('$AudioDumpDir/*.parquet')
         |GROUP BY rate""".stripMargin) { (s, _) =>
      import graft.functions.DetAgg.davg
      val wins = MediaOps.audioWindows(
        MediaOps.corpus(s, 3000).filter(_.kind == "audio")).toDF()
      val rows = wins.collect() // bounded: ≤ 3 windows × 1 000 audio blobs
      val local = s.createDataFrame(
        java.util.Arrays.asList(rows: _*), wins.schema)
      local.coalesce(1).write.mode("overwrite").parquet(AudioDumpDir)
      local.groupBy("rate")
        .agg(count(lit(1)).as("n_windows"),
          countDistinct(col("media_id")).as("n_media"),
          sum(col("sum_sq")).as("energy_total"),
          davg(col("sum_sq")).as("avg_energy"),
          sum(col("zero_crossings")).cast("long").as("zc_total"),
          max(col("peak")).as("max_peak"),
          bool_and(col("n_samples") === MediaOps.WinSamples)
            .as("windows_exact"),
          bool_and(col("zero_crossings")
            .between(0, MediaOps.WinSamples - 1)).as("zc_bounded"),
          bool_and(col("peak").between(0, 32768)).as("peak_in_range"))
    },

    // Shot-boundary (scene-cut) detection over VIDEO — the temporal
    // analysis stage after frame sampling: consecutive sampled frames'
    // feature deltas (here the exact byte-window sums standing in for
    // decoded-frame histograms) mark a cut where |Δ| exceeds a fixed
    // threshold — the classic pixel/histogram-difference detector, and
    // the op that turns a frame table into segments for keyframe
    // selection. One lag() window per video ordered by the unique
    // frame_idx (deterministic under any partitioning), all-integer
    // features, aggregated per-corpus; the oracle recomputes the same
    // window + rollup from the shared frame dump.
    checked("media_scene_cuts",
      s"""WITH f AS (SELECT * FROM read_parquet('$FrameDumpDir/*.parquet')
         |  WHERE kind = 'video'),
         |d AS (SELECT media_id, frame_idx, byte_sum,
         |    byte_sum - lag(byte_sum) OVER
         |      (PARTITION BY media_id ORDER BY frame_idx) AS jump
         |  FROM f)
         |SELECT CAST(count(DISTINCT media_id) AS BIGINT) AS n_videos,
         |  CAST(count(*) AS BIGINT) AS n_frames,
         |  CAST(sum(CASE WHEN abs(jump) > 2000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_cuts,
         |  CAST(max(abs(jump)) AS BIGINT) AS max_jump,
         |  CAST(count(DISTINCT CASE WHEN abs(jump) > 2000 THEN media_id END)
         |    AS BIGINT) AS n_videos_with_cut
         |FROM d""".stripMargin) { (s, _) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("media_id").orderBy("frame_idx")
      framesLocal(s).filter(col("kind") === "video")
        .withColumn("jump", col("byte_sum") - lag(col("byte_sum"), 1).over(w))
        .agg(countDistinct(col("media_id")).as("n_videos"),
          count(lit(1)).as("n_frames"),
          sum(when(abs(col("jump")) > 2000, 1L).otherwise(0L)).as("n_cuts"),
          max(abs(col("jump"))).as("max_jump"),
          countDistinct(when(abs(col("jump")) > 2000, col("media_id")))
            .as("n_videos_with_cut"))
    })
}
