package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.MediaOps
import graft.sources.Pcap

/** Custom-source suite: the PCAP binary decode chain (SURVEY §2.1 S2-S4 —
  * the reference's one genuinely custom source) and the multimodal
  * binary-column pipeline. No pcap/media files ship with the harness, so
  * both queries synthesize deterministic binary inputs driver-side,
  * distribute them, and run the real executor-side decode path — the same
  * plan shape as production (binaryFiles → flatMap decode → toDF), minus
  * only the filesystem hop. Decode correctness is pinned by
  * PcapDecoderSpec round-trips; these queries are rows-only (no relational
  * oracle exists for binary decode).
  */
object SourceQueries {
  import QuerySpec._

  val all: Seq[QuerySpec] = Seq(

    // S3/S4: packet decode → per (slice, protocol) traffic profile (the
    // reference's protocol census, PcapKpiExtractor.scala:398-401).
    rowsOnly("pcap_decode") { (s, _) =>
      import s.implicits._
      val nFiles = 8
      val perFile = 500
      val filesRdd = s.sparkContext.parallelize(0 until nFiles, nFiles).map { f =>
        val slice = Seq("eMBB", "URLLC", "mMTC")(f % 3)
        val specs = (0 until perFile).map { i =>
          val rnd = new scala.util.Random(f * 100000L + i)
          (1700000000L + i, rnd.nextInt(1000000).toLong,
            1 + rnd.nextInt(250), 1 + rnd.nextInt(250),
            1024 + rnd.nextInt(60000), 80 + rnd.nextInt(8000),
            if (rnd.nextBoolean()) 6 else 17,
            rnd.nextInt(1 << 30).toLong, if (rnd.nextInt(20) == 0) 0x04 else 0x10,
            rnd.nextInt(65536), rnd.nextInt(256))
        }
        (s"file_$f.pcap", slice, Pcap.synthesize(specs))
      }
      val packets = filesRdd.flatMap { case (name, slice, bytes) =>
        Pcap.decodeStream(new java.io.ByteArrayInputStream(bytes), slice, name)
      }
      packets.toDF()
        .groupBy("sliceType", "protocol")
        .agg(
          count(lit(1)).as("n_packets"),
          sum(col("capturedLen")).as("total_bytes"),
          count_distinct(col("flowId")).as("n_flows"),
          sum(when(col("tcpFlags").bitwiseAND(0x04) =!= 0, 1L).otherwise(0L)).as("rst_count"))
    },

    // Multimodal binary pipeline: decode → resize → frame-sample → embed,
    // summarized per media kind.
    rowsOnly("media_features") { (s, _) =>
      MediaOps.extract(MediaOps.corpus(s, 3000)).toDF()
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_media"),
          avg(col("width")).as("avg_width"),
          avg(col("thumb_w")).as("avg_thumb_w"),
          avg(col("n_frames")).as("avg_frames"),
          avg(element_at(col("embedding"), 1)).as("avg_emb0"),
          sum(when(col("width") === -1, 1L).otherwise(0L)).as("n_corrupt"))
    })
}
