package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Throwaway profiling main (see tools/Scratch.scala) — streaming drain
  * phase breakdown. Delete before shipping. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    t("warm")(Tables.events(spark, sfDir).count())
    // Phase breakdown of one bounded streaming drain (flow_iat shape).
    for (i <- 1 to 3) {
      t(s"drain #$i total") {
        val s2 = t("  newSession+conf") {
          val s2 = spark.newSession()
          spark.conf.getAll.foreach { case (k, v) =>
            try s2.conf.set(k, v) catch { case _: Exception => () }
          }
          s2.conf.set("spark.sql.shuffle.partitions", "8")
          s2
        }
        val q = t("  build+start") {
          graft.streaming.StreamingKpi.flowIat(s2,
            graft.streaming.StreamingKpi.eventsStream(s2, sfDir)).toDF()
            .writeStream.format("memory").queryName(s"scr_$i")
            .outputMode(OutputMode.Append).start()
        }
        t("  processAllAvailable")(q.processAllAvailable())
        t("  stop")(q.stop())
        val rows = t("  collect")(s2.table(s"scr_$i").collect())
        System.err.println(s"[scratch]   rows=${rows.length}")
        s2.catalog.dropTempView(s"scr_$i")
      }
    }
    spark.stop()
  }
}
