package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (not part of the library surface). */
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
    for (n <- Seq("32", "8", "4"); q <- Seq("stream_flow_iat", "stream_kpi_session"); i <- 1 to 2) {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      t(s"$q parts=$n #$i")(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
