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

    t("warm")(Tables.documents(spark, sfDir).count())
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash",
        "dedup_simhash", "dedup_embedding", "ann_cosine_topk", "ann_srp_lsh", "ann_ivf")
    for (q <- qs; i <- 1 to 3)
      t(s"$q #$i")(SparkEntry.queries(q)(spark, sfDir).count())
    spark.stop()
  }
}
