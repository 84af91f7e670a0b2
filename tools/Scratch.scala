package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling main (NOT part of the library surface, and not on
  * sbt's source path — lives in tools/ so the shipped artifact contains
  * only engine code; round-7 verdict #6). To run: copy into
  * src/main/scala/graft/ (the cc-stages mode additionally needs a
  * `private[graft]` alias for DedupQueries.nearDupPairs, removed with the
  * move), `sbt "runMain graft.Scratch <mode|query names...>"`, delete. */
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
    if (args.headOption.contains("ex-parts")) {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFns._
      val N = 3
      val docs = Tables.documents(spark, sfDir)
      for (i <- 1 to 3) {
        t(s"shingle-build #$i")(docs
          .select(col("doc_id"), explode(shingles(tokens(col("text")), N)).as("sstr"))
          .count())
        t(s"shingle+h60 #$i")(docs
          .select(col("doc_id"), explode(shingles(tokens(col("text")), N)).as("sstr"))
          .select(col("doc_id"), h60(col("sstr")).as("h"))
          .agg(sum(col("h") % 1000)).collect())
        t(s"shingle+h60+distinct #$i")(docs
          .select(col("doc_id"), explode(shingles(tokens(col("text")), N)).as("sstr"))
          .select(col("doc_id"), h60(col("sstr")).as("h"))
          .distinct().count())
      }
    } else if (args.headOption.contains("minhash-stages")) {
      import org.apache.spark.sql.functions._
      import graft.functions.TextFns._
      val K = 32; val R = 4; val N = 3
      for (i <- 1 to 3) {
        val ex = t(s"stage ex #$i")(graft.queries.QuerySpec.staged(
          Tables.documents(spark, sfDir)
            .select(col("doc_id"), explode(shingles(tokens(col("text")), N)).as("sstr"))
            .select(col("doc_id"), h60(col("sstr")).as("h"))
            .distinct()))
        val minCols = perms(K).zipWithIndex.map { case ((a, b), j) =>
          min((col("h") % P * a + b) % P).as(s"m$j") }
        val sig = ex.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
          .select(col("doc_id"), array((0 until K).map(j => col(s"m$j")): _*).as("sig"))
        val banded = t(s"stage banded #$i")(graft.queries.QuerySpec.staged(
          sig.select(col("doc_id"), explode(lshBands(col("sig"), K, R)).as("band"))))
        val cand = banded.as("a")
          .join(banded.as("b"),
            col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
        t(s"stage cand #$i")(cand.count())
        val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("n"))
        val nInter = cand
          .join(ex.select(col("doc_id").as("doc_a"), col("h")), "doc_a")
          .join(ex.select(col("doc_id").as("doc_b"), col("h")), Seq("doc_b", "h"))
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
        t(s"stage verify #$i")(nInter
          .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
          .count())
      }
    } else if (args.headOption.contains("cc-stages")) {
      import org.apache.spark.sql.functions._
      for (i <- 1 to 3) {
        val pairs = t(s"pairs build #$i")(graft.queries.QuerySpec.staged(
          graft.queries.DedupQueries.nearDupPairsProbe(spark, sfDir)))
        val edges = t(s"edges #$i")(graft.queries.QuerySpec.staged(
          pairs.unionAll(
            pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))))
        var labels = t(s"labels0 #$i")(graft.queries.QuerySpec.staged(
          edges.select(col("doc_a").as("doc_id")).distinct()
            .withColumn("label", col("doc_id"))))
        var changed = 1L
        var round = 0
        while (changed > 0 && round < 50) {
          val nbrMin = edges
            .join(labels.select(col("doc_id").as("nbr"), col("label")),
              col("doc_b") === col("nbr"))
            .groupBy(col("doc_a").as("doc_id"))
            .agg(min(col("label")).as("nbr_min"))
          val upd = least(col("label"), coalesce(col("nbr_min"), col("label")))
          val obs = org.apache.spark.sql.Observation()
          val next = t(s"round $round #$i")(graft.queries.QuerySpec.staged(labels
            .join(nbrMin, Seq("doc_id"), "left")
            .select(col("doc_id"), upd.as("label"),
              (upd =!= col("label")).cast("long").as("chg"))
            .observe(obs, sum(col("chg")).as("n_changed"))))
          changed = obs.get.get("n_changed") match {
            case Some(l: Long) => l
            case _ => 0L
          }
          labels = next.select("doc_id", "label")
          round += 1
        }
        graft.queries.QuerySpec.releaseStaged()
      }
    } else {
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("dedup_exact", "dedup_ngram_jaccard", "dedup_minhash",
        "dedup_simhash", "dedup_embedding", "ann_cosine_topk", "ann_srp_lsh", "ann_ivf")
    for (q <- qs; i <- 1 to 3)
      t(s"$q #$i")(SparkEntry.queries(q)(spark, sfDir).count())
    }
    spark.stop()
  }
}
