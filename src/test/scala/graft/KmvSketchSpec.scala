package graft

import org.apache.spark.sql.functions._

import graft.functions.expr.KmvSketch

/** KMV (theta) sketch pins, both regimes:
  *  - distinct < k: the sketch IS the distinct hash set (ascending) under
  *    any partitioning — dedup + min-k are order-free;
  *  - distinct ≥ k: the retained set is exactly the k smallest distinct
  *    hashes of the input (checked against a driver-side sort), so the
  *    estimator (k−1)/θ is reproducible run to run, and its error against
  *    the true distinct count stays within 5·RSE on a fixed corpus;
  *  - merge/serialize fire on multi-partition runs and must change
  *    nothing (the sketch is a pure function of the value set). */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  private def mask(l: Long): Long = {
    // Same masked-xxhash64 domain the queries use, computed via Spark so
    // the spec's expectation and the aggregate see identical hashes.
    l & Long.MaxValue
  }

  private def sketchOf(hashes: Seq[Long], k: Int, parts: Int): Seq[Long] =
    hashes.toDF("h").repartition(parts)
      .agg(KmvSketch.sketch(col("h"), k).as("sk"))
      .select(explode(col("sk")).as("v")).as[Long].collect().toSeq

  test("distinct < k: sketch is the ascending distinct set, any partitioning") {
    val r = new scala.util.Random(7)
    val hashes = Seq.fill(400)(mask(r.nextLong())).take(400)
    val dedup = hashes.distinct.sorted
    Seq(1, 4, 16).foreach { parts =>
      val sk = sketchOf(hashes ++ hashes, k = 1024, parts) // dup every value
      assert(sk == dedup, s"parts=$parts: exact-regime sketch != distinct set")
    }
  }

  test("distinct >= k: retained set is the k smallest distinct hashes") {
    val r = new scala.util.Random(11)
    val hashes = Seq.fill(5000)(mask(r.nextLong()))
    val k = 64
    val expect = hashes.distinct.sorted.take(k)
    Seq(1, 3, 8).foreach { parts =>
      assert(sketchOf(hashes, k, parts) == expect,
        s"parts=$parts: k-min set drifted (merge/serialize not value-pure)")
    }
  }

  test("estimator error within 5 RSE on a fixed corpus") {
    val n = 20000
    val k = 256
    val hashes = (0 until n).map(i => mask(scala.util.hashing.byteswap64(i.toLong)))
    val trueD = hashes.distinct.size
    val sk = sketchOf(hashes, k, parts = 8)
    val theta = sk.last.toDouble / KmvSketch.HashSpace
    val est = (k - 1).toDouble / theta
    val rse = 1.0 / math.sqrt(k - 2.0)
    assert(math.abs(est - trueD) <= 5 * rse * trueD,
      s"est=$est true=$trueD rse=$rse")
  }

  test("nulls are skipped; per-group sketches stay independent") {
    val df = Seq(("a", Some(3L)), ("a", Some(1L)), ("a", None),
      ("b", Some(2L))).toDF("g", "h")
    val out = df.groupBy("g")
      .agg(KmvSketch.sketch(col("h"), 4).as("sk"))
      .as[(String, Seq[Long])].collect().toMap
    assert(out("a") == Seq(1L, 3L) && out("b") == Seq(2L))
  }

  test("negative input hash is rejected (mask contract)") {
    val ex = intercept[Exception] {
      Seq(-1L).toDF("h").agg(KmvSketch.sketch(col("h"), 4)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("sql route: kmv_sketch resolves by name") {
    graft.GraftExtensions.register(spark)
    Seq(5L, 5L, 9L, 1L).toDF("h").createOrReplaceTempView("kmv_in")
    val got = spark.sql("SELECT kmv_sketch(h, 8) AS sk FROM kmv_in")
      .as[Seq[Long]].head()
    assert(got == Seq(1L, 5L, 9L))
  }
}
