package graft

import org.apache.spark.sql.functions._

import graft.functions.expr.FreqSketch

/** Misra-Gries sketch pins, both regimes:
  *  - distinct ≤ k: never decrements → exact counts, deterministic;
  *  - distinct > k: arrival-order-dependent summary, but the MG bounds
  *    (est ≤ true, true − est ≤ n/(k+1), coverage of every item with
  *    true count > n/(k+1)) hold under any partitioning — asserted over
  *    multi-partition runs where serialize/merge/compression all fire. */
class FreqSketchSpec extends SparkSpec {
  import spark.implicits._

  private def sketchOf(items: Seq[String], k: Int, parts: Int): Map[String, Long] =
    items.toDF("item").repartition(parts)
      .agg(FreqSketch.sketch(col("item"), k).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)]
      .collect().toMap

  test("distinct <= k: estimates are exact counts under any partitioning") {
    val items = Seq.tabulate(500)(i => s"w${i % 7}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    Seq(1, 4, 16).foreach { parts =>
      val sk = sketchOf(items, k = 10, parts)
      assert(sk == exact, s"parts=$parts: $sk != $exact")
    }
  }

  test("distinct > k: MG bounds hold across partitionings (merge + compression fire)") {
    // Zipf-ish stream: item i appears ~1200/i times, 40 distinct > k=8.
    val r = new scala.util.Random(9)
    val items = r.shuffle((1 to 40).flatMap(i => Seq.fill(1200 / i)(s"t$i")))
    val n = items.size
    val k = 8
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = n.toDouble / (k + 1)
    Seq(1, 3, 8).foreach { parts =>
      val sk = sketchOf(items, k, parts)
      assert(sk.size <= k, s"parts=$parts: summary exceeded k: ${sk.size}")
      sk.foreach { case (item, est) =>
        val t = exact(item)
        assert(est <= t, s"parts=$parts: overcount $item est=$est true=$t")
        assert(t - est <= bound,
          s"parts=$parts: undercount beyond n/(k+1): $item est=$est true=$t bound=$bound")
      }
      // Coverage: every item heavier than n/(k+1) must be present.
      exact.filter(_._2 > bound).keys.foreach { item =>
        assert(sk.contains(item),
          s"parts=$parts: heavy item $item (count ${exact(item)} > $bound) missing")
      }
    }
  }

  test("per-group sketches stay independent") {
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "item")
    val out = df.groupBy("g")
      .agg(FreqSketch.sketch(col("item"), 4).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.item"), col("e.est")).as[(String, String, Long)]
      .collect().toSet
    assert(out == Set(("a", "x", 2L), ("a", "y", 1L), ("b", "z", 1L)))
  }

  test("SQL surface: freq_sketch via GraftExtensions") {
    GraftExtensions.register(spark)
    Seq("p", "p", "q").toDF("item").createOrReplaceTempView("fs_items")
    val rows = spark.sql(
      "SELECT inline(freq_sketch(item, 3)) FROM fs_items")
      .as[(String, Long)].collect().toSet
    assert(rows == Set(("p", 2L), ("q", 1L)))
  }
}
