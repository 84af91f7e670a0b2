package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

import graft.functions.expr.CosTopK

/** Bounded-heap top-k aggregate vs the row_number window it replaced:
  * identical output under any partitioning, ties broken by id ascending,
  * groups smaller than k emit all members. */
class CosTopKSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("i"))
    df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col("g"), col("rnk"), col("i"), col("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(CosTopK.topk(col("s"), col("i"), k).as("tk"))
      .select(col("g"), explode(col("tk")).as("t"))
      .select(col("g"), col("t.rnk"), col("t.vec_id"), col("t.cos"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet

  test("matches the row_number window on random data across partitionings") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 4000).map { i =>
      (rng.nextInt(13).toLong, i.toLong, math.rint(rng.nextDouble() * 100) / 100)
    }
    for (parts <- Seq(1, 3, 11)) {
      val df = spark.createDataset(rows).toDF("g", "i", "s").repartition(parts)
      assert(viaAgg(df, 7) == viaWindow(df, 7), s"mismatch at $parts partitions")
    }
  }

  test("ties rank by id ascending; short groups emit all members") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.5), (1L, 1L, 0.9),
      (2L, 42L, 0.1)).toDF("g", "i", "s")
    val got = viaAgg(df, 3)
    assert(got == Set(
      (1L, 1, 1L, 0.9), (1L, 2, 3L, 0.5), (1L, 3, 7L, 0.5),
      (2L, 1, 42L, 0.1)))
  }

  test("partial aggregation happens before the exchange") {
    val df = Seq((1L, 1L, 0.5), (1L, 2L, 0.6)).toDF("g", "i", "s")
      .groupBy("g").agg(CosTopK.topk(col("s"), col("i"), 5).as("tk"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_cos_top_k"), s"no partial aggregate in:\n$plan")
  }
}
