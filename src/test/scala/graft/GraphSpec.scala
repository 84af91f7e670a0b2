package graft

import org.apache.spark.sql.functions._

import graft.queries.QuerySpec

/** Local contracts for the graph family, replayed in plain Scala at
  * sf0.001 (the DuckDB gate re-checks everything cross-engine at
  * sf0.01/sf0.1): BFS distances against a reference queue traversal, and
  * the structural invariants the bipartite transaction graph implies. */
class GraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, sf).collect()
    } finally QuerySpec.releaseStaged()

  test("graph_bfs equals a reference queue BFS; bipartite parity holds") {
    val got = run("graph_bfs")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Reference: plain BFS over the collected edge list.
    val rel = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_suppkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    rel.foreach { case (c, sp) =>
      val sn = queries.GraphQueries.SuppOffset + sp
      adj.getOrElseUpdate(c, scala.collection.mutable.Set.empty) += sn
      adj.getOrElseUpdate(sn, scala.collection.mutable.Set.empty) += c
    }
    val sources = graft.Tables.supplier(spark, sf)
      .filter(col("s_nationkey") === queries.GraphQueries.BfsNation)
      .select(col("s_suppkey")).collect()
      .map(r => queries.GraphQueries.SuppOffset + r.getLong(0))
    val dist = scala.collection.mutable.Map(sources.map(_ -> 0L).toSeq: _*)
    var frontier: Set[Long] = sources.toSet
    for (k <- 1 to queries.GraphQueries.BfsMaxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .filterNot(dist.contains)
      frontier.foreach(dist(_) = k.toLong)
    }
    assert(got == dist.toMap,
      s"BFS mismatch: ${got.size} vs ${dist.size} reached nodes")

    // Bipartite parity: suppliers sit at even distance, customers odd.
    got.foreach { case (node, d) =>
      val isSupp = node >= queries.GraphQueries.SuppOffset
      assert((d % 2 == 0) == isSupp,
        s"node $node at dist $d violates bipartite parity")
    }
  }

  test("ts_gapfill: dense grid, actuals preserved, gaps carry last value") {
    val rows = run("ts_gapfill")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val bySlice = rows.groupBy(_._1)
    assert(bySlice.nonEmpty)
    bySlice.foreach { case (slice, rs) =>
      val sorted = rs.sortBy(_._2)
      // contiguous bucket range
      assert(sorted.map(_._2).toSeq ==
        (sorted.head._2 to sorted.last._2).toSeq, s"$slice grid has holes")
      // first bucket observed; gap rows have n=0 and carry the previous fill
      assert(!sorted.head._5, s"$slice starts with a gap")
      sorted.toSeq.sliding(2).foreach {
        case Seq((_, _, n, v, gap), (_, _, n2, v2, gap2)) =>
          if (gap2) assert(n2 == 0L && v2 == v,
            s"$slice gap bucket must carry $v, got $v2")
          else assert(n2 > 0L)
          assert(!gap || n == 0L)
        case _ => ()
      }
    }
  }
}
