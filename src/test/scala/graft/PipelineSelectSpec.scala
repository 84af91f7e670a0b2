package graft

import org.apache.spark.sql.functions._

import graft.queries.{QuerySpec, SimilarityQueries, TextQueries}

/** Local contracts for the round-9 data-selection operators: DSIR
  * importance reweighting actually enriches the target slice, the NB
  * quality classifier beats the majority baseline on its held-out half
  * with sign-consistent margins, and the MMR greedy trajectory matches
  * an independent full local replay. The DuckDB gate re-checks the
  * arithmetic bit-exactly; these pin the SEMANTIC claims. */
class PipelineSelectSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def run(name: String) =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, sf).collect()
    } finally QuerySpec.releaseStaged()

  test("corpus_dsir: the selected top-k is enriched toward the target slice") {
    val rows = run("corpus_dsir")
    assert(rows.length == TextQueries.DsirTopK)
    // ranks are 1..k and weights non-increasing in rank order
    val byRank = rows.sortBy(_.getLong(4))
    assert(byRank.map(_.getLong(4)).toSeq == (1L to TextQueries.DsirTopK).toSeq)
    assert(byRank.sliding(2).forall {
      case Array(a, b) => a.getLong(3) >= b.getLong(3)
      case _ => true
    })
    // enrichment: target share in the selection > target share in corpus
    val selShare = rows.count(_.getString(1) == TextQueries.DsirTarget)
      .toDouble / rows.length
    val tot = graft.Tables.documents(spark, sf)
      .agg(count(when(col("lang") === TextQueries.DsirTarget, 1)),
        count(lit(1))).head()
    val baseShare = tot.getLong(0).toDouble / tot.getLong(1)
    assert(selShare > baseShare,
      s"DSIR must enrich: selected $selShare vs base $baseShare")
  }

  test("text_nb_classifier: beats the majority baseline; margins sign-consistent") {
    val rows = run("text_nb_classifier")
    val n = rows.map(_.getLong(2)).sum
    val correct = rows.filter(r => r.getString(0) == r.getString(1))
      .map(_.getLong(2)).sum
    val hi = rows.filter(_.getString(0) == "hi").map(_.getLong(2)).sum
    val majority = math.max(hi, n - hi)
    assert(correct > majority,
      s"accuracy $correct/$n must beat majority $majority/$n")
    // per-row pred is the margin's sign, so each cell's margin sum
    // inherits it: pred=hi cells non-negative, pred=lo cells negative
    rows.foreach { r =>
      if (r.getString(1) == "hi") assert(r.getLong(3) >= 0)
      else assert(r.getLong(3) < 0)
    }
  }

  test("sample_reservoir: exactly k per stratum, membership = k smallest hashes") {
    val rows = run("sample_reservoir")
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byLang = rows.groupBy(_._1)
    // exact k per stratum (every harness lang has ≥ k docs)
    byLang.foreach { case (l, vs) =>
      assert(vs.length == TextQueries.ReservoirK, s"$l: ${vs.length}")
      assert(vs.map(_._2).sorted.toSeq ==
        (1L to TextQueries.ReservoirK).toSeq)
    }
    // replay: the k smallest h60(doc_id) per lang from the raw table
    val all = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        graft.functions.TextFns.h60(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    all.groupBy(_._1).foreach { case (l, vs) =>
      val want = vs.sortBy(v => (v._3, v._2)).take(TextQueries.ReservoirK)
        .map(v => (v._2, v._3)).toSeq
      val got = byLang(l).sortBy(_._2).map(v => (v._3, v._4)).toSeq
      assert(got == want, s"$l: $got vs $want")
    }
  }

  test("text_keyterms: k rows per doc, scores non-increasing, exact for a doc") {
    val rows = run("text_keyterms")
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (d, vs) =>
      val o = vs.sortBy(_._2)
      assert(o.map(_._2).toSeq == (1L to o.length.toLong).toSeq)
      assert(o.length <= TextQueries.KeyTermsK)
      assert(o.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4
        case _ => true
      }, s"doc $d: scores must be non-increasing in rank")
    }
    // every doc with ≥1 token appears
    val nDocs = graft.Tables.documents(spark, sf)
      .filter(length(trim(col("text"))) > 0).count()
    assert(byDoc.size == nDocs)
  }

  test("er_fuzzy_match: histogram equals a local blocked-pairwise replay") {
    val got = run("er_fuzzy_match")
      .map(r => (r.getInt(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val sup = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val W = graft.queries.DedupQueries.ErWindow
    val want = sup.groupBy(_._3).toSeq.flatMap { case (nat, vs) =>
      // sorted-neighborhood replay: rank by (name, key), pair each row
      // with its next W sorted neighbors only
      val ordered = vs.sortBy(v => (v._2, v._1))
      val pairs = for {
        i <- ordered.indices
        j <- (i + 1) to math.min(i + W, ordered.length - 1)
      } yield lev(ordered(i)._2, ordered(j)._2).toLong
      pairs.groupBy(identity).map { case (d, ps) =>
        (nat, d) -> ((ps.size.toLong, if (d <= 2) ps.size.toLong else 0L))
      }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty, "sf0.01 must exercise real same-block pairs")
    // the SNM bound itself: total pairs ≤ n · W
    assert(got.values.map(_._1).sum <= sup.length.toLong * W)
  }

  test("ann_silhouette: equals a local centroid-distance replay; s in [0,1]") {
    import SimilarityQueries._
    val got = run("ann_silhouette")
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toIndexedSeq))
    def dot(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      (0 until Dim).map(i => a(i) * b(i)).sum
    val cents = all.filter(v => v._1 >= IvfCentroidBase &&
        v._1 < IvfCentroidBase + IvfLists)
      .map(v => (v._1 - IvfCentroidBase, v._2)).sortBy(_._1)
    val acc = collection.mutable.Map.empty[Long, (Long, Long)]
    all.foreach { case (_, v) =>
      val n2 = dot(v, v)
      val ds = cents.map { case (cid, cv) =>
        (n2 - 2 * dot(v, cv) + dot(cv, cv), cid)
      }
      val srt = ds.sortBy(x => (x._1, x._2))
      val (d1, cid) = (srt(0)._1, srt(0)._2)
      val d2 = ds.map(_._1).sorted.apply(1)
      val sq = if (d2 == 0) 0L
        else math.floor((1.0 - math.sqrt(d1.toDouble) /
          math.sqrt(d2.toDouble)) * 1000000 + 0.5).toLong
      val (n, s) = acc.getOrElse(cid, (0L, 0L))
      acc(cid) = (n + 1, s + sq)
    }
    assert(got.keySet == acc.keySet)
    acc.foreach { case (cid, (n, sq)) =>
      assert(got(cid)._1 == n && got(cid)._2 == sq, s"cluster $cid")
      assert(got(cid)._3 >= 0.0 && got(cid)._3 <= 1.0)
    }
    assert(got.values.map(_._1).sum == all.length.toLong)
  }

  test("graph_label_propagation: matches a local synchronous LPA replay") {
    val got = run("graph_label_propagation")
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.queries.DedupQueries.nearDupPairsShared(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSeq }
    var labels: Map[Long, Long] = adj.keys.map(k => k -> k).toMap
    for (_ <- 1 to graft.queries.GraphQueries.LpaRounds) {
      labels = adj.map { case (node, nbrs) =>
        val votes = nbrs.map(labels).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
        // most frequent neighbor label, ties to the smallest label
        node -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == labels)
    // communities are non-trivial: fewer labels than nodes
    assert(got.values.toSet.size < got.size)
  }

  test("text_bleu: matches a local naive BLEU-4 replay on every pair") {
    val got = run("text_bleu").map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3),
          (0 until 4).map(n => (r.getLong(4 + 2 * n), r.getLong(5 + 2 * n))),
          r.getLong(12), r.getDouble(13)))
    }.toMap
    val pairs = graft.queries.DedupQueries.nearDupPairsShared(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.TextFns.tokens(col("text")))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    def grams(tk: Vector[String], n: Int): Map[String, Long] =
      if (tk.length < n) Map.empty
      else tk.sliding(n).map(_.mkString(" ")).toSeq
        .groupBy(identity).map { case (g, vs) => g -> vs.size.toLong }
    val scale = graft.queries.TextQueries.LmLogScale
    pairs.foreach { case (a, b) =>
      val (ref, cand) = (docs(a), docs(b))
      val stats = (1 to 4).map { n =>
        val (gr, gc) = (grams(ref, n), grams(cand, n))
        val m = gc.map { case (g, c) => math.min(c, gr.getOrElse(g, 0L)) }.sum
        val t = gc.values.sum
        (m, t)
      }
      val slogp = stats.map { case (m, t) =>
        math.floor(math.log((m + 1).toDouble / (t + 1)) * scale + 0.5).toLong
      }.sum
      val bleu = math.exp(math.min(0.0, 1.0 - ref.length.toDouble / cand.length) +
        slogp.toDouble / (4 * scale))
      val (rl, cl, st, sl, bl) = got((a, b))
      assert(rl == ref.length && cl == cand.length)
      assert(st == stats, s"pair ($a,$b): $st vs $stats")
      assert(sl == slogp)
      assert(bl == math.floor(bleu * 1e6 + 0.5) / 1e6)
    }
    assert(got.keySet == pairs.toSet && pairs.nonEmpty)
  }

  test("er_match_weights: matches a local FS replay; agreement adds evidence") {
    val got = run("er_match_weights")
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val sup = graft.Tables.supplier(spark, sf)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        floor(col("s_acctbal") / 1000.0).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    def pat(a: (Long, String, Int, Long), b: (Long, String, Int, Long)) = {
      val d = lev(a._2, b._2)
      (if (d == 0) 2L else if (d <= 2) 1L else 0L,
        if (a._4 == b._4) 1L else 0L)
    }
    val W = graft.queries.DedupQueries.ErWindow
    val byBlock = sup.groupBy(_._3).map { case (b, vs) =>
      b -> vs.sortBy(v => (v._2, v._1))
    }
    val cand = byBlock.values.toSeq.flatMap { ordered =>
      for {
        i <- ordered.indices
        j <- (i + 1) to math.min(i + W, ordered.length - 1)
      } yield pat(ordered(i), ordered(j))
    }
    val rand = byBlock.toSeq.flatMap { case (b, ordered) =>
      byBlock.get((b + 13) % 25).toSeq.flatMap { partner =>
        ordered.indices.flatMap { i =>
          // a's rank i+1 pairs with partner's REVERSED rank i+1, i.e.
          // the record at forward index (size - (i+1))
          val idx = partner.length - (i + 1)
          if (idx >= 0) Some(pat(ordered(i), partner(idx))) else None
        }
      }
    }
    val tc = cand.length.toLong
    val tr = rand.length.toLong
    val want = (cand.groupBy(identity).keySet ++ rand.groupBy(identity).keySet)
      .map { p =>
        val nc = cand.count(_ == p).toLong
        val nr = rand.count(_ == p).toLong
        val ratio = ((nc + 1) * (tr + 6)).toDouble / ((nr + 1) * (tc + 6))
        p -> ((nc, nr,
          math.floor(math.log(ratio) * graft.queries.TextQueries.LmLogScale
            + 0.5).toLong))
      }.toMap
    assert(got == want, s"FS replay diverged: $got vs $want")
    // band agreement must ADD evidence within a name level
    got.keys.map(_._1).foreach { lvl =>
      for {
        (_, _, w1) <- got.get((lvl, 1L))
        (_, _, w0) <- got.get((lvl, 0L))
      } assert(w1 > w0, s"bal_agree weight not additive at name_lvl $lvl")
    }
  }

  test("ann_mmr_rerank: matches a full independent local MMR replay") {
    import SimilarityQueries._
    val got = run("ann_mmr_rerank")
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // replay from raw embeddings: scale, retrieve top-C, greedy-select
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toIndexedSeq))
    def dot(a: IndexedSeq[Long], b: IndexedSeq[Long]): Long =
      (0 until Dim).map(i => a(i) * b(i)).sum
    val q = all.find(_._1 == MmrQueryId).get._2
    val qn2 = dot(q, q).toDouble
    val cand = all.filter(_._1 != MmrQueryId)
      .map { case (id, v) =>
        val n2 = dot(v, v).toDouble
        (id, dot(q, v).toDouble / (math.sqrt(qn2) * math.sqrt(n2)), v, n2)
      }
      .sortBy { case (id, rel, _, _) => (-rel, id) }
      .take(MmrCand)
    def sim(a: (Long, Double, IndexedSeq[Long], Double),
            b: (Long, Double, IndexedSeq[Long], Double)): Double =
      dot(a._3, b._3).toDouble / (math.sqrt(a._4) * math.sqrt(b._4))
    var remaining = cand.toBuffer
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    for (rank <- 1 to MmrK) {
      val scored = remaining.map { c =>
        val sc =
          if (rank == 1) MmrLam * c._2
          else MmrLam * c._2 - MmrLamInv *
            sel.map(s => sim(c, cand.find(_._1 == s._2).get)).max
        (c, sc)
      }
      val best = scored.minBy { case (c, sc) => (-sc, c._1) }
      sel += ((rank.toLong, best._1._1, best._2))
      remaining -= best._1
    }
    assert(got.map(x => (x._1, x._2)).toSeq == sel.map(x => (x._1, x._2)).toSeq,
      s"selection order diverged: $got vs $sel")
    got.zip(sel).foreach { case (g, w) =>
      // the declared score is r6-quantized; the replay's raw greedy score
      // goes through the same floor(x*1e6+0.5)/1e6 grid
      assert(g._3 == math.floor(w._3 * 1e6 + 0.5) / 1e6) }
    // diversity: the MMR set must differ from the plain relevance top-k
    val topRel = cand.take(MmrK).map(_._1).toSet
    assert(got.map(_._2).toSet != topRel,
      "MMR should reorder vs pure relevance on this corpus")
  }
}
