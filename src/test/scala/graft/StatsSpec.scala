package graft

import org.apache.spark.sql.functions._

import graft.queries.QuerySpec

/** Behavioral pins for the stats family beyond the DuckDB twins: the
  * oracle proves Spark and DuckDB agree; these prove the shared spelling
  * means what the query names claim (Holt recurrence, Mann-Whitney
  * pairwise identity, order-statistic coverage). */
class StatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    try {
      SparkEntry.allQueries.find(_.name == name)
        .getOrElse(fail(s"no query named $name")).fn(spark, sf).collect()
    } finally QuerySpec.releaseStaged()

  test("ml_ridge_closed_form: the fitted betas satisfy the normal equations") {
    val r = run("ml_ridge_closed_form").head
    val beta = Array(r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // independent moments from the raw table
    val m = Tables.events(spark, sf)
      .select(floor(col("value") * 1000).cast("long").as("y"),
        hour(col("ts")).cast("long").as("x1"), expr("user_id % 16").as("x2"))
      .agg(count(lit(1)), sum("x1"), sum("x2"),
        sum(col("x1") * col("x1")), sum(col("x1") * col("x2")),
        sum(col("x2") * col("x2")),
        sum("y"), sum(col("x1") * col("y")), sum(col("x2") * col("y")))
      .head()
    val Seq(n, s1, s2, s11, s12, s22, sy, s1y, s2y) =
      (0 until 9).map(i => m.getLong(i).toDouble)
    val lam = 10.0
    val a = Array(Array(n + lam, s1, s2), Array(s1, s11 + lam, s12),
      Array(s2, s12, s22 + lam))
    val b = Array(sy, s1y, s2y)
    (0 until 3).foreach { i =>
      val lhs = (0 until 3).map(j => a(i)(j) * beta(j)).sum
      // r6 quantization of beta bounds the residual: |A|·5e-7 per row
      val tol = a(i).map(math.abs).sum * 5e-7 + 1e-6
      assert(math.abs(lhs - b(i)) <= tol,
        s"normal eq row $i: |$lhs - ${b(i)}| > $tol")
    }
    assert(r.getLong(0) == n.toLong && r.getDouble(4) >= 0.0)
  }

  test("ts_holt equals a driver-side replay of the recurrence per user") {
    val rows = run("ts_holt").map(r =>
      r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val raw = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1000).cast("long").as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(rows.keySet == raw.keySet)
    raw.foreach { case (user, evs) =>
      val vs = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      var l = vs.head
      var b = 0L
      vs.tail.foreach { v =>
        val l2 = (v + l + b) / 2 // Scala Long /: truncate toward zero
        b = (l2 - l + b) / 2
        l = l2
      }
      assert(rows(user) == ((l, b, l + b)), s"user $user")
    }
  }

  test("aqp_sample_estimate equals a local replay; estimates bracket truth") {
    val got = run("aqp_sample_estimate").map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getBoolean(9)))).toMap
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 1000).cast("long").as("y"),
        (graft.functions.TextFns.h60(col("event_id").cast("string"))
          % 100 < 5).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    rows.groupBy(_._1).foreach { case (et, vs) =>
      val (n, sy) = (vs.length.toLong, vs.map(_._2).sum)
      val sm = vs.filter(_._3)
      val (ns, ss, qs) = (sm.length.toLong, sm.map(_._2).sum,
        sm.map(v => v._2 * v._2).sum)
      val se2 = 2 * math.sqrt((qs.toDouble - ss.toDouble * ss / ns) /
        (ns - 1) / ns)
      val err = math.abs(sy.toDouble / n - ss.toDouble / ns)
      assert(got(et) == ((n, ns, ns * 20, ss * 20, sy,
        r6(ss.toDouble / ns), r6(sy.toDouble / n), r6(se2), err <= se2)),
        s"$et: ${got(et)}")
    }
    // the 2-sigma CI should bracket the truth for most strata
    assert(got.values.count(_._9) >= got.size - 1,
      "more than one stratum outside its own 95% CI")
  }

  test("ml_tree_depth2 equals a full local level-wise replay") {
    val got = run("ml_tree_depth2").map(r =>
      r.getInt(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
        r.getBoolean(9)))).toMap
    val rows = Tables.events(spark, sf)
      .select(floor(col("value") * 1000).cast("long").as("y"),
        hour(col("ts")).cast("long").as("f1"), expr("user_id % 16").as("f2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // best split of (y, f) pairs by the variance-gain identity,
    // ties to the smallest split value — floorDiv leaf means
    def fit(data: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
      val hist = data.groupBy(_._2).view
        .mapValues(v => (v.size.toLong, v.map(_._1).sum)).toSeq.sortBy(_._1)
      val (n, s) = (hist.map(_._2._1).sum, hist.map(_._2._2).sum)
      var (nl, sl) = (0L, 0L)
      val cands = hist.dropRight(1).map { case (f, (hn, hs)) =>
        nl += hn; sl += hs
        val (nr, sr) = (n - nl, s - sl)
        val gain = sl.toDouble * sl / nl + sr.toDouble * sr / nr
        (f, nl, nr, Math.floorDiv(sl, nl), Math.floorDiv(sr, nr), gain)
      }
      val best = cands.minBy(c => (-c._6, c._1))
      (best._1, best._2, best._3, best._4, best._5)
    }
    val (sp1, _, _, mul1, mur1) = fit(rows.map(r => (r._1, r._2)))
    (0 to 1).foreach { node =>
      val part = rows.filter(r => (if (r._2 <= sp1) 0 else 1) == node)
      val mu1 = if (node == 0) mul1 else mur1
      val (sp2, nl, nr, mul2, mur2) = fit(part.map(r => (r._1, r._3)))
      val sseB = part.map(r => (r._1 - mu1) * (r._1 - mu1)).sum
      val sseA = part.map { r =>
        val mu = if (r._3 <= sp2) mul2 else mur2
        (r._1 - mu) * (r._1 - mu)
      }.sum
      assert(got(node) == ((sp1.toInt, sp2.toInt, nl, nr, mul2, mur2,
        sseB, sseA, sseA < sseB)), s"node $node: ${got(node)}")
    }
  }

  test("ml_auc equals the naive pairwise Mann-Whitney count") {
    val Array(r) = run("ml_auc")
    val auc = r.getAs[Double]("auc")
    import graft.functions.TextFns.scaledVec
    val weights = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1L else -1L))
    val scored = Tables.embeddings(spark, sf)
      .select((col("label") >= 5).as("pos"),
        graft.functions.expr.DotLong(scaledVec(col("embedding")), weights)
          .as("score"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filterNot(_._1).map(_._2)
    assert(pos.length == r.getAs[Long]("n_pos") &&
      neg.length == r.getAs[Long]("n_neg"))
    // Σ over (pos, neg) pairs: 1 per win, 0.5 per tie — kept integral ×2.
    var twice = 0L
    for (p <- pos; n <- neg)
      twice += (if (p > n) 2L else if (p == n) 1L else 0L)
    val naive = twice.toDouble / (2.0 * pos.length * neg.length)
    assert(auc == math.floor(naive * 1e6 + 0.5) / 1e6,
      s"histogram rank-sum $auc vs pairwise $naive")
  }

  test("percentile_groups picks real order statistics (coverage bounds)") {
    val by = run("percentile_groups")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), floor(col("value") * 1000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    vals.foreach { case (slice, vs) =>
      val (n, p50, p90, p99) = by(slice)
      assert(n == vs.length)
      Seq(50 -> p50, 90 -> p90, 99 -> p99).foreach { case (p, v) =>
        assert(vs.contains(v), s"$slice p$p must be an observed value")
        // rank-selection definition: at least ⌈p·n/100⌉ values ≤ v and the
        // value strictly below rank ⌈p·n/100⌉ values can't cover p%.
        val rank = (p * n + 99) / 100
        assert(vs.count(_ <= v) >= rank, s"$slice p$p covers")
        assert(vs.count(_ < v) < rank, s"$slice p$p minimal")
      }
      assert(p50 <= p90 && p90 <= p99, s"$slice monotone")
    }
  }

  test("ml_ks_test equals a naive driver-side two-sample KS") {
    val Array(r) = run("ml_ks_test")
    val split = java.sql.Timestamp.valueOf(
      graft.queries.AnalyticsQueries.IvmSplit)
    val vs = Tables.events(spark, sf)
      .select(col("ts"), floor(col("value") * 1000).cast("long"))
      .collect().map(x => (x.getTimestamp(0), x.getLong(1)))
    val ref = vs.filter(_._1.before(split)).map(_._2).sorted
    val cur = vs.filterNot(_._1.before(split)).map(_._2).sorted
    assert(ref.length == r.getAs[Long]("n_ref") &&
      cur.length == r.getAs[Long]("n_cur"))
    val values = (ref ++ cur).distinct.sorted
    val dNum = values.map { v =>
      val c1 = ref.count(_ <= v).toLong
      val c2 = cur.count(_ <= v).toLong
      math.abs(c1 * cur.length - c2 * ref.length)
    }.max
    assert(dNum == r.getAs[Long]("d_num"),
      s"naive $dNum vs query ${r.getAs[Long]("d_num")}")
  }

  test("ml_survival_km equals a driver-side Kaplan-Meier replay") {
    val rows = run("ml_survival_km")
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("log_surv"))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val horizonUs = evs.map(e => tsUs(e._2)).max
    val obs = evs.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (tsUs(e._2), e._3))
      val gaps = sorted.sliding(2).collect { case Array(a, b) =>
        ((tsUs(b._2) - tsUs(a._2)) / 3600000000L, false)
      }.toSeq
      gaps :+ ((horizonUs - tsUs(sorted.last._2)) / 3600000000L, true)
    }.toSeq
    val byT = obs.groupBy(_._1).view
      .mapValues(g => (g.count(!_._2).toLong, g.count(_._2).toLong)).toMap
    assert(byT.keySet == rows.keySet)
    var atRisk = obs.size.toLong
    var logQ = 0L
    byT.keys.toSeq.sorted.foreach { t =>
      val (d, c) = byT(t)
      val (qRisk, qd, qc, qls) = rows(t)
      assert(qRisk == atRisk && qd == d && qc == c, s"t=$t")
      if (d > 0 && atRisk > d)
        logQ += math.floor(math.log((atRisk - d).toDouble / atRisk) * 1e4
          + 0.5).toLong
      else if (d > 0) logQ += -99000000L
      assert(qls == logQ.toDouble / 1e4, s"log_surv at t=$t")
      atRisk -= d + c
    }
  }

  private def tsUs(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000L

  test("ml_ndcg is bounded and exact at the endpoints") {
    val rows = run("ml_ndcg")
    assert(rows.length == 50)
    rows.foreach { r =>
      val ndcg = r.getAs[Double]("ndcg")
      val hits = r.getAs[Long]("n_hits")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"q=${r.getLong(0)}")
      if (hits == 10) assert(ndcg == 1.0, "all-hit ranking is ideal")
      if (hits == 0) assert(ndcg == 0.0)
    }
  }

  test("ts_acf equals an exact BigInt replay of the moment identity") {
    val rows = run("ts_acf")
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getAs[Double]("acf"))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 1000).cast("long"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3)))
    evs.groupBy(_._1).foreach { case (slice, es) =>
      val vs = es.sortBy(e => (tsUs(e._2), e._3)).map(_._4).map(BigInt(_))
      val n = BigInt(vs.length)
      val sSum = vs.sum
      val q = vs.map(v => v * v).sum
      (1 to 3).foreach { k =>
        val pairs = vs.dropRight(k).zip(vs.drop(k))
        val lk = pairs.map { case (a, b) => a * b }.sum
        val sh = vs.dropRight(k).sum
        val st = vs.drop(k).sum
        val ck = BigInt(pairs.length)
        val num = n * n * lk - n * sSum * (sh + st) + ck * sSum * sSum
        val den = n * n * q - n * sSum * sSum
        val acf = math.floor(num.toDouble / den.toDouble * 1e6 + 0.5) / 1e6
        val (qPairs, qAcf) = rows((slice, k))
        assert(qPairs == pairs.length.toLong && qAcf == acf,
          s"$slice lag $k: replay $acf vs $qAcf")
      }
    }
  }

  test("ml_avg_precision equals a driver-side threshold walk") {
    val Array(r) = run("ml_avg_precision")
    import graft.functions.TextFns.scaledVec
    val weights = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1L else -1L))
    val scored = Tables.embeddings(spark, sf)
      .select((col("label") >= 5).as("pos"),
        graft.functions.expr.DotLong(scaledVec(col("embedding")), weights)
          .as("score"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val posTotal = scored.count(_._1).toLong
    assert(posTotal == r.getAs[Long]("n_pos"))
    // Histogram convention: every distinct score is one threshold; the
    // replay walks them descending with the same per-step quantization.
    val byScore = scored.groupBy(_._2).view
      .mapValues(g => (g.length.toLong, g.count(_._1).toLong)).toMap
    var tp = 0L
    var preds = 0L
    var apq = 0L
    byScore.keys.toSeq.sorted.reverse.foreach { sc =>
      val (n, p) = byScore(sc)
      tp += p; preds += n
      apq += math.floor((p.toDouble / posTotal) * (tp.toDouble / preds)
        * 1e8 + 0.5).toLong
    }
    assert(r.getAs[Double]("avg_precision") == apq.toDouble / 1e8)
  }

  test("ml_drift_embedding equals a BigInt centroid replay") {
    val Array(r) = run("ml_drift_embedding")
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(x => (x.getLong(0),
        // Spark's round() is HALF_UP away from zero (BigDecimal), not
        // math.round's half-toward-+inf — they differ on negative .5s.
        x.getSeq[Float](1).map(f => BigDecimal(f.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray))
    def meanVec(par: Long) = rows.filter(_._1 % 2 == par).map(_._2)
      .reduce((a, b) => a.zip(b).map { case (x, y) => x + y })
      .map(BigInt(_))
    val (a, b) = (meanVec(0), meanVec(1))
    def dot(x: Array[BigInt], y: Array[BigInt]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    val cos = dot(a, b).toString.toDouble /
      (math.sqrt(dot(a, a).toString.toDouble) *
        math.sqrt(dot(b, b).toString.toDouble))
    assert(r.getAs[Double]("centroid_cos") ==
      math.floor(cos * 1e6 + 0.5) / 1e6)
  }

  test("ts_cross_corr equals a BigInt dense-grid replay") {
    val rows = run("ts_cross_corr")
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Double]("ccf"))).toMap
    val evs = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"),
        floor(col("value") * 1000).cast("long"))
      .collect().map(r => (tsUs(r.getTimestamp(0)) / 900000000L,
        r.getString(1), r.getLong(2)))
    val byB = evs.groupBy(_._1).view.mapValues { g =>
      (g.filter(_._2 == "click").map(_._3).sum,
        g.filter(_._2 == "purchase").map(_._3).sum)
    }.toMap
    val (mn, mx) = (byB.keys.min, byB.keys.max)
    val grid = (mn to mx).map(b => byB.getOrElse(b, (0L, 0L)))
    Seq(-1, 0, 1).foreach { lg =>
      val pairs = grid.indices.flatMap { i =>
        val j = i + lg
        if (j >= 0 && j < grid.length) Some((grid(i)._1, grid(j)._2))
        else None
      }
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val syy = pairs.map(p => BigInt(p._2) * p._2).sum
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val ccf = (n * sxy - sx * sy).toString.toDouble /
        (math.sqrt((n * sxx - sx * sx).toString.toDouble) *
          math.sqrt((n * syy - sy * sy).toString.toDouble))
      val (qPairs, qCcf) = rows(lg)
      assert(qPairs == pairs.length.toLong, s"lag $lg pair count")
      assert(qCcf == math.floor(ccf * 1e6 + 0.5) / 1e6, s"lag $lg ccf")
    }
  }

  test("sketch_bloom probes through the codegen'd native expression") {
    val q = SparkEntry.allQueries.find(_.name == "sketch_bloom").get
    val p =
      try q.fn(spark, sf).queryExecution.executedPlan.toString
      finally QuerySpec.releaseStaged()
    assert(p.contains("might_contain"),
      s"probe must be BloomFilterMightContain, not a UDF; got:\n$p")
    assert(!p.toLowerCase.contains("scalaudf"), "no scala UDF in the probe")
  }
}
