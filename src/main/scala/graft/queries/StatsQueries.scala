package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Statistical aggregation regimes the KPI/analytics families don't touch:
  * exact multi-distinct counting, exact per-group order statistics
  * (percentile / mode), OHLC bar resampling, and a contingency-table test.
  *
  * All five are integer-exact end to end (the events `value` rides the
  * 1e3 "millivalue" grid used throughout the suite); the one float op in
  * the family (the chi-squared cell ratio) is a fixed IEEE tree over exact
  * integers, quantized per cell BEFORE the sum so accumulation order can
  * never leak in — the `text_lm_score` argument.
  */
object StatsQueries {
  import QuerySpec._

  /** `value` → exact BIGINT millivalue. */
  private def mv(c: org.apache.spark.sql.Column) =
    floor(c * 1000).cast("long")

  /** FLOOR division of BIGINTs with one explicit semantics everywhere
    * (ADVICE r9). Measured: DuckDB `//` TRUNCATES toward zero
    * (-7 // 2 = -3), same as Spark `DIV` — but the local replay specs
    * use Math.floorDiv, and the three only agree because harness sums
    * are non-negative. Subtracting the canonical non-negative mod first
    * makes the numerator an exact multiple of the (positive) divisor,
    * where truncate = floor = exact — all in BIGINT, no double
    * round-trip, no sign precondition. Mirrored verbatim in the oracle
    * SQL. */
  private def floorDivExact(a: String, b: String) =
    expr(s"($a - (($a % $b + $b) % $b)) DIV $b")

  /** 3×3 determinant as one fixed IEEE tree — shared by the closed-form
    * ridge fit and its cross-validation (identical op order on both
    * engines; see ml_ridge_closed_form). */
  private def sqlDet3(m: Seq[String]) =
    s"(${m(0)} * (${m(4)} * ${m(8)} - ${m(5)} * ${m(7)}) " +
      s"- ${m(1)} * (${m(3)} * ${m(8)} - ${m(5)} * ${m(6)}) " +
      s"+ ${m(2)} * (${m(3)} * ${m(7)} - ${m(4)} * ${m(6)}))"

  private def colDet3(m: Seq[org.apache.spark.sql.Column]) =
    m(0) * (m(4) * m(8) - m(5) * m(7)) -
      m(1) * (m(3) * m(8) - m(5) * m(6)) +
      m(2) * (m(3) * m(7) - m(4) * m(6))

  /** percentile_groups' DuckDB twin — shared with its parser-route
    * restatement (`sql_percentile_groups`, [[SqlSurfaceQueries]]); the
    * Spark-SQL spelling differs only in `//` → `DIV` (same truncating
    * semantics, measured — see floorDivExact's note). */
  private[queries] val percentileGroupsOracleSql: String =
    """WITH sv AS (SELECT event_type AS slice,
      |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
      |w AS (SELECT slice, v,
      |    row_number() OVER (PARTITION BY slice ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY slice) AS n FROM sv)
      |SELECT slice, CAST(max(n) AS BIGINT) AS n_events,
      |  CAST(max(CASE WHEN rn = (50 * n + 99) // 100 THEN v END) AS BIGINT)
      |    AS p50_mv,
      |  CAST(max(CASE WHEN rn = (90 * n + 99) // 100 THEN v END) AS BIGINT)
      |    AS p90_mv,
      |  CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS BIGINT)
      |    AS p99_mv
      |FROM w GROUP BY slice""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // Exact multi-distinct aggregation, spelled as the two-phase shape a
    // 100 TB warehouse actually runs. `count(DISTINCT user_id),
    // count(DISTINCT day)` in ONE aggregate makes Catalyst plan an Expand
    // that replicates every input row once per distinct group (3× the
    // corpus through the first shuffle at this query's two groups + the
    // plain count). The manual form — one narrow staged projection, one
    // pre-dedup aggregate per distinct dimension, tiny per-slice frames
    // broadcast back together — never multiplies the corpus: each
    // dedup is a map-side-combinable aggregate on its own (slice, dim)
    // key. PlanShapeSpec pins Expand out of the plan.
    checked("agg_multi_distinct",
      """SELECT event_type AS slice, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days
        |FROM events GROUP BY 1""".stripMargin) { (s, d) =>
      val ev = staged(Tables.events(s, d)
        .select(col("event_type").as("slice"), col("user_id"),
          date_trunc("day", col("ts")).as("day")))
      val tot = ev.groupBy("slice").agg(count(lit(1)).as("n_events"))
      val users = ev.select("slice", "user_id").distinct()
        .groupBy("slice").agg(count(lit(1)).as("n_users"))
      val days = ev.select("slice", "day").distinct()
        .groupBy("slice").agg(count(lit(1)).as("n_days"))
      tot.join(broadcast(users), "slice").join(broadcast(days), "slice")
        .select("slice", "n_events", "n_users", "n_days")
    },

    // Exact per-group percentiles by rank selection — the honest exact
    // path next to the mergeable-sketch one (`sketch_quantiles`): at any
    // scale, an EXACT percentile requires a per-group sort; this states it
    // as ONE window pass (rank + group size in the same (slice, v)-sorted
    // frame) and a conditional aggregate, so the whole query is a single
    // shuffle on the group key. Ranks are the integral form
    // ceil(p·n/100) = (p·n + 99) div 100 — no float ceil misrounding —
    // and the selected millivalues are exact BIGINTs. Equal-value ties
    // make row_number's choice among peers arbitrary but the SELECTED
    // value at a fixed rank is unique, so the result is deterministic.
    checked("percentile_groups", StatsQueries.percentileGroupsOracleSql) { (s, d) =>
      val w = Window.partitionBy("slice").orderBy("v")
      val sv = Tables.events(s, d)
        .select(col("event_type").as("slice"), mv(col("value")).as("v"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("slice")))
      def pick(p: Int) =
        max(when(col("rn") === expr(s"($p * n + 99) DIV 100"), col("v")))
      sv.groupBy("slice").agg(max(col("n")).as("n_events"),
        pick(50).as("p50_mv"), pick(90).as("p90_mv"), pick(99).as("p99_mv"))
    },

    // Per-group MODE with a deterministic tie-break (highest count, then
    // lowest value) — the categorical summary statistic none of the
    // existing aggregates produce. Shape: one (slice, v) count aggregate
    // (map-side combined — the corpus-wide shuffle is |distinct values|,
    // not |rows|), then a max-count window over the per-slice count frame
    // and a min over the argmax peers. At 100 TB the count frame is the
    // only big intermediate and it's already the smallest possible one.
    checked("agg_mode",
      """WITH c AS (SELECT event_type AS slice,
        |    CAST(floor(value * 1000) AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT slice, v, cnt, max(cnt) OVER (PARTITION BY slice) AS mx
        |  FROM c)
        |SELECT slice, CAST(min(v) AS BIGINT) AS mode_mv,
        |  CAST(max(mx) AS BIGINT) AS mode_n
        |FROM m WHERE cnt = mx GROUP BY slice""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type").as("slice"), mv(col("value")).as("v"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("mx", max(col("cnt")).over(Window.partitionBy("slice")))
      c.filter(col("cnt") === col("mx")).groupBy("slice")
        .agg(min(col("v")).as("mode_mv"), max(col("mx")).as("mode_n"))
    },

    // OHLC bar resampling — the financial/telemetry downsample the ts
    // family lacks: per (slice, 15-minute bucket), the first (open) and
    // last (close) observation under the total (ts, event_id) order plus
    // the extrema and count. One shuffle on the bar key; both edge picks
    // ride row_number in the SAME partitioning (two sorts, no second
    // exchange), values stay exact millivalue BIGINTs and the bar
    // timestamp is rebuilt from the integral bucket id. The generated
    // column names come out in OHLC order so the bar table reads like the
    // convention.
    checked("ohlc_resample",
      """WITH sv AS (SELECT event_type AS slice,
        |    epoch_us(ts) // 900000000 AS b, ts, event_id,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |w AS (SELECT slice, b, v,
        |    row_number() OVER (PARTITION BY slice, b ORDER BY ts, event_id)
        |      AS ra,
        |    row_number() OVER (PARTITION BY slice, b
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM sv)
        |SELECT slice, make_timestamp(b * 900000000) AS bar_ts,
        |  CAST(max(CASE WHEN ra = 1 THEN v END) AS BIGINT) AS open_mv,
        |  CAST(max(v) AS BIGINT) AS high_mv,
        |  CAST(min(v) AS BIGINT) AS low_mv,
        |  CAST(max(CASE WHEN rd = 1 THEN v END) AS BIGINT) AS close_mv,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM w GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val wa = Window.partitionBy("slice", "b").orderBy(col("ts"), col("event_id"))
      val wd = Window.partitionBy("slice", "b")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("event_type").as("slice"),
          expr("unix_micros(ts) DIV 900000000").as("b"),
          col("ts"), col("event_id"), mv(col("value")).as("v"))
        .withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy(col("slice"), timestamp_micros(col("b") * 900000000L).as("bar_ts"))
        .agg(max(when(col("ra") === 1, col("v"))).as("open_mv"),
          max(col("v")).as("high_mv"), min(col("v")).as("low_mv"),
          max(when(col("rd") === 1, col("v"))).as("close_mv"),
          count(lit(1)).as("n_events"))
    },

    // Average precision (AUPRC by the step identity) — the
    // imbalance-robust companion of ml_auc, over the same exact score
    // histogram: walking thresholds down the score order, AP =
    // Σ_k (TP_k − TP_{k−1})/P · Precision_k, where every TP/FP count is
    // an exact BIGINT cumulative and each step's term is quantized to
    // 1e-8 BEFORE the sum (the stats_chi2 argument). Ties are handled
    // at group granularity — every distinct score is one threshold —
    // which is the standard histogram AP.
    checked("ml_avg_precision", {
      import graft.functions.TextFns.sqlScaledVec
      s"""WITH sv0 AS (SELECT label, ${sqlScaledVec("embedding")} AS v
         |  FROM embeddings),
         |sv AS (SELECT label >= 5 AS pos,
         |    list_aggregate(list_transform(range(1, 65),
         |      i -> v[i] * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END)), 'sum')
         |      AS score
         |  FROM sv0),
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS p
         |  FROM sv GROUP BY 1),
         |c AS (SELECT CAST(sum(p) OVER w AS BIGINT) AS tp,
         |    CAST(sum(n) OVER w AS BIGINT) AS preds, p AS dp FROM g
         |  WINDOW w AS (ORDER BY score DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT CAST(sum(dp) AS BIGINT) AS pos_total FROM c),
         |s AS (SELECT CAST(sum(CAST(floor(
         |    (CAST(dp AS DOUBLE) / pos_total) *
         |    (CAST(tp AS DOUBLE) / preds) * 1e8 + 0.5) AS BIGINT))
         |    AS BIGINT) AS apq FROM c, t)
         |SELECT (SELECT pos_total FROM t) AS n_pos,
         |  CAST(apq AS DOUBLE) / 1e8 AS avg_precision
         |FROM s""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFns.scaledVec
      val weights = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1L else -1L))
      val g = Tables.embeddings(s, d)
        .select((col("label") >= 5).as("pos"),
          graft.functions.expr.DotLong(scaledVec(col("embedding")), weights)
            .as("score"))
        .groupBy("score")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("p"))
      val w = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = staged(g.select(sum(col("p")).over(w).as("tp"),
        sum(col("n")).over(w).as("preds"), col("p").as("dp")))
      val t = c.agg(sum(col("dp")).as("pos_total"))
      c.crossJoin(broadcast(t))
        .select(floor((col("dp").cast("double") / col("pos_total")) *
          (col("tp").cast("double") / col("preds")) * 1e8 + 0.5)
          .cast("long").as("term"), col("pos_total"))
        .groupBy("pos_total").agg(sum(col("term")).as("apq"))
        .select(col("pos_total").as("n_pos"),
          (col("apq").cast("double") / 1e8).as("avg_precision"))
    },

    // Embedding-space DRIFT monitor — the vector-side companion of
    // ml_ks_test/ml_psi (production embedding pipelines alert on the
    // centroid moving or the norm scale shifting between snapshots):
    // the corpus splits deterministically by vec_id parity, each half's
    // mean direction is an exact integer component-sum vector, and the
    // cosine between the two mean vectors plus the norm-squared ratio
    // are the drift verdicts — exact BIGINT dot/norm arithmetic (peak
    // ~64·(1000·5e6)² ≈ 1e21 — DECIMAL(38)/HUGEINT products), one IEEE
    // division each. One map-side-combined aggregate to 2×64 cells.
    checked("ml_drift_embedding", {
      import graft.functions.TextFns.sqlScaledVec
      val dotAB = "list_aggregate(list_transform(range(1, 65), " +
        "i -> CAST(a[i] AS HUGEINT) * b[i]), 'sum')"
      def nrm(x: String) = "list_aggregate(list_transform(range(1, 65), " +
        s"i -> CAST($x[i] AS HUGEINT) * $x[i]), 'sum')"
      s"""WITH sv AS (SELECT vec_id % 2 AS grp,
         |    ${sqlScaledVec("embedding")} AS v FROM embeddings),
         |ex AS (SELECT grp, unnest(v) AS x,
         |    unnest(range(1, 65)) AS i FROM sv),
         |cs AS (SELECT grp, i, CAST(sum(x) AS BIGINT) AS sx FROM ex
         |  GROUP BY grp, i),
         |m AS (SELECT grp, list(sx ORDER BY i) AS mv FROM cs GROUP BY grp),
         |cnt AS (SELECT vec_id % 2 AS grp, CAST(count(*) AS BIGINT) AS n
         |  FROM embeddings GROUP BY 1),
         |mm AS (SELECT m.grp, mv, n FROM m JOIN cnt ON m.grp = cnt.grp),
         |p AS (SELECT x.n AS n_a, y.n AS n_b, x.mv AS a, y.mv AS b
         |  FROM mm x JOIN mm y ON x.grp = 0 AND y.grp = 1)
         |SELECT n_a, n_b,
         |  ${graft.functions.DetAgg.sqlR6(
            s"CAST(CAST($dotAB AS VARCHAR) AS DOUBLE) / " +
              s"(sqrt(CAST(CAST(${nrm("a")} AS VARCHAR) AS DOUBLE)) * " +
              s"sqrt(CAST(CAST(${nrm("b")} AS VARCHAR) AS DOUBLE)))")}
         |    AS centroid_cos,
         |  ${graft.functions.DetAgg.sqlR6(
            s"(CAST(CAST(${nrm("a")} AS VARCHAR) AS DOUBLE) * n_b * n_b) / " +
              s"(CAST(CAST(${nrm("b")} AS VARCHAR) AS DOUBLE) * n_a * n_a)")}
         |    AS norm2_ratio
         |FROM p""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFns.scaledVec
      import org.apache.spark.sql.types.DecimalType
      val m = Tables.embeddings(s, d)
        .select(expr("vec_id % 2").as("grp"),
          posexplode(scaledVec(col("embedding"))).as(Seq("i", "x")))
        .groupBy("grp", "i").agg(sum(col("x")).as("sx"))
        .groupBy("grp")
        .agg(array_sort(collect_list(struct(col("i"), col("sx")))).as("ps"))
        .select(col("grp"), size(col("ps")).as("dim"),
          transform(col("ps"), p => p.getField("sx")).as("mv"))
      val cnt = Tables.embeddings(s, d).groupBy(expr("vec_id % 2").as("grp"))
        .agg(count(lit(1)).as("n"))
      val mm = m.join(cnt, "grp")
      def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      def dotDec(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => dec(x) * dec(y)),
          lit(0).cast(DecimalType(38, 0)), (acc, x) => acc + x)
      val p = mm.filter(col("grp") === 0)
        .select(col("n").as("n_a"), col("mv").as("a"))
        .crossJoin(broadcast(mm.filter(col("grp") === 1)
          .select(col("n").as("n_b"), col("mv").as("b"))))
      p.select(col("n_a"), col("n_b"),
        graft.functions.DetAgg.r6(
          dotDec(col("a"), col("b")).cast("string").cast("double") /
            (sqrt(dotDec(col("a"), col("a")).cast("string").cast("double")) *
              sqrt(dotDec(col("b"), col("b")).cast("string").cast("double"))))
          .as("centroid_cos"),
        graft.functions.DetAgg.r6(
          (dotDec(col("a"), col("a")).cast("string").cast("double") *
            col("n_b") * col("n_b")) /
            (dotDec(col("b"), col("b")).cast("string").cast("double") *
              col("n_a") * col("n_a"))).as("norm2_ratio"))
    },

    // ROC AUC by the rank-sum (Mann-Whitney) identity over the score
    // HISTOGRAM — the classification-eval metric ml_metrics'
    // regression pair lacks, in the form production actually computes
    // it at scale: scores aggregate to (score → n, n_pos) counts first
    // (map-side combined; the distributed pass), and the ordered
    // cumulative + rank arithmetic runs over that bounded histogram
    // (|distinct scores| rows — here exact integer dot-product scores,
    // at 100 TB a binned score grid; never the corpus). Tie groups get
    // the average rank exactly: 2·rank_avg = 2·below + n_g + 1 keeps
    // every term integral, so AUC = (Σ 2R⁺ − n₁(n₁+1)) / (2·n₁·n₀) is
    // one exact-integer ratio with a single shared IEEE division.
    // Score = ⟨scaled embedding, alternating ±1⟩ (exact BIGINT via the
    // native DotLong); label ≥ 5 splits the 0..9 labels evenly.
    checked("ml_auc", {
      import graft.functions.TextFns.sqlScaledVec
      s"""WITH sv0 AS (SELECT label, ${sqlScaledVec("embedding")} AS v
         |  FROM embeddings),
         |sv AS (SELECT label >= 5 AS pos,
         |    list_aggregate(list_transform(range(1, 65),
         |      i -> v[i] * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END)), 'sum')
         |      AS score
         |  FROM sv0),
         |g AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS p
         |  FROM sv GROUP BY 1),
         |w AS (SELECT n, p, CAST(COALESCE(sum(n) OVER (ORDER BY score
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS below FROM g),
         |m AS (SELECT CAST(sum(p) AS BIGINT) AS n1,
         |    CAST(sum(n - p) AS BIGINT) AS n0,
         |    CAST(sum(p * (2 * below + n + 1)) AS BIGINT) AS r2 FROM w)
         |SELECT n1 AS n_pos, n0 AS n_neg,
         |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL ELSE
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(r2 - n1 * (n1 + 1) AS DOUBLE) / CAST(2 * n1 * n0 AS DOUBLE)")}
         |  END AS auc
         |FROM m""".stripMargin
    }) { (s, d) =>
      // Mirrored one-class guard (ADVICE r8): AUC is undefined without
      // both classes — NULL, not a 0/0 NaN, on degenerate input.
      import graft.functions.TextFns.scaledVec
      val weights = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1L else -1L))
      val g = Tables.embeddings(s, d)
        .select((col("label") >= 5).as("pos"),
          graft.functions.expr.DotLong(scaledVec(col("embedding")), weights)
            .as("score"))
        .groupBy("score")
        .agg(count(lit(1)).as("n"), sum(when(col("pos"), 1L).otherwise(0L)).as("p"))
      val below = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val m = g
        .withColumn("below", coalesce(sum(col("n")).over(below), lit(0L)))
        .agg(sum(col("p")).as("n1"), sum(col("n") - col("p")).as("n0"),
          sum(col("p") * (lit(2) * col("below") + col("n") + 1)).as("r2"))
      m.select(col("n1").as("n_pos"), col("n0").as("n_neg"),
        when(col("n1") > 0 && col("n0") > 0,
          graft.functions.DetAgg.r6(
            (col("r2") - col("n1") * (col("n1") + 1)).cast("double") /
              (lit(2) * col("n1") * col("n0")).cast("double"))).as("auc"))
    },

    // Poisson bootstrap confidence interval — THE distributed bootstrap
    // (resampling n rows with replacement needs global coordination;
    // giving each row an independent Poisson(1) weight per resample
    // doesn't): every row contributes to each of B = 32 resamples with a
    // deterministic hash-derived weight (h60(event_id:b) mod 1e6 against
    // the literal Poisson(1) CDF thresholds — exact integers, engine-
    // identical), so the whole bootstrap is ONE projection that explodes
    // ×32 and immediately map-side-combines to 32 (Σwv, Σw) cells — the
    // explosion never crosses a shuffle. The CI is rank-selected from
    // the 32 resample means (p5/p95 = ranks 2/31); each mean is one IEEE
    // division of exact BIGINTs, so ordering and values are
    // bit-identical cross-engine.
    checked("ml_bootstrap_ci", {
      import graft.functions.TextFns.sqlH60
      val u = sqlH60("CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)") +
        " % 1000000"
      s"""WITH r AS (SELECT event_id,
         |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
         |e AS (SELECT v, b, ($u) AS u
         |  FROM r CROSS JOIN (SELECT unnest(range(0, 32)) AS b)),
         |wt AS (SELECT b, v,
         |    CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
         |         WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
         |         WHEN u < 996340 THEN 4 ELSE 5 END AS w
         |  FROM e),
         |m AS (SELECT b, CAST(sum(w * v) AS BIGINT) AS sw,
         |    CAST(sum(w) AS BIGINT) AS n FROM wt GROUP BY b),
         |rk AS (SELECT CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         |    row_number() OVER (
         |      ORDER BY CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), b) AS rn
         |  FROM m),
         |f AS (SELECT CAST(sum(v) AS BIGINT) AS sv,
         |    CAST(count(*) AS BIGINT) AS nv FROM r)
         |SELECT CAST(32 AS BIGINT) AS n_resamples,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(sv AS DOUBLE) / CAST(nv AS DOUBLE)")} AS mean_full,
         |  ${graft.functions.DetAgg.sqlR6(
             "max(CASE WHEN rn = 2 THEN mean END)")} AS ci_lo,
         |  ${graft.functions.DetAgg.sqlR6(
             "max(CASE WHEN rn = 31 THEN mean END)")} AS ci_hi
         |FROM rk, f GROUP BY sv, nv""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFns.h60
      val r = staged(Tables.events(s, d)
        .select(col("event_id"), floor(col("value") * 1000).cast("long").as("v")))
      val e = r.select(col("v"), col("event_id"),
          explode(sequence(lit(0), lit(31))).as("b"))
        .withColumn("u", h60(concat(col("event_id").cast("string"), lit(":"),
          col("b").cast("string"))) % 1000000)
      val m = e.withColumn("w",
          when(col("u") < 367879, 0).when(col("u") < 735759, 1)
            .when(col("u") < 919699, 2).when(col("u") < 981012, 3)
            .when(col("u") < 996340, 4).otherwise(5))
        .groupBy("b")
        .agg(sum(col("w") * col("v")).as("sw"), sum(col("w")).as("n"))
      val rk = m
        .select(col("b"), (col("sw").cast("double") / col("n").cast("double"))
          .as("mean"))
        .withColumn("rn", row_number().over(Window.orderBy("mean", "b")))
      val f = r.agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
      rk.crossJoin(broadcast(f)).groupBy("sv", "nv")
        .agg(graft.functions.DetAgg.r6(
            max(when(col("rn") === 2, col("mean")))).as("ci_lo"),
          graft.functions.DetAgg.r6(
            max(when(col("rn") === 31, col("mean")))).as("ci_hi"))
        .select(lit(32L).as("n_resamples"),
          graft.functions.DetAgg.r6(
            col("sv").cast("double") / col("nv").cast("double"))
            .as("mean_full"),
          col("ci_lo"), col("ci_hi"))
    },

    // Two boosting rounds of HISTOGRAM-SPLIT decision stumps — the
    // split-search shape every production GBDT (XGBoost/LightGBM) runs
    // at scale: per round, ONE map-side-combined histogram aggregate
    // over the feature (24 hour cells / 16 user-segment cells), prefix
    // sums over the cell frame, and the best split by the variance-gain
    // identity argmax S_L²/n_L + S_R²/n_R (computed in DOUBLE from
    // exact BIGINTs — one fixed IEEE tree, ties to the smallest split).
    // Leaf values are truncated integer means, so residuals stay exact
    // BIGINTs and round 2 fits the residual of round 1; each round's
    // SSE is an exact Σr² and `improved` (SSE strictly falls) is a
    // measured boolean, not an assumption. The model frames (one row
    // per round) cross back in as broadcasts — no driver collect, the
    // whole two-round fit is one declarative plan with two corpus
    // passes.
    // Ridge regression by the NORMAL EQUATIONS, solved in closed form —
    // the one linear-model fit that is fully SQL-expressible and
    // therefore carries a REAL arithmetic oracle (the trainer queries
    // pin their loops via dump-echo + invariants; this pins an actual
    // fit bit-for-bit cross-engine). Model: y ~ β0 + β1·hour + β2·bucket
    // on the 1e3-scaled value grid, λ = 10 added to the WHOLE diagonal
    // (penalized intercept — declared semantics, keeps the system
    // symmetric). The 100 TB shape: ONE map-side-combined aggregate
    // computes the nine Gram/moment cells as exact BIGINTs (max cell
    // ~4e12, exact in double after the correctly-rounded cast); the
    // 3×3 solve is Cramer's rule as one fixed IEEE tree over those
    // doubles — identical on both engines — and each β is one division,
    // r6-rounded. Training SSE comes from the SAME moments
    // (Σy² − 2βᵀXᵀy + βᵀXᵀXβ), never a second per-row pass whose float
    // sum order would be partition-dependent. Model state: 9 cells.
    checked("ml_ridge_closed_form", {
      def det3(a: String, b: String, c: String, d: String, e: String,
               f: String, g: String, h: String, i: String) =
        sqlDet3(Seq(a, b, c, d, e, f, g, h, i))
      // A = [[n+λ, s1, s2], [s1, s11+λ, s12], [s2, s12, s22+λ]]
      val a = Seq("(CAST(n AS DOUBLE) + 10)", "CAST(s1 AS DOUBLE)",
        "CAST(s2 AS DOUBLE)", "CAST(s1 AS DOUBLE)",
        "(CAST(s11 AS DOUBLE) + 10)", "CAST(s12 AS DOUBLE)",
        "CAST(s2 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
        "(CAST(s22 AS DOUBLE) + 10)")
      val b = Seq("CAST(sy AS DOUBLE)", "CAST(s1y AS DOUBLE)",
        "CAST(s2y AS DOUBLE)")
      val dA = det3(a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7), a(8))
      val d0 = det3(b(0), a(1), a(2), b(1), a(4), a(5), b(2), a(7), a(8))
      val d1 = det3(a(0), b(0), a(2), a(3), b(1), a(5), a(6), b(2), a(8))
      val d2 = det3(a(0), a(1), b(0), a(3), a(4), b(1), a(6), a(7), b(2))
      val sse = "(CAST(syy AS DOUBLE) " +
        s"- 2 * (b0 * CAST(sy AS DOUBLE) + b1 * CAST(s1y AS DOUBLE)" +
        s" + b2 * CAST(s2y AS DOUBLE)) " +
        s"+ (b0 * (b0 * CAST(n AS DOUBLE) + b1 * CAST(s1 AS DOUBLE)" +
        s" + b2 * CAST(s2 AS DOUBLE))" +
        s" + b1 * (b0 * CAST(s1 AS DOUBLE) + b1 * CAST(s11 AS DOUBLE)" +
        s" + b2 * CAST(s12 AS DOUBLE))" +
        s" + b2 * (b0 * CAST(s2 AS DOUBLE) + b1 * CAST(s12 AS DOUBLE)" +
        s" + b2 * CAST(s22 AS DOUBLE))))"
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS y,
         |    CAST(hour(ts) AS BIGINT) AS x1, user_id % 16 AS x2 FROM events),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
         |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS s2y,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM sv),
         |beta AS (SELECT n,
         |    ($d0) / ($dA) AS b0, ($d1) / ($dA) AS b1, ($d2) / ($dA) AS b2,
         |    sy, s1y, s2y, syy, s1, s2, s11, s12, s22
         |  FROM g)
         |SELECT n AS n_rows, ${graft.functions.DetAgg.sqlR6("b0")} AS beta0,
         |  ${graft.functions.DetAgg.sqlR6("b1")} AS beta1,
         |  ${graft.functions.DetAgg.sqlR6("b2")} AS beta2,
         |  ${graft.functions.DetAgg.sqlR6(s"$sse / n")} AS mse
         |FROM beta""".stripMargin
    }) { (s, d) =>
      val sv = Tables.events(s, d)
        .select(mv(col("value")).as("y"), hour(col("ts")).cast("long").as("x1"),
          expr("user_id % 16").as("x2"))
      val g = sv.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"),
        sum(col("y") * col("y")).as("syy"))
      def dbl(c: String) = col(c).cast("double")
      def det3(m: Seq[org.apache.spark.sql.Column]) = colDet3(m)
      val lam = lit(10.0)
      val aM = Seq(dbl("n") + lam, dbl("s1"), dbl("s2"),
        dbl("s1"), dbl("s11") + lam, dbl("s12"),
        dbl("s2"), dbl("s12"), dbl("s22") + lam)
      val bV = Seq(dbl("sy"), dbl("s1y"), dbl("s2y"))
      val dA = det3(aM)
      def repl(i: Int) = det3(aM.zipWithIndex.map { case (c, j) =>
        if (j % 3 == i) bV(j / 3) else c
      })
      val beta = g.select(col("n"), (repl(0) / dA).as("b0"),
        (repl(1) / dA).as("b1"), (repl(2) / dA).as("b2"),
        dbl("sy").as("dsy"), dbl("s1y").as("ds1y"), dbl("s2y").as("ds2y"),
        dbl("syy").as("dsyy"), dbl("n").as("dn"), dbl("s1").as("ds1"),
        dbl("s2").as("ds2"), dbl("s11").as("ds11"), dbl("s12").as("ds12"),
        dbl("s22").as("ds22"))
      val sse = col("dsyy") -
        lit(2.0) * (col("b0") * col("dsy") + col("b1") * col("ds1y") +
          col("b2") * col("ds2y")) +
        (col("b0") * (col("b0") * col("dn") + col("b1") * col("ds1") +
          col("b2") * col("ds2")) +
          col("b1") * (col("b0") * col("ds1") + col("b1") * col("ds11") +
            col("b2") * col("ds12")) +
          col("b2") * (col("b0") * col("ds2") + col("b1") * col("ds12") +
            col("b2") * col("ds22")))
      beta.select(col("n").as("n_rows"),
        graft.functions.DetAgg.r6(col("b0")).as("beta0"),
        graft.functions.DetAgg.r6(col("b1")).as("beta1"),
        graft.functions.DetAgg.r6(col("b2")).as("beta2"),
        graft.functions.DetAgg.r6(sse / col("n").cast("double")).as("mse"))
    },

    // EXACT Shapley attribution for the ridge model above — the feature-
    // attribution operator a model-monitoring stack runs next to drift/
    // fairness/calibration: for a linear model the Shapley value of
    // feature j on row x is φ_j(x) = β_j·(x_j − μ_j) in closed form
    // (Lundberg & Lee, NeurIPS 2017, "Linear SHAP"), so global
    // importance mean|φ_j| is computable EXACTLY — no sampling, no
    // permutations. Determinism trick: μ_j = s_j/n makes |x_j − μ_j| =
    // |n·x_j − s_j|/n, an INTEGER numerator — so the corpus-wide Σ|φ|
    // reduces to one exact BIGINT sum per feature (map-side combined,
    // order-free) and a single fixed float tree at the end; the whole
    // attribution is two scans (Gram cells, then deviations against the
    // 1-row broadcast model) with 10+2 cells of state at any corpus
    // size. Output: per-feature mean|SHAP|, the importance share, and
    // the winning feature — all bit-exact cross-engine.
    checked("ml_shap_linear", {
      def det3(m: Seq[String]) = sqlDet3(m)
      val a = Seq("(CAST(n AS DOUBLE) + 10)", "CAST(s1 AS DOUBLE)",
        "CAST(s2 AS DOUBLE)", "CAST(s1 AS DOUBLE)",
        "(CAST(s11 AS DOUBLE) + 10)", "CAST(s12 AS DOUBLE)",
        "CAST(s2 AS DOUBLE)", "CAST(s12 AS DOUBLE)",
        "(CAST(s22 AS DOUBLE) + 10)")
      val b = Seq("CAST(sy AS DOUBLE)", "CAST(s1y AS DOUBLE)",
        "CAST(s2y AS DOUBLE)")
      val dA = det3(a)
      val d1 = det3(Seq(a(0), b(0), a(2), a(3), b(1), a(5), a(6), b(2), a(8)))
      val d2 = det3(Seq(a(0), a(1), b(0), a(3), a(4), b(1), a(6), a(7), b(2)))
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS y,
         |    CAST(hour(ts) AS BIGINT) AS x1, user_id % 16 AS x2 FROM events),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
         |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
         |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x1 * y) AS BIGINT) AS s1y,
         |    CAST(sum(x2 * y) AS BIGINT) AS s2y
         |  FROM sv),
         |beta AS (SELECT n, ($d1) / ($dA) AS b1, ($d2) / ($dA) AS b2 FROM g),
         |dev AS (SELECT CAST(sum(abs(g.n * sv.x1 - g.s1)) AS BIGINT) AS a1,
         |    CAST(sum(abs(g.n * sv.x2 - g.s2)) AS BIGINT) AS a2
         |  FROM sv, g),
         |ph AS (SELECT n, b1, b2, a1, a2,
         |    abs(b1) * (CAST(a1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS p1,
         |    abs(b2) * (CAST(a2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS p2
         |  FROM beta, dev)
         |SELECT n AS n_rows, ${graft.functions.DetAgg.sqlR6("b1")} AS beta1,
         |  ${graft.functions.DetAgg.sqlR6("b2")} AS beta2,
         |  ${graft.functions.DetAgg.sqlR6("p1")} AS mean_abs_shap_hour,
         |  ${graft.functions.DetAgg.sqlR6("p2")} AS mean_abs_shap_segment,
         |  ${graft.functions.DetAgg.sqlR6("p1 / (p1 + p2)")} AS hour_share,
         |  CASE WHEN p1 >= p2 THEN 'hour' ELSE 'segment' END AS top_feature
         |FROM ph""".stripMargin
    }) { (s, d) =>
      val sv = staged(Tables.events(s, d)
        .select(mv(col("value")).as("y"), hour(col("ts")).cast("long").as("x1"),
          expr("user_id % 16").as("x2")))
      val g = sv.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("y")).as("sy"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      def dbl(c: String) = col(c).cast("double")
      val lam = lit(10.0)
      val aM = Seq(dbl("n") + lam, dbl("s1"), dbl("s2"),
        dbl("s1"), dbl("s11") + lam, dbl("s12"),
        dbl("s2"), dbl("s12"), dbl("s22") + lam)
      val bV = Seq(dbl("sy"), dbl("s1y"), dbl("s2y"))
      val dA = colDet3(aM)
      def repl(i: Int) = colDet3(aM.zipWithIndex.map { case (c, j) =>
        if (j % 3 == i) bV(j / 3) else c
      })
      val model = g.select(col("n"), col("s1"), col("s2"),
        (repl(1) / dA).as("b1"), (repl(2) / dA).as("b2"))
      // Deviation pass: exact integer numerators against the broadcast
      // 1-row model — |x_j − s_j/n| = |n·x_j − s_j| / n.
      val dev = sv.crossJoin(broadcast(model))
        .agg(sum(abs(col("n") * col("x1") - col("s1"))).as("a1"),
          sum(abs(col("n") * col("x2") - col("s2"))).as("a2"),
          first(col("n")).as("n"), first(col("b1")).as("b1"),
          first(col("b2")).as("b2"))
      val p1 = abs(col("b1")) *
        (col("a1").cast("double") / (col("n").cast("double") * col("n").cast("double")))
      val p2 = abs(col("b2")) *
        (col("a2").cast("double") / (col("n").cast("double") * col("n").cast("double")))
      import graft.functions.DetAgg.r6
      dev.select(col("n").as("n_rows"),
        r6(col("b1")).as("beta1"), r6(col("b2")).as("beta2"),
        r6(p1).as("mean_abs_shap_hour"),
        r6(p2).as("mean_abs_shap_segment"),
        r6(p1 / (p1 + p2)).as("hour_share"),
        when(p1 >= p2, "hour").otherwise("segment").as("top_feature"))
    },

    checked("ml_gbdt_stump", {
      def fitSql(src: String, yc: String, fc: String, tag: String) =
        s"""h$tag AS (SELECT $fc AS f, CAST(count(*) AS BIGINT) AS hn,
           |    CAST(sum($yc) AS BIGINT) AS hs FROM $src GROUP BY 1),
           |t$tag AS (SELECT CAST(sum(hn) AS BIGINT) AS n,
           |    CAST(sum(hs) AS BIGINT) AS s FROM h$tag),
           |p$tag AS (SELECT f AS sp, CAST(sum(hn) OVER w AS BIGINT) AS nl,
           |    CAST(sum(hs) OVER w AS BIGINT) AS sl FROM h$tag
           |  WINDOW w AS (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND CURRENT ROW)),
           |g$tag AS (SELECT sp, nl, sl, t.n - nl AS nr, t.s - sl AS sr
           |  FROM p$tag, t$tag t WHERE nl > 0 AND t.n - nl > 0),
           |m$tag AS (SELECT sp, nl, nr, sl // nl AS mul, sr // nr AS mur
           |  FROM (SELECT g.*, row_number() OVER (ORDER BY
           |      (CAST(sl AS DOUBLE) * sl / nl + CAST(sr AS DOUBLE) * sr / nr)
           |      DESC, sp) AS rk FROM g$tag g) WHERE rk = 1)""".stripMargin
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS y,
         |    CAST(hour(ts) AS BIGINT) AS f1, user_id % 16 AS f2 FROM events),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS s FROM sv),
         |m0 AS (SELECT s // n AS mug FROM tot),
         |e0 AS (SELECT CAST(sum((y - mug) * (y - mug)) AS BIGINT) AS sse0
         |  FROM sv, m0),
         |${fitSql("sv", "y", "f1", "1")},
         |r1 AS (SELECT sv.y - (CASE WHEN sv.f1 <= m1.sp THEN m1.mul
         |    ELSE m1.mur END) AS r, sv.f2 FROM sv, m1),
         |e1 AS (SELECT CAST(sum(r * r) AS BIGINT) AS sse1 FROM r1),
         |${fitSql("r1", "r", "f2", "2")},
         |r2 AS (SELECT r1.r - (CASE WHEN r1.f2 <= m2.sp THEN m2.mul
         |    ELSE m2.mur END) AS rr FROM r1, m2),
         |e2 AS (SELECT CAST(sum(rr * rr) AS BIGINT) AS sse2 FROM r2)
         |SELECT 1 AS round, 'hour' AS feature, CAST(m1.sp AS INT) AS split,
         |  m1.nl AS n_left, m1.nr AS n_right, m1.mul AS mu_left,
         |  m1.mur AS mu_right, e0.sse0 AS sse_before, e1.sse1 AS sse_after,
         |  e1.sse1 < e0.sse0 AS improved
         |FROM m1, e0, e1
         |UNION ALL
         |SELECT 2, 'useg', CAST(m2.sp AS INT), m2.nl, m2.nr, m2.mul,
         |  m2.mur, e1.sse1, e2.sse2, e2.sse2 < e1.sse1
         |FROM m2, e1, e2""".stripMargin
    }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sv = staged(Tables.events(s, d)
        .select(mv(col("value")).as("y"), hour(col("ts")).cast("long").as("f1"),
          expr("user_id % 16").as("f2")))
      def fit(src: DataFrame, yc: String, fc: String): DataFrame = {
        val h = src.groupBy(col(fc).as("f"))
          .agg(count(lit(1)).as("hn"), sum(col(yc)).as("hs"))
        val t = h.agg(sum(col("hn")).as("n"), sum(col("hs")).as("s"))
        val w = Window.orderBy("f")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val p = h.select(col("f").as("sp"), sum(col("hn")).over(w).as("nl"),
          sum(col("hs")).over(w).as("sl"))
        val g = p.crossJoin(broadcast(t))
          .withColumn("nr", col("n") - col("nl"))
          .withColumn("sr", col("s") - col("sl"))
          .filter(col("nl") > 0 && col("nr") > 0)
        val gain = col("sl").cast("double") * col("sl") / col("nl") +
          col("sr").cast("double") * col("sr") / col("nr")
        g.withColumn("rk", row_number().over(
            Window.orderBy(gain.desc, col("sp"))))
          .filter(col("rk") === 1)
          .select(col("sp"), col("nl"), col("nr"),
            expr("sl DIV nl").as("mul"), expr("sr DIV nr").as("mur"))
      }
      val tot = sv.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
      val e0 = sv.crossJoin(broadcast(tot.select(expr("s DIV n").as("mug"))))
        .agg(sum((col("y") - col("mug")) * (col("y") - col("mug")))
          .as("sse0"))
      val m1 = fit(sv, "y", "f1")
      val r1 = staged(sv.crossJoin(broadcast(m1))
        .select((col("y") - when(col("f1") <= col("sp"), col("mul"))
          .otherwise(col("mur"))).as("r"), col("f2")))
      val e1 = r1.agg(sum(col("r") * col("r")).as("sse1"))
      val m2 = fit(r1, "r", "f2")
      val e2 = r1.crossJoin(broadcast(m2))
        .select((col("r") - when(col("f2") <= col("sp"), col("mul"))
          .otherwise(col("mur"))).as("rr"))
        .agg(sum(col("rr") * col("rr")).as("sse2"))
      val row1 = m1.crossJoin(broadcast(e0)).crossJoin(broadcast(e1))
        .select(lit(1).as("round"), lit("hour").as("feature"),
          col("sp").cast("int").as("split"), col("nl").as("n_left"),
          col("nr").as("n_right"), col("mul").as("mu_left"),
          col("mur").as("mu_right"), col("sse0").as("sse_before"),
          col("sse1").as("sse_after"),
          (col("sse1") < col("sse0")).as("improved"))
      val row2 = m2.crossJoin(broadcast(e1)).crossJoin(broadcast(e2))
        .select(lit(2).as("round"), lit("useg").as("feature"),
          col("sp").cast("int").as("split"), col("nl").as("n_left"),
          col("nr").as("n_right"), col("mul").as("mu_left"),
          col("mur").as("mu_right"), col("sse1").as("sse_before"),
          col("sse2").as("sse_after"),
          (col("sse2") < col("sse1")).as("improved"))
      row1.unionAll(row2)
    },

    // Depth-2 regression TREE grown LEVEL-WISE — the shape ml_gbdt_stump
    // doesn't cover: the stump BOOSTS (sequential fits on residuals);
    // this GROWS (hierarchical splits, each depth-2 node fit on its own
    // partition of the data). The key scale pattern is the per-NODE
    // histogram: depth 2 is ONE aggregate keyed (node, feature-cell) —
    // histograms for all frontier nodes in a single corpus pass — with
    // prefix sums and argmax windows PARTITIONED BY node over the
    // bounded cell frame. That is exactly how LightGBM/XGBoost grow
    // level-wise at scale: one pass per LEVEL, never one pass per node.
    // All arithmetic exact (BIGINT moments, DIV leaf means, gain as one
    // fixed IEEE tree, ties to the smallest split); per-node SSE before/
    // after makes the improvement a measured boolean per node.
    checked("ml_tree_depth2",
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS y,
         |    CAST(hour(ts) AS BIGINT) AS f1, user_id % 16 AS f2 FROM events),
         |h1 AS (SELECT f1 AS f, CAST(count(*) AS BIGINT) AS hn,
         |    CAST(sum(y) AS BIGINT) AS hs FROM sv GROUP BY 1),
         |t1 AS (SELECT CAST(sum(hn) AS BIGINT) AS n,
         |    CAST(sum(hs) AS BIGINT) AS s FROM h1),
         |p1 AS (SELECT f AS sp, CAST(sum(hn) OVER w AS BIGINT) AS nl,
         |    CAST(sum(hs) OVER w AS BIGINT) AS sl FROM h1
         |  WINDOW w AS (ORDER BY f ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW)),
         |m1 AS (SELECT sp, nl, nr,
         |    (sl - ((sl % nl + nl) % nl)) // nl AS mul,
         |    (sr - ((sr % nr + nr) % nr)) // nr AS mur
         |  FROM (SELECT p1.sp, p1.nl, p1.sl, t.n - p1.nl AS nr,
         |      t.s - p1.sl AS sr,
         |      row_number() OVER (ORDER BY
         |        (CAST(sl AS DOUBLE) * sl / nl +
         |         CAST(t.s - sl AS DOUBLE) * (t.s - sl) / (t.n - nl)) DESC,
         |        sp) AS rk
         |    FROM p1, t1 t WHERE nl > 0 AND t.n - nl > 0) WHERE rk = 1),
         |asg AS (SELECT sv.y, sv.f2,
         |    CASE WHEN sv.f1 <= m1.sp THEN 0 ELSE 1 END AS node,
         |    CASE WHEN sv.f1 <= m1.sp THEN m1.mul ELSE m1.mur END AS mu1
         |  FROM sv, m1),
         |h2 AS (SELECT node, f2 AS f, CAST(count(*) AS BIGINT) AS hn,
         |    CAST(sum(y) AS BIGINT) AS hs FROM asg GROUP BY 1, 2),
         |t2 AS (SELECT node, CAST(sum(hn) AS BIGINT) AS n,
         |    CAST(sum(hs) AS BIGINT) AS s FROM h2 GROUP BY node),
         |p2 AS (SELECT node, f AS sp, CAST(sum(hn) OVER w AS BIGINT) AS nl,
         |    CAST(sum(hs) OVER w AS BIGINT) AS sl FROM h2
         |  WINDOW w AS (PARTITION BY node ORDER BY f
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |m2 AS (SELECT node, sp, nl, nr,
         |    (sl - ((sl % nl + nl) % nl)) // nl AS mul,
         |    (sr - ((sr % nr + nr) % nr)) // nr AS mur
         |  FROM (SELECT p2.node, p2.sp, p2.nl, p2.sl, t.n - p2.nl AS nr,
         |      t.s - p2.sl AS sr,
         |      row_number() OVER (PARTITION BY p2.node ORDER BY
         |        (CAST(sl AS DOUBLE) * sl / nl +
         |         CAST(t.s - sl AS DOUBLE) * (t.s - sl) / (t.n - nl)) DESC,
         |        sp) AS rk
         |    FROM p2 JOIN t2 t ON p2.node = t.node
         |    WHERE nl > 0 AND t.n - nl > 0) WHERE rk = 1),
         |sse1 AS (SELECT node,
         |    CAST(sum((y - mu1) * (y - mu1)) AS BIGINT) AS s1 FROM asg
         |  GROUP BY node),
         |sse2 AS (SELECT asg.node,
         |    CAST(sum((y - (CASE WHEN asg.f2 <= m2.sp THEN m2.mul
         |      ELSE m2.mur END)) *
         |      (y - (CASE WHEN asg.f2 <= m2.sp THEN m2.mul
         |      ELSE m2.mur END))) AS BIGINT) AS s2
         |  FROM asg JOIN m2 ON asg.node = m2.node GROUP BY 1)
         |SELECT CAST(m2.node AS INT) AS node,
         |  CAST(m1.sp AS INT) AS parent_split,
         |  CAST(m2.sp AS INT) AS split, m2.nl AS n_left, m2.nr AS n_right,
         |  m2.mul AS mu_left, m2.mur AS mu_right,
         |  sse1.s1 AS sse_before, sse2.s2 AS sse_after,
         |  sse2.s2 < sse1.s1 AS improved
         |FROM m2 CROSS JOIN m1
         |JOIN sse1 ON m2.node = sse1.node
         |JOIN sse2 ON m2.node = sse2.node""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sv = staged(Tables.events(s, d)
        .select(mv(col("value")).as("y"), hour(col("ts")).cast("long").as("f1"),
          expr("user_id % 16").as("f2")))
      val gain = col("sl").cast("double") * col("sl") / col("nl") +
        col("sr").cast("double") * col("sr") / col("nr")
      // Root split (depth 1): the stump fit over the f1 histogram.
      val h1 = sv.groupBy(col("f1").as("f"))
        .agg(count(lit(1)).as("hn"), sum(col("y")).as("hs"))
      val t1 = h1.agg(sum(col("hn")).as("n"), sum(col("hs")).as("s"))
      val w1 = Window.orderBy("f")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m1 = h1.select(col("f").as("sp"), sum(col("hn")).over(w1).as("nl"),
          sum(col("hs")).over(w1).as("sl"))
        .crossJoin(broadcast(t1))
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("sr", col("s") - col("sl"))
        .filter(col("nl") > 0 && col("nr") > 0)
        .withColumn("rk", row_number().over(Window.orderBy(gain.desc, col("sp"))))
        .filter(col("rk") === 1)
        .select(col("sp"), floorDivExact("sl", "nl").as("mul"),
          floorDivExact("sr", "nr").as("mur"))
      // Level 2: ONE aggregate keyed (node, cell) for the whole
      // frontier, then per-node prefix/argmax windows over the bounded
      // cell frame.
      val asg = staged(sv.crossJoin(broadcast(m1))
        .select(col("y"), col("f2"),
          when(col("f1") <= col("sp"), 0L).otherwise(1L).as("node"),
          when(col("f1") <= col("sp"), col("mul")).otherwise(col("mur"))
            .as("mu1")))
      val h2 = asg.groupBy(col("node"), col("f2").as("f"))
        .agg(count(lit(1)).as("hn"), sum(col("y")).as("hs"))
      val t2 = h2.groupBy(col("node").as("tn"))
        .agg(sum(col("hn")).as("n"), sum(col("hs")).as("s"))
      val w2 = Window.partitionBy("node").orderBy("f")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m2 = h2.select(col("node"), col("f").as("sp"),
          sum(col("hn")).over(w2).as("nl"), sum(col("hs")).over(w2).as("sl"))
        .join(broadcast(t2), col("node") === col("tn"))
        .withColumn("nr", col("n") - col("nl"))
        .withColumn("sr", col("s") - col("sl"))
        .filter(col("nl") > 0 && col("nr") > 0)
        .withColumn("rk", row_number().over(
          Window.partitionBy("node").orderBy(gain.desc, col("sp"))))
        .filter(col("rk") === 1)
        .select(col("node"), col("sp"), col("nl"), col("nr"),
          floorDivExact("sl", "nl").as("mul"),
          floorDivExact("sr", "nr").as("mur"))
      val sse1 = asg.groupBy(col("node").as("n1"))
        .agg(sum((col("y") - col("mu1")) * (col("y") - col("mu1"))).as("s1"))
      val leaf = when(col("f2") <= col("sp"), col("mul")).otherwise(col("mur"))
      val sse2 = asg.join(broadcast(m2), "node")
        .groupBy(col("node").as("n2"))
        .agg(sum((col("y") - leaf) * (col("y") - leaf)).as("s2"))
      m2.crossJoin(broadcast(m1.select(col("sp").as("psp"))))
        .join(broadcast(sse1), col("node") === col("n1"))
        .join(broadcast(sse2), col("node") === col("n2"))
        .select(col("node").cast("int").as("node"),
          col("psp").cast("int").as("parent_split"),
          col("sp").cast("int").as("split"),
          col("nl").as("n_left"), col("nr").as("n_right"),
          col("mul").as("mu_left"), col("mur").as("mu_right"),
          col("s1").as("sse_before"), col("s2").as("sse_after"),
          (col("s2") < col("s1")).as("improved"))
    },

    // Approximate query processing — the sample-and-extrapolate regime
    // (BlinkDB/quickr shape): a 5 % deterministic hash sample answers
    // the per-type mean/sum with a CLT confidence interval, and the
    // query ALSO computes the exact answer so the declared surface
    // carries the measured |error| ≤ CI boolean per group — the AQP
    // contract itself, hash-pinned. Membership is h60(event_id) % 100
    // < 5 (reproducible, partition-independent), moments are exact
    // BIGINTs from ONE map-side-combined pass (sample moments as
    // conditional sums riding the same aggregate as the exact ones),
    // and every derived float (mean, se, CI) is one fixed IEEE tree
    // r6-quantized. At 100 TB the point of AQP is to SCAN ONLY the
    // sample: the membership predicate pushes to the scan (or the
    // sample is a persisted 5 % table) and the exact pass is dropped —
    // here both run so the error contract is measurable.
    checked("aqp_sample_estimate", {
      val inS = s"${graft.functions.TextFns.sqlH60("CAST(event_id AS VARCHAR)")} % 100 < 5"
      s"""WITH v AS (SELECT event_type,
         |    CAST(floor(value * 1000) AS BIGINT) AS y, $inS AS s
         |  FROM events),
         |g AS (SELECT event_type,
         |    CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(count(*) FILTER (WHERE s) AS BIGINT) AS ns,
         |    CAST(COALESCE(sum(y) FILTER (WHERE s), 0) AS BIGINT) AS ss,
         |    CAST(COALESCE(sum(y * y) FILTER (WHERE s), 0) AS BIGINT) AS qs
         |  FROM v GROUP BY event_type)
         |SELECT event_type, n AS n_exact, ns AS n_sample,
         |  ns * 20 AS n_est, ss * 20 AS sum_est, sy AS sum_exact,
         |  CASE WHEN ns <= 1 THEN NULL ELSE ${graft.functions.DetAgg.sqlR6(
             "CAST(ss AS DOUBLE) / ns")} END AS mean_est,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(sy AS DOUBLE) / n")} AS mean_exact,
         |  CASE WHEN ns <= 1 THEN NULL ELSE ${graft.functions.DetAgg.sqlR6(
             "2 * sqrt((CAST(qs AS DOUBLE) - CAST(ss AS DOUBLE) * ss / ns)" +
               " / (ns - 1) / ns)")} END AS ci_half,
         |  CASE WHEN ns <= 1 THEN NULL ELSE
         |    ${graft.functions.DetAgg.sqlR6(
               "abs(CAST(sy AS DOUBLE) / n - CAST(ss AS DOUBLE) / ns)")} <=
         |    ${graft.functions.DetAgg.sqlR6(
               "2 * sqrt((CAST(qs AS DOUBLE) - CAST(ss AS DOUBLE) * ss / ns)" +
                 " / (ns - 1) / ns)")} END AS within_ci
         |FROM g""".stripMargin
    }) { (s, d) =>
      val inS = graft.functions.TextFns.h60(col("event_id").cast("string")) % 100 < 5
      val g = Tables.events(s, d)
        .select(col("event_type"), mv(col("value")).as("y"), inS.as("s"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(when(col("s"), 1L).otherwise(0L)).as("ns"),
          coalesce(sum(when(col("s"), col("y"))), lit(0L)).as("ss"),
          coalesce(sum(when(col("s"), col("y") * col("y"))), lit(0L))
            .as("qs"))
      val se2 = lit(2) * sqrt((col("qs").cast("double") -
        col("ss").cast("double") * col("ss") / col("ns")) /
        (col("ns") - 1) / col("ns"))
      val err = abs(col("sy").cast("double") / col("n") -
        col("ss").cast("double") / col("ns"))
      // mirrored small-sample guard (the WoE lesson): a stratum with
      // ns <= 1 has no variance estimate — NULL, not NaN, both engines.
      // within_ci compares the r6-QUANTIZED err/bound (ADVICE r9): the
      // boolean inherits the declared floats' quantization margin, so a
      // stratum landing within 1 ulp of the CI bound can't flip it on
      // cross-engine drift.
      val ok = col("ns") > 1
      g.select(col("event_type"), col("n").as("n_exact"),
        col("ns").as("n_sample"), (col("ns") * 20).as("n_est"),
        (col("ss") * 20).as("sum_est"), col("sy").as("sum_exact"),
        when(ok, graft.functions.DetAgg.r6(
          col("ss").cast("double") / col("ns"))).as("mean_est"),
        graft.functions.DetAgg.r6(col("sy").cast("double") / col("n"))
          .as("mean_exact"),
        when(ok, graft.functions.DetAgg.r6(se2)).as("ci_half"),
        when(ok, graft.functions.DetAgg.r6(err) <=
          graft.functions.DetAgg.r6(se2)).as("within_ci"))
    },

    // Welch's two-sample t-test (unequal variances) between the
    // reference and current windows — the experimentation companion of
    // stats_chi2 (means instead of proportions): every moment (n, Σv,
    // Σv²) is an exact BIGINT from ONE map-side-combined aggregate, and
    // t = (x̄₁−x̄₂)/√(s₁²/n₁+s₂²/n₂) plus the Welch-Satterthwaite df are
    // one fixed IEEE tree over those integers — identical cross-engine —
    // r6-rounded at the end. (No p-value: that needs an incomplete-beta
    // libm call with no cross-engine contract; monitoring thresholds on
    // |t| directly, which is what the statistic is for.)
    checked("ml_ab_ttest", {
      def sqlVar(n: String, sx: String, q: String) =
        s"(CAST($q AS DOUBLE) - CAST($sx AS DOUBLE) * $sx / $n) / ($n - 1)"
      val v1 = sqlVar("n1", "s1", "q1")
      val v2 = sqlVar("n2", "s2", "q2")
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
         |    ts < TIMESTAMP '${AnalyticsQueries.IvmSplit}' AS ref FROM events),
         |m AS (SELECT
         |    CAST(count(*) FILTER (WHERE ref) AS BIGINT) AS n1,
         |    CAST(sum(v) FILTER (WHERE ref) AS BIGINT) AS s1,
         |    CAST(sum(v * v) FILTER (WHERE ref) AS BIGINT) AS q1,
         |    CAST(count(*) FILTER (WHERE NOT ref) AS BIGINT) AS n2,
         |    CAST(sum(v) FILTER (WHERE NOT ref) AS BIGINT) AS s2,
         |    CAST(sum(v * v) FILTER (WHERE NOT ref) AS BIGINT) AS q2
         |  FROM sv)
         |SELECT n1, n2,
         |  ${graft.functions.DetAgg.sqlR6(
            s"(CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / " +
              s"sqrt(($v1) / n1 + ($v2) / n2)")} AS t_stat,
         |  ${graft.functions.DetAgg.sqlR6(
            s"(($v1) / n1 + ($v2) / n2) * (($v1) / n1 + ($v2) / n2) / " +
              s"((($v1) / n1) * (($v1) / n1) / (n1 - 1) + " +
              s"(($v2) / n2) * (($v2) / n2) / (n2 - 1))")} AS welch_df
         |FROM m""".stripMargin
    }) { (s, d) =>
      val split = lit(AnalyticsQueries.IvmSplit).cast("timestamp")
      val m = Tables.events(s, d)
        .select(mv(col("value")).as("v"), (col("ts") < split).as("ref"))
        .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("ref"), col("v")).otherwise(0L)).as("s1"),
          sum(when(col("ref"), col("v") * col("v")).otherwise(0L)).as("q1"),
          sum(when(!col("ref"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("ref"), col("v")).otherwise(0L)).as("s2"),
          sum(when(!col("ref"), col("v") * col("v")).otherwise(0L)).as("q2"))
      def vr(n: String, sx: String, q: String) =
        (col(q).cast("double") - col(sx).cast("double") * col(sx) / col(n)) /
          (col(n) - 1)
      val se1 = vr("n1", "s1", "q1") / col("n1")
      val se2 = vr("n2", "s2", "q2") / col("n2")
      m.select(col("n1"), col("n2"),
        graft.functions.DetAgg.r6(
          (col("s1").cast("double") / col("n1") -
            col("s2").cast("double") / col("n2")) / sqrt(se1 + se2))
          .as("t_stat"),
        graft.functions.DetAgg.r6(
          (se1 + se2) * (se1 + se2) /
            (se1 * se1 / (col("n1") - 1) + se2 * se2 / (col("n2") - 1)))
          .as("welch_df"))
    },

    // Kaplan-Meier survival estimator over inter-event waiting times —
    // the time-to-event regime (here: "how long until this user acts
    // again", the churn-risk primitive): each event's waiting time to
    // the user's next event is an observed "death" at that hour; a
    // user's LAST event is right-censored at the corpus horizon (the
    // standard KM treatment of still-open observations). The estimator
    // runs over the waiting-time HISTOGRAM (≤ ~700 hour cells, the
    // ml_auc/ml_ks_test shape): at-risk counts from one cumulative
    // window, each factor ln(1 − d/n) quantized to the 1e-4 grid before
    // the cumulative sum (the text_lm_score argument — libm's 1-ulp
    // divergence sits far below the grid), so the log-survival curve is
    // an exact-integer prefix sum; S(t) = 0 (n = d at the last cell)
    // carries a documented −9900 sentinel instead of ln 0.
    checked("ml_survival_km",
      """WITH seq AS (SELECT user_id, ts, event_id,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS nxt FROM events),
        |mx AS (SELECT max(ts) AS horizon FROM events),
        |obs AS (SELECT
        |    CASE WHEN nxt IS NULL
        |      THEN (epoch_us(horizon) - epoch_us(ts)) // 3600000000
        |      ELSE (epoch_us(nxt) - epoch_us(ts)) // 3600000000 END AS t_h,
        |    nxt IS NULL AS censored
        |  FROM seq, mx),
        |g AS (SELECT t_h,
        |    CAST(count(*) FILTER (WHERE NOT censored) AS BIGINT) AS d,
        |    CAST(count(*) FILTER (WHERE censored) AS BIGINT) AS c
        |  FROM obs GROUP BY t_h),
        |r AS (SELECT t_h, d, c,
        |    CAST((SELECT sum(d + c) FROM g) -
        |      COALESCE(sum(d + c) OVER (ORDER BY t_h
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM g),
        |q AS (SELECT t_h, d, c, n_risk,
        |    CASE WHEN d = 0 THEN 0
        |         WHEN n_risk > d THEN CAST(floor(ln(
        |           CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |           * 1e4 + 0.5) AS BIGINT)
        |         ELSE -99000000 END AS lnq
        |  FROM r)
        |SELECT t_h, n_risk, d, c,
        |  CAST(sum(lnq) OVER (ORDER BY t_h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1e4 AS log_surv
        |FROM q""".stripMargin) { (s, d) =>
      val seq = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
        .withColumn("nxt", lead(col("ts"), 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
      val horizon = Tables.events(s, d).agg(max(col("ts")).as("horizon"))
      val obs = seq.crossJoin(broadcast(horizon))
        .select(
          when(col("nxt").isNull,
            expr("(unix_micros(horizon) - unix_micros(ts)) DIV 3600000000"))
            .otherwise(
              expr("(unix_micros(nxt) - unix_micros(ts)) DIV 3600000000"))
            .as("t_h"),
          col("nxt").isNull.as("censored"))
      val g = staged(obs.groupBy("t_h")
        .agg(sum(when(!col("censored"), 1L).otherwise(0L)).as("d"),
          sum(when(col("censored"), 1L).otherwise(0L)).as("c")))
      val total = g.agg(sum(col("d") + col("c")).as("tot"))
      val wPrev = Window.orderBy("t_h")
        .rowsBetween(Window.unboundedPreceding, -1)
      val r = g.crossJoin(broadcast(total))
        .withColumn("n_risk",
          col("tot") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
      val q = r.withColumn("lnq",
        when(col("d") === 0, lit(0L))
          .when(col("n_risk") > col("d"),
            floor(log((col("n_risk") - col("d")).cast("double") /
              col("n_risk").cast("double")) * 1e4 + 0.5).cast("long"))
          .otherwise(lit(-99000000L)))
      val wCum = Window.orderBy("t_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      q.select(col("t_h"), col("n_risk"), col("d"), col("c"),
        (sum(col("lnq")).over(wCum).cast("double") / 1e4).as("log_surv"))
    },

    // Two-sample Kolmogorov-Smirnov statistic — the drift test a model-
    // monitoring pipeline runs between a reference window and current
    // traffic (split at the IVM date). Exactly integral: per distinct
    // millivalue, running counts (r1, r2) accumulate over the VALUE
    // HISTOGRAM (bounded by grid cardinality, never the corpus — the
    // ml_auc shape), and D = max |F1 − F2| is max |r1·n2 − r2·n1| over
    // exact BIGINTs with ONE shared IEEE division at the end. A float
    // CDF comparison could disagree at 1 ulp and move the argmax; the
    // cross-multiplied form cannot.
    checked("ml_ks_test",
      s"""WITH sv AS (SELECT CAST(floor(value * 1000) AS BIGINT) AS v,
         |    ts < TIMESTAMP '${AnalyticsQueries.IvmSplit}' AS ref FROM events),
         |g AS (SELECT v, CAST(count(*) FILTER (WHERE ref) AS BIGINT) AS c1,
         |    CAST(count(*) FILTER (WHERE NOT ref) AS BIGINT) AS c2
         |  FROM sv GROUP BY v),
         |c AS (SELECT CAST(sum(c1) OVER w AS BIGINT) AS r1,
         |    CAST(sum(c2) OVER w AS BIGINT) AS r2 FROM g
         |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
         |    AND CURRENT ROW)),
         |t AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
         |    CAST(sum(c2) AS BIGINT) AS n2 FROM g)
         |SELECT n1 AS n_ref, n2 AS n_cur,
         |  CAST(max(abs(r1 * n2 - r2 * n1)) AS BIGINT) AS d_num,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(max(abs(r1 * n2 - r2 * n1)) AS DOUBLE) / CAST(n1 * n2 AS DOUBLE)")}
         |    AS ks_d
         |FROM c, t GROUP BY n1, n2""".stripMargin) { (s, d) =>
      val split = lit(AnalyticsQueries.IvmSplit).cast("timestamp")
      val g = staged(Tables.events(s, d)
        .select(mv(col("value")).as("v"), (col("ts") < split).as("ref"))
        .groupBy("v")
        .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("c1"),
          sum(when(!col("ref"), 1L).otherwise(0L)).as("c2")))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = g.select(sum(col("c1")).over(w).as("r1"),
        sum(col("c2")).over(w).as("r2"))
      val t = g.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      c.crossJoin(broadcast(t)).groupBy("n1", "n2")
        .agg(max(abs(col("r1") * col("n2") - col("r2") * col("n1")))
          .as("d_num"))
        .select(col("n1").as("n_ref"), col("n2").as("n_cur"), col("d_num"),
          graft.functions.DetAgg.r6(col("d_num").cast("double") /
            (col("n1") * col("n2")).cast("double")).as("ks_d"))
    },

    // Population Stability Index over fixed equal-width value bins — the
    // companion drift score (monitoring dashboards report PSI per
    // feature nightly). Ten literal bins over the value grid make the
    // assignment a zero-shuffle projection (no data-derived boundaries
    // to fit); each bin's (p−q)·ln(p/q) term is one fixed IEEE tree
    // over exact counts, quantized to a 1e-6 grid per BIN before the
    // 10-term sum — accumulation order can never leak. Scale: one
    // map-side-combined aggregate to 10×2 cells.
    checked("ml_psi",
      s"""WITH sv AS (SELECT
         |    least(CAST(floor(value * 1000) AS BIGINT) // 11200, 9) AS bin,
         |    ts < TIMESTAMP '${AnalyticsQueries.IvmSplit}' AS ref FROM events),
         |g AS (SELECT bin, CAST(count(*) FILTER (WHERE ref) AS BIGINT) AS p,
         |    CAST(count(*) FILTER (WHERE NOT ref) AS BIGINT) AS q
         |  FROM sv GROUP BY bin),
         |t AS (SELECT CAST(sum(p) AS BIGINT) AS n1,
         |    CAST(sum(q) AS BIGINT) AS n2 FROM g),
         |c AS (SELECT bin,
         |    CAST(floor((CAST(p AS DOUBLE) / n1 - CAST(q AS DOUBLE) / n2) *
         |      ln((CAST(p AS DOUBLE) * n2) / (CAST(q AS DOUBLE) * n1)) * 1e6
         |      + 0.5) AS BIGINT) AS contrib
         |  FROM g, t)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(sum(contrib) AS DOUBLE) / 1e6 AS psi
         |FROM c""".stripMargin) { (s, d) =>
      val split = lit(AnalyticsQueries.IvmSplit).cast("timestamp")
      val g = Tables.events(s, d)
        .select(least(expr("CAST(floor(value * 1000) AS BIGINT) DIV 11200"),
          lit(9L)).as("bin"), (col("ts") < split).as("ref"))
        .groupBy("bin")
        .agg(sum(when(col("ref"), 1L).otherwise(0L)).as("p"),
          sum(when(!col("ref"), 1L).otherwise(0L)).as("q"))
      val t = g.agg(sum(col("p")).as("n1"), sum(col("q")).as("n2"))
      val c = g.crossJoin(broadcast(t)).select(
        floor((col("p").cast("double") / col("n1") -
          col("q").cast("double") / col("n2")) *
          log((col("p").cast("double") * col("n2")) /
            (col("q").cast("double") * col("n1"))) * 1e6 + 0.5)
          .cast("long").as("contrib"))
      c.agg(count(lit(1)).as("n_bins"),
        (sum(col("contrib")).cast("double") / 1e6).as("psi"))
    },

    // Cumulative gains / lift table — the business-facing companion of
    // ml_auc: the scored population (same exact-integer dot-product
    // scores) is cut into 10 equal tiles by descending score (ntile
    // over a TOTAL order — vec_id breaks score ties, so tile membership
    // is deterministic), and each decile reports its response rate and
    // cumulative lift vs the base rate as exact-integer rationals with
    // one shared IEEE division each. The window runs over the scored
    // frame (the eval set, not the corpus); at training scale the same
    // cut comes from the percentile_groups rank machinery.
    checked("ml_lift_curve", {
      import graft.functions.TextFns.sqlScaledVec
      s"""WITH sv0 AS (SELECT vec_id, label, ${sqlScaledVec("embedding")} AS v
         |  FROM embeddings),
         |sv AS (SELECT vec_id, label >= 5 AS pos,
         |    list_aggregate(list_transform(range(1, 65),
         |      i -> v[i] * (CASE WHEN i % 2 = 1 THEN 1 ELSE -1 END)), 'sum')
         |      AS score
         |  FROM sv0),
         |tiles AS (SELECT pos,
         |    ntile(10) OVER (ORDER BY score DESC, vec_id) AS tile FROM sv),
         |g AS (SELECT tile, CAST(count(*) AS BIGINT) AS n,
         |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS np
         |  FROM tiles GROUP BY tile),
         |c AS (SELECT tile, n, np,
         |    CAST(sum(n) OVER w AS BIGINT) AS cn,
         |    CAST(sum(np) OVER w AS BIGINT) AS cnp
         |  FROM g WINDOW w AS (ORDER BY tile ROWS BETWEEN UNBOUNDED
         |    PRECEDING AND CURRENT ROW)),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
         |    CAST(sum(np) AS BIGINT) AS tnp FROM g)
         |SELECT tile, n, np,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(np AS DOUBLE) / CAST(n AS DOUBLE)")} AS response_rate,
         |  ${graft.functions.DetAgg.sqlR6(
             "CAST(cnp * tn AS DOUBLE) / CAST(cn * tnp AS DOUBLE)")}
         |    AS cum_lift
         |FROM c, t""".stripMargin
    }) { (s, d) =>
      import graft.functions.TextFns.scaledVec
      val weights = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1L else -1L))
      val tiles = Tables.embeddings(s, d)
        .select(col("vec_id"), (col("label") >= 5).as("pos"),
          graft.functions.expr.DotLong(scaledVec(col("embedding")), weights)
            .as("score"))
        .withColumn("tile",
          ntile(10).over(Window.orderBy(col("score").desc, col("vec_id"))))
      val g = staged(tiles.groupBy("tile")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("np")))
      val w = Window.orderBy("tile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val c = g.select(col("tile"), col("n"), col("np"),
        sum(col("n")).over(w).as("cn"), sum(col("np")).over(w).as("cnp"))
      val t = g.agg(sum(col("n")).as("tn"), sum(col("np")).as("tnp"))
      c.crossJoin(broadcast(t))
        .select(col("tile"), col("n"), col("np"),
          graft.functions.DetAgg.r6(col("np").cast("double") /
            col("n").cast("double")).as("response_rate"),
          graft.functions.DetAgg.r6((col("cnp") * col("tn")).cast("double") /
            (col("cn") * col("tnp")).cast("double")).as("cum_lift"))
    },

    // Gini coefficient per slice — the inequality summary (how
    // concentrated is the value mass) by the exact rank identity
    // G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted values:
    // every term is an exact BIGINT (peak Σ i·v ≈ 2e14 at sf0.1, 2^63
    // headroom to ~10⁸ rows/slice on this grid), ties are immaterial
    // (equal values contribute the same total regardless of rank
    // order), and the single division is the shared IEEE step. One
    // window pass in the slice partitioning + one aggregate — the
    // percentile_groups shuffle shape.
    checked("stats_gini",
      """WITH sv AS (SELECT event_type AS slice,
        |    CAST(floor(value * 1000) AS BIGINT) AS v FROM events),
        |r AS (SELECT slice, v,
        |    row_number() OVER (PARTITION BY slice ORDER BY v) AS i
        |  FROM sv),
        |m AS (SELECT slice, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(i * v) AS BIGINT) AS iv
        |  FROM r GROUP BY slice)
        |SELECT slice, n,
        |  CAST(floor((CAST(2 * iv - (n + 1) * s AS DOUBLE) /
        |    CAST(n * s AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS DOUBLE) AS gini
        |FROM m""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("slice").orderBy("v")
      val m = Tables.events(s, d)
        .select(col("event_type").as("slice"), mv(col("value")).as("v"))
        .withColumn("i", row_number().over(w))
        .groupBy("slice")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("i") * col("v")).as("iv"))
      m.select(col("slice"), col("n"),
        (floor(((lit(2) * col("iv") - (col("n") + 1) * col("s"))
          .cast("double") / (col("n") * col("s")).cast("double")) * 1e6
          + 0.5) / 1e6).as("gini"))
    },

    // Benford first-digit audit — the fraud/data-quality screen an
    // auditor runs over any measured quantity: the leading-digit
    // distribution of the integer value against Benford's law, with
    // the expected rates log₁₀(1+1/d) PRE-QUANTIZED LITERALS computed
    // once at plan build and injected into both engines (the ml_ndcg
    // pattern — zero runtime logs), the observed rates exact-integer
    // ratios, and the mean absolute deviation assembled from per-digit
    // quantized terms so the verdict number is accumulation-order-free.
    // Leading digit via the decimal string of an exact BIGINT —
    // engine-identical by construction.
    checked("stats_benford", {
      val exp = (1 to 9).map(dd =>
        math.round(math.log10(1.0 + 1.0 / dd) * 1e6))
      val expCase = (1 to 9).map(dd => s"WHEN $dd THEN ${exp(dd - 1)}")
        .mkString("CASE digit ", " ", " END")
      s"""WITH v AS (SELECT CAST(floor(value) AS BIGINT) AS v FROM events
         |  WHERE value >= 1),
         |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS INT)
         |    AS digit FROM v),
         |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d
         |  GROUP BY digit),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM g),
         |m AS (SELECT digit, n, tot, $expCase AS exp_q,
         |    CAST(floor(CAST(n AS DOUBLE) / tot * 1e6 + 0.5) AS BIGINT)
         |      AS obs_q
         |  FROM g, t),
         |mad AS (SELECT CAST(sum(abs(obs_q - exp_q)) AS BIGINT) AS madq
         |  FROM m)
         |SELECT digit, n,
         |  CAST(obs_q AS DOUBLE) / 1e6 AS obs_rate,
         |  CAST(exp_q AS DOUBLE) / 1e6 AS benford_rate,
         |  CAST((SELECT madq FROM mad) AS DOUBLE) / 9e6 AS mad_total
         |FROM m""".stripMargin
    }) { (s, d) =>
      val exp = (1 to 9).map(dd =>
        math.round(math.log10(1.0 + 1.0 / dd) * 1e6))
      val expCol = (1 to 9).foldLeft(lit(0L)) { (acc, dd) =>
        when(col("digit") === dd, lit(exp(dd - 1))).otherwise(acc)
      }
      val g = Tables.events(s, d)
        .filter(col("value") >= 1)
        .select(substring(floor(col("value")).cast("long").cast("string"),
          1, 1).cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val t = g.agg(sum(col("n")).as("tot"))
      val m = staged(g.crossJoin(broadcast(t))
        .withColumn("exp_q", expCol)
        .withColumn("obs_q",
          floor(col("n").cast("double") / col("tot") * 1e6 + 0.5)
            .cast("long")))
      val mad = m.agg(sum(abs(col("obs_q") - col("exp_q"))).as("madq"))
      m.crossJoin(broadcast(mad))
        .select(col("digit"), col("n"),
          (col("obs_q").cast("double") / 1e6).as("obs_rate"),
          (col("exp_q").cast("double") / 1e6).as("benford_rate"),
          (col("madq").cast("double") / 9e6).as("mad_total"))
    },

    // Weight-of-Evidence encoding + Information Value — the
    // credit-scoring/feature-screening standard that PSI's machinery
    // doesn't cover (PSI compares two time windows; WoE/IV measure how
    // well a binned feature separates a binary target): target =
    // purchase events, bins = the PSI value grid. WoE_b =
    // ln((pos_b/POS)/(neg_b/NEG)) and the IV contribution
    // (pos_b/POS − neg_b/NEG)·WoE_b are each one fixed IEEE tree over
    // exact BIGINTs, quantized per bin (1e-6 / 1e-8) before any sum.
    // One map-side-combined aggregate to 10 cells; every bin holds both
    // classes at every shipped SF. A mirrored CASE guard (ADVICE r8)
    // NULLs the WoE/IV contribution of a one-class bin (p=0 or q=0 —
    // ln(0) would otherwise emit -Inf and overflow the floor), so the
    // query stays total over arbitrary data while shipping bit-identical
    // values wherever both classes appear; a NULL ivq is skipped by
    // sum() identically on both engines.
    checked("ml_woe_encode",
      """WITH sv AS (SELECT
        |    least(CAST(floor(value * 1000) AS BIGINT) // 11200, 9) AS bin,
        |    event_type = 'purchase' AS pos FROM events),
        |g AS (SELECT bin,
        |    CAST(count(*) FILTER (WHERE pos) AS BIGINT) AS p,
        |    CAST(count(*) FILTER (WHERE NOT pos) AS BIGINT) AS q
        |  FROM sv GROUP BY bin),
        |t AS (SELECT CAST(sum(p) AS BIGINT) AS tp,
        |    CAST(sum(q) AS BIGINT) AS tq FROM g),
        |w AS (SELECT bin, p, q,
        |    CASE WHEN p = 0 OR q = 0 THEN NULL ELSE
        |      CAST(floor(ln((CAST(p AS DOUBLE) * tq) /
        |        (CAST(q AS DOUBLE) * tp)) * 1e6 + 0.5) AS BIGINT) END AS woe_q,
        |    CASE WHEN p = 0 OR q = 0 THEN NULL ELSE
        |      CAST(floor((CAST(p AS DOUBLE) / tp - CAST(q AS DOUBLE) / tq) *
        |        ln((CAST(p AS DOUBLE) * tq) / (CAST(q AS DOUBLE) * tp)) * 1e8
        |        + 0.5) AS BIGINT) END AS ivq
        |  FROM g, t)
        |SELECT bin, p AS n_pos, q AS n_neg,
        |  CAST(woe_q AS DOUBLE) / 1e6 AS woe,
        |  CAST((SELECT sum(ivq) FROM w) AS DOUBLE) / 1e8 AS iv_total
        |FROM w""".stripMargin) { (s, d) =>
      val g = staged(Tables.events(s, d)
        .select(least(expr("CAST(floor(value * 1000) AS BIGINT) DIV 11200"),
          lit(9L)).as("bin"), (col("event_type") === "purchase").as("pos"))
        .groupBy("bin")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("p"),
          sum(when(!col("pos"), 1L).otherwise(0L)).as("q")))
      val t = g.agg(sum(col("p")).as("tp"), sum(col("q")).as("tq"))
      val bothClasses = col("p") > 0 && col("q") > 0
      val lnOdds = log((col("p").cast("double") * col("tq")) /
        (col("q").cast("double") * col("tp")))
      val w = staged(g.crossJoin(broadcast(t))
        .withColumn("woe_q",
          when(bothClasses, floor(lnOdds * 1e6 + 0.5).cast("long")))
        .withColumn("ivq",
          when(bothClasses,
            floor((col("p").cast("double") / col("tp") -
              col("q").cast("double") / col("tq")) * lnOdds * 1e8 + 0.5)
              .cast("long"))))
      val iv = w.agg(sum(col("ivq")).as("ivt"))
      w.crossJoin(broadcast(iv))
        .select(col("bin"), col("p").as("n_pos"), col("q").as("n_neg"),
          (col("woe_q").cast("double") / 1e6).as("woe"),
          (col("ivt").cast("double") / 1e8).as("iv_total"))
    },

    // Mutual information + marginal entropies over the same contingency
    // table as stats_chi2 — the information-theoretic dependence
    // measure feature selection actually ranks by (chi² is the
    // significance view; MI is the effect-size view): every cell's
    // (n_ij/N)·ln(n_ij·N/(R_i·C_j)) term is one fixed IEEE tree over
    // exact BIGINT counts, quantized to 1e-8 per cell before the sum
    // (MI here is tiny — the synthetic table is near-independent — so
    // the grid sits two orders below the 1e-6 display grid). Marginal
    // entropies ride the same quantize-then-sum treatment over their
    // 5- and 4-cell frames.
    checked("stats_mutual_info",
      """WITH cell AS (SELECT event_type AS et, user_id % 4 AS seg,
        |    CAST(count(*) AS BIGINT) AS o FROM events GROUP BY 1, 2),
        |t AS (SELECT et, seg, o,
        |    sum(o) OVER (PARTITION BY et) AS r,
        |    sum(o) OVER (PARTITION BY seg) AS c,
        |    sum(o) OVER () AS n FROM cell),
        |mi AS (SELECT CAST(sum(CAST(floor(
        |    CAST(o AS DOUBLE) / n *
        |    ln(CAST(o AS DOUBLE) * n / (CAST(r AS DOUBLE) * c)) * 1e8
        |    + 0.5) AS BIGINT)) AS BIGINT) AS miq FROM t),
        |hx AS (SELECT CAST(sum(CAST(floor(
        |    -(CAST(r AS DOUBLE) / n) * ln(CAST(r AS DOUBLE) / n) * 1e8
        |    + 0.5) AS BIGINT)) AS BIGINT) AS hq
        |  FROM (SELECT DISTINCT et, r, n FROM t)),
        |hy AS (SELECT CAST(sum(CAST(floor(
        |    -(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n) * 1e8
        |    + 0.5) AS BIGINT)) AS BIGINT) AS hq
        |  FROM (SELECT DISTINCT seg, c, n FROM t))
        |SELECT CAST(mi.miq AS DOUBLE) / 1e8 AS mutual_info,
        |  CAST(hx.hq AS DOUBLE) / 1e8 AS h_type,
        |  CAST(hy.hq AS DOUBLE) / 1e8 AS h_segment
        |FROM mi, hx, hy""".stripMargin) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type").as("et"), expr("user_id % 4").as("seg"))
        .agg(count(lit(1)).as("o"))
      val whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val t = staged(cell
        .withColumn("r", sum(col("o")).over(Window.partitionBy("et")))
        .withColumn("c", sum(col("o")).over(Window.partitionBy("seg")))
        .withColumn("n", sum(col("o")).over(whole)))
      val miq = t.select(floor(
          col("o").cast("double") / col("n") *
            log(col("o").cast("double") * col("n") /
              (col("r").cast("double") * col("c"))) * 1e8 + 0.5)
          .cast("long").as("q"))
        .agg(sum(col("q")).as("miq"))
      def marg(keys: Seq[String], tot: String, out: String) =
        t.select((col(tot) +: keys.map(col)): _*).distinct()
          .select(floor(-(col(tot).cast("double") / col("n")) *
            log(col(tot).cast("double") / col("n")) * 1e8 + 0.5)
            .cast("long").as("q"))
          .agg(sum(col("q")).as(out))
      val hx = marg(Seq("et", "n"), "r", "hqx")
      val hy = marg(Seq("seg", "n"), "c", "hqy")
      miq.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
        .select((col("miq").cast("double") / 1e8).as("mutual_info"),
          (col("hqx").cast("double") / 1e8).as("h_type"),
          (col("hqy").cast("double") / 1e8).as("h_segment"))
    },

    // Smoothed target encoding — the categorical feature-prep pass a
    // tabular/ranking pipeline runs before training: each category's
    // encoding pulls its mean target toward the global mean with prior
    // weight m = 10, enc = (S_cat + m·ȳ)/(n_cat + m). Stated as ONE
    // exact rational — (S_cat·N + m·G) / (N·(n_cat + m)) over DECIMAL(38)
    // products (BIGINT·BIGINT would overflow beyond ~sf1 on the 1e3 value
    // grid) — then a single shared IEEE division; the decimal→double hops
    // go through strings (the DetAgg.dsumRaw argument: DuckDB's direct
    // HUGEINT→DOUBLE is two roundings). Two map-side-combined aggregates
    // (per-category + global), no joins wider than the 5-row category
    // frame — at 100 TB the whole fit is one corpus pass.
    checked("ml_target_encode",
      """WITH c AS (SELECT event_type AS category,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS s
        |  FROM events GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(s) AS BIGINT) AS gg FROM c)
        |SELECT category, n AS n_rows,
        |  floor(CAST(CAST(CAST(s AS HUGEINT) * nn + 10 * CAST(gg AS HUGEINT)
        |      AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(CAST(nn AS HUGEINT) * (n + 10) AS VARCHAR) AS DOUBLE)
        |    * 1e6 + 0.5) / 1e6 AS enc_mv
        |FROM c, g""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val c = staged(Tables.events(s, d)
        .groupBy(col("event_type").as("category"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 1000).cast("long")).as("s")))
      val g = c.agg(sum(col("n")).as("nn"), sum(col("s")).as("gg"))
      def dec(x: org.apache.spark.sql.Column) = x.cast(DecimalType(38, 0))
      val num = dec(col("s")) * dec(col("nn")) + lit(10) * dec(col("gg"))
      val den = dec(col("nn")) * dec(col("n") + 10)
      c.crossJoin(broadcast(g))
        .select(col("category"), col("n").as("n_rows"),
          graft.functions.DetAgg.r6(
            num.cast("string").cast("double") /
              den.cast("string").cast("double")).as("enc_mv"))
    },

    // Chi-squared independence test over the event_type × user-segment
    // contingency table — the experiment-analysis pass next to
    // stats_corr. Observed counts, row/column/grand totals, and the
    // numerator (O·N − R·C) are all exact BIGINTs (≤ ~5e13 at any shipped
    // SF); each cell's contribution (O·N−R·C)²/(R·C·N) is one fixed IEEE
    // mul/div tree over those exact integers — bit-identical in both
    // engines — quantized to a 1e-4 grid per CELL so the final statistic
    // is an exact integer sum in any accumulation order. After the first
    // (20-row) aggregate everything is frame-local; at 100 TB this costs
    // exactly one map-side-combined corpus shuffle.
    checked("stats_chi2",
      """WITH cell AS (SELECT event_type AS et, user_id % 4 AS seg,
        |    CAST(count(*) AS BIGINT) AS o FROM events GROUP BY 1, 2),
        |t AS (SELECT et, seg, o,
        |    sum(o) OVER (PARTITION BY et) AS r,
        |    sum(o) OVER (PARTITION BY seg) AS c,
        |    sum(o) OVER () AS n FROM cell),
        |q AS (SELECT et, seg,
        |    CAST(floor(CAST((o * n - r * c) * (o * n - r * c) AS DOUBLE)
        |      / CAST(r * c * n AS DOUBLE) * 1e4 + 0.5) AS BIGINT) AS contrib
        |  FROM t)
        |SELECT CAST(sum(contrib) AS DOUBLE) / 1e4 AS chi2,
        |  CAST((count(DISTINCT et) - 1) * (count(DISTINCT seg) - 1) AS BIGINT)
        |    AS dof,
        |  (SELECT CAST(sum(o) AS BIGINT) FROM cell) AS n_obs
        |FROM q""".stripMargin) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type").as("et"), expr("user_id % 4").as("seg"))
        .agg(count(lit(1)).as("o"))
      val t = cell
        .withColumn("r", sum(col("o")).over(Window.partitionBy("et")))
        .withColumn("c", sum(col("o")).over(Window.partitionBy("seg")))
        .withColumn("n", sum(col("o")).over(
          Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      val dNum = (col("o") * col("n") - col("r") * col("c")).cast("double")
      val q = t.withColumn("contrib",
        floor(dNum * dNum / (col("r") * col("c") * col("n")).cast("double")
          * 1e4 + 0.5).cast("long"))
      q.agg((sum(col("contrib")).cast("double") / 1e4).as("chi2"),
        ((countDistinct(col("et")) - 1) *
          (countDistinct(col("seg")) - 1)).as("dof"),
        sum(col("o")).as("n_obs"))
    }
  )
}
