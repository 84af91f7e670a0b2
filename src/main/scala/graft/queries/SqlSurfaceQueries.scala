package graft.queries

import graft.Tables
import graft.functions.DetAgg.sqlR6
import graft.functions.TextFns.{sparkSqlH60, sparkSqlTokens}
import graft.operators.FlowOps

/** The SQL-parser surface (round-10 verdict #1): real users of the
  * reference state these workloads in SQL, so each major family gets an
  * end-to-end `spark.sql` restatement — parser → analyzer → the session
  * function registry ([[graft.GraftExtensions]]) → the SAME physical plan
  * family as the Column-API route, hash-checked against the IDENTICAL
  * DuckDB oracle as its DSL twin. `PlanShapeSpec` pins route equivalence
  * (same exchange count, same native operators), so a parser-route plan
  * regression fails a spec rather than shipping a second, slower engine
  * for SQL callers.
  *
  * Registered natives exercised by name from SQL text across this module
  * plus `sql_ann_topk` (`SimilarityQueries`): `dot_long`, `cos_top_k`,
  * `shingle_explode`, `freq_sketch`, `shannon_entropy` — every function
  * [[graft.GraftExtensions.register]] installs.
  */
object SqlSurfaceQueries {
  import QuerySpec._

  /** Register the engine's natives + a stable temp view for `d`'s table.
    * View names are per-table constants: `createOrReplaceTempView` makes
    * re-registration idempotent across queries sharing a session. */
  private def eventsView(s: org.apache.spark.sql.SparkSession, d: String): String = {
    graft.GraftExtensions.register(s)
    Tables.events(s, d).createOrReplaceTempView("graft_sql_events")
    "graft_sql_events"
  }

  private def documentsView(s: org.apache.spark.sql.SparkSession, d: String): String = {
    graft.GraftExtensions.register(s)
    Tables.documents(s, d).createOrReplaceTempView("graft_sql_documents")
    "graft_sql_documents"
  }

  /** Register every TPC-H dim + fact as `graft_sql_<table>` views so the
    * relational restatements read exactly like the DuckDB oracle modulo
    * the view prefix. */
  private def tpchViews(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    graft.GraftExtensions.register(s)
    Tables.region(s, d).createOrReplaceTempView("graft_sql_region")
    Tables.nation(s, d).createOrReplaceTempView("graft_sql_nation")
    Tables.customer(s, d).createOrReplaceTempView("graft_sql_customer")
    Tables.supplier(s, d).createOrReplaceTempView("graft_sql_supplier")
    Tables.orders(s, d).createOrReplaceTempView("graft_sql_orders")
    Tables.lineitem(s, d).createOrReplaceTempView("graft_sql_lineitem")
  }

  /** DuckDB-twin SQL → Spark-SQL dialect hops for the relational
    * restatements, anchored the sparkSqlOf way: bare-table names to the
    * registered views, the exact-decimal sum's VARCHAR cast to STRING,
    * and DuckDB's truncating `//` to Spark's (same-semantics, measured)
    * DIV. Everything else — GROUPING SETS, GROUPING(), window frames,
    * TIMESTAMP literals, the floor-rounding grid — parses identically
    * in both dialects, which is the point of the shared-oracle design. */
  private def sparkDialect(duck: String): String =
    duck
      .replaceAll("""\bAS VARCHAR\)""", "AS STRING)")
      .replaceAll("""(?<![A-Za-z0-9_/])//(?![/])""", "DIV")
      // DuckDB's multi-column GROUPING() is Spark's grouping_id() (same
      // bit order: leftmost grouping column = MSB); `GROUPING SETS` has
      // no '(' directly after the keyword, so it never matches
      .replaceAll("""\bGROUPING\(""", "grouping_id(")
      // µs epoch: DuckDB epoch_us(ts) = Spark unix_micros(ts)
      .replaceAll("""(?<![A-Za-z0-9_])epoch_us\(""", "unix_micros(")
      // DuckDB spells IGNORE NULLS inside the call parens
      // (last_value(x IGNORE NULLS)); ANSI/Spark puts it after
      // (last_value(x) IGNORE NULLS) — the swap is exact because the
      // keyword always directly precedes the closing paren
      .replace(" IGNORE NULLS)", ") IGNORE NULLS")
      .replaceAll(
        """\b(FROM|JOIN)\s+(region|nation|customer|supplier|orders|lineitem|events)\b""",
        "$1 graft_sql_$2")

  val all: Seq[QuerySpec] = Seq(

    // The flagship 38-KPI aggregate stated entirely as SQL text — the
    // form a reference user migrating dashboards would actually write.
    // Every KPI expression is derived from the same template as the
    // DuckDB twin (KpiExprs.sparkSqlOf), and `shannon_entropy` resolves
    // by NAME through the session UDF registry — the registered-UDAF
    // path's first declared query. Same oracle as kpi_full_day, so the
    // parser route must produce the same bits as the Column route.
    checked("sql_kpi_full_day",
      FlowOps.kpiTableSql("day", KpiQueries.IdleThr, KpiQueries.SmallLen,
        KpiQueries.LargeLen)) { (s, d) =>
      val v = eventsView(s, d)
      s.sql(FlowOps.kpiTableSparkSql(v, "day", KpiQueries.IdleThr,
        KpiQueries.SmallLen, KpiQueries.LargeLen))
    },

    // The windowed family through the parser: per-flow lag IAT — the
    // W1 operator as SQL text (PARTITION BY ... ORDER BY ... lag), same
    // oracle as flow_iat.
    checked("sql_flow_iat",
      s"""WITH pkt AS (${FlowOps.packetViewSql}),
         |seqd AS (${FlowOps.withIatSql("SELECT * FROM pkt")})
         |SELECT event_id, slice, flow, ${sqlR6("ts_sec")} AS ts_sec6,
         |  ${sqlR6("iat")} AS iat6
         |FROM seqd""".stripMargin) { (s, d) =>
      val v = eventsView(s, d)
      s.sql(
        s"""WITH pkt AS (${FlowOps.packetViewSparkSql(v)}),
           |seqd AS (${FlowOps.withIatSparkSql("SELECT * FROM pkt")})
           |SELECT event_id, slice, flow, ${sqlR6("ts_sec")} AS ts_sec6,
           |  ${sqlR6("iat")} AS iat6
           |FROM seqd""".stripMargin)
    },

    // The native-Generator route: `shingle_explode` called by name in a
    // LATERAL VIEW — the n-gram Jaccard dedup pass as a SQL analyst
    // would state it. Identical oracle (and identical pair semantics:
    // distinct shingle h60s, capped corpus, same threshold) as
    // dedup_ngram_jaccard.
    checked("sql_dedup_ngram", DedupQueries.ngramJaccardOracleSql) { (s, d) =>
      val v = documentsView(s, d)
      s.sql(
        s"""WITH ex AS (
           |  SELECT DISTINCT doc_id, ${sparkSqlH60("sstr")} AS h
           |  FROM $v
           |  LATERAL VIEW shingle_explode(${sparkSqlTokens("text")},
           |    ${DedupQueries.ShingleN}) t AS sstr
           |  WHERE doc_id < ${DedupQueries.QuadraticCap}),
           |sizes AS (SELECT doc_id, count(*) AS n FROM ex GROUP BY doc_id),
           |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    count(*) AS n_inter
           |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |sized AS (SELECT doc_a, doc_b,
           |    CAST(n_inter AS DOUBLE) / (x.n + y.n - n_inter) AS jac
           |  FROM inter JOIN sizes x ON doc_a = x.doc_id
           |             JOIN sizes y ON doc_b = y.doc_id)
           |SELECT doc_a, doc_b, ${sqlR6("jac")} AS jaccard
           |FROM sized WHERE jac >= ${DedupQueries.NgramThr}""".stripMargin)
    },

    // The join family through the parser (round-11 verdict #4): the Q5
    // multiway join-order shape — 5 joins, a region prune, a date range
    // into the orders scan, the local-supplier correlation — stated as
    // the SQL text an analyst migrating warehouse queries writes. The
    // oracle IS join_multiway_q5's, and the Spark text IS that oracle
    // modulo three anchored dialect hops (views, STRING cast), so the
    // parser route must reproduce both the bits and (PlanShapeSpec) the
    // broadcast-dims + one-fact-shuffle plan Catalyst picks for the DSL
    // twin.
    checked("sql_join_multiway_q5",
      RelationalQueries.multiwayQ5OracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(sparkDialect(RelationalQueries.multiwayQ5OracleSql))
    },

    // The warehouse-aggregate family through the parser: explicit
    // GROUPING SETS + GROUPING() disambiguation — Expand planned from
    // SQL text, sharing agg_grouping_sets' oracle verbatim (GROUPING →
    // grouping_id is the one dialect hop; both engines put the leftmost
    // grouping column in the MSB).
    checked("sql_grouping_sets",
      RelationalQueries.groupingSetsOracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(sparkDialect(RelationalQueries.groupingSetsOracleSql))
    },

    // The stats/window family through the parser: exact per-group
    // percentiles by rank selection — two window functions in one
    // (slice, v)-sorted frame plus the integral ceil-rank arithmetic,
    // where DuckDB's truncating `//` maps to Spark's same-semantics DIV
    // (the ADVICE-r9 measurement). Same oracle as percentile_groups.
    checked("sql_percentile_groups",
      StatsQueries.percentileGroupsOracleSql) { (s, d) =>
      eventsView(s, d)
      s.sql(sparkDialect(StatsQueries.percentileGroupsOracleSql))
    },

    // The set-op family through the parser: UNION / INTERSECT / EXCEPT
    // distinct semantics from SQL text — pure ANSI, zero dialect hops
    // beyond the view names; same oracle as set_ops.
    checked("sql_set_ops", RelationalQueries.setOpsOracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(sparkDialect(RelationalQueries.setOpsOracleSql))
    },

    // The ranking family through the parser: all six ANSI rank functions
    // over two named WINDOW specs (the WINDOW clause parses identically
    // in both dialects) — same oracle as window_rank_family; both specs
    // share the partition key, so both routes plan ONE shuffle.
    checked("sql_window_rank_family",
      RelationalQueries.windowRankFamilyOracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(sparkDialect(RelationalQueries.windowRankFamilyOracleSql))
    },

    // The order/limit family through the parser: global top-k as ORDER
    // BY ... LIMIT — the route must still plan TakeOrderedAndProject
    // (per-partition heaps), never a full sort; same oracle as
    // topk_orders.
    checked("sql_topk_orders",
      RelationalQueries.topkOrdersOracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(sparkDialect(RelationalQueries.topkOrdersOracleSql))
    },

    // The as-of family through the parser: the nearest-direction as-of
    // join stated as the tagged-union + IGNORE-NULLS-window SQL (the
    // scalable shape — one shuffle carries both direction frames) with
    // the null-guarded µs-distance pick. Exercises parser syntax no
    // other route touches: IGNORE NULLS on last_value/first_value and
    // asymmetric ROWS frames over named windows. Same oracle as
    // join_asof_nearest (DuckDB runs the identical tagged-union SQL).
    checked("sql_join_asof_nearest",
      RelationalQueries.asofNearestOracleSql) { (s, d) =>
      eventsView(s, d)
      s.sql(sparkDialect(RelationalQueries.asofNearestOracleSql))
    },

    // The whole-operator as-of THROUGH THE PARSER: Spark SQL has no ASOF
    // keyword, so the direction rides a registered marker predicate —
    // `LEFT JOIN … ON equi AND asof_backward(e.ts, c.r_ts)` is DuckDB's
    // `ASOF LEFT JOIN … ON equi AND e.ts >= c.ts` with the operator
    // spelled as a function. [[graft.plans.AsOfJoinRewrite]] (injected
    // Rule[LogicalPlan]) rewrites the marked join into AsOfJoinPlan →
    // AsOfJoinExec (streaming two-pointer merge); if the rewrite ever
    // declined, the marker would degrade to the bare range predicate and
    // the hash gate would catch the changed rows. Same oracle as
    // join_asof/join_asof_exec; AsOfJoinSpec pins the rewrite fired.
    checked("sql_join_asof_exec",
      RelationalQueries.asofBackwardOracleSql) { (s, d) =>
      val v = eventsView(s, d)
      s.sql(
        s"""WITH clicks AS (SELECT user_id AS r_user_id, ts AS r_ts,
           |    max(event_id) AS click_id
           |  FROM $v WHERE event_type = 'click' GROUP BY user_id, ts),
           |errs AS (SELECT event_id, user_id, ts
           |  FROM $v WHERE event_type = 'error')
           |SELECT e.event_id, e.user_id, c.click_id AS last_click_id,
           |  unix_micros(e.ts) - unix_micros(c.r_ts) AS gap_us
           |FROM errs e LEFT JOIN clicks c
           |  ON e.user_id = c.r_user_id AND asof_backward(e.ts, c.r_ts)""".stripMargin)
    },

    // The forward direction of the same parser route (each error's next
    // click at-or-after it); same oracle as join_asof_fwd_exec.
    checked("sql_join_asof_fwd_exec",
      RelationalQueries.asofForwardOracleSql) { (s, d) =>
      val v = eventsView(s, d)
      s.sql(
        s"""WITH clicks AS (SELECT user_id AS r_user_id, ts AS r_ts,
           |    max(event_id) AS click_id
           |  FROM $v WHERE event_type = 'click' GROUP BY user_id, ts),
           |errs AS (SELECT event_id, user_id, ts
           |  FROM $v WHERE event_type = 'error')
           |SELECT e.event_id, e.user_id, c.click_id AS next_click_id,
           |  unix_micros(c.r_ts) - unix_micros(e.ts) AS recovery_us
           |FROM errs e LEFT JOIN clicks c
           |  ON e.user_id = c.r_user_id AND asof_forward(e.ts, c.r_ts)""".stripMargin)
    },

    // The analytics family through the parser: the 4-step conversion
    // funnel as chained CTEs with JOIN USING and strictly-after
    // timestamps — portable to Spark SQL modulo the epoch_us hop; same
    // oracle as funnel_conversion.
    checked("sql_funnel_conversion",
      AnalyticsQueries.funnelOracleSql) { (s, d) =>
      eventsView(s, d)
      s.sql(sparkDialect(AnalyticsQueries.funnelOracleSql))
    },

    // The scalar-HOF family through the parser: exists/forall/filter
    // lambdas + any/every/count_if boolean aggregates in SQL text. The
    // one restatement that is hand-spelled rather than dialect-rewritten
    // (DuckDB's list/list_filter/len have different names), but the
    // oracle is scalar_predicates' single string for both routes.
    checked("sql_scalar_predicates",
      ScalarQueries.scalarPredicatesOracleSql) { (s, d) =>
      tpchViews(s, d)
      s.sql(
        """WITH arrs AS (SELECT l_orderkey,
          |    collect_list(CAST(l_quantity AS BIGINT)) AS qs
          |  FROM graft_sql_lineitem GROUP BY l_orderkey),
          |flags AS (SELECT l_orderkey,
          |    exists(qs, x -> x > 45) AS has_big,
          |    forall(qs, x -> x > 0) AS all_pos,
          |    CAST(size(filter(qs, x -> x < 10)) AS BIGINT) AS n_small
          |  FROM arrs),
          |j AS (SELECT o_orderpriority AS priority, has_big, all_pos, n_small
          |  FROM flags JOIN graft_sql_orders ON l_orderkey = o_orderkey)
          |SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
          |  any(has_big) AS any_has_big,
          |  every(all_pos) AS every_all_pos,
          |  CAST(count_if(n_small > 0) AS BIGINT) AS n_with_small
          |FROM j GROUP BY priority""".stripMargin)
    },

    // The native-aggregate route: `freq_sketch` (Misra-Gries) called by
    // name — heavy hitters per language as SQL text, same oracle (and
    // same exact-regime contract) as text_heavy_hitters.
    checked("sql_heavy_hitters", TextQueries.heavyHittersOracleSql) { (s, d) =>
      val v = documentsView(s, d)
      s.sql(
        s"""SELECT lang, e.item AS item, e.est AS est
           |FROM (
           |  SELECT lang, freq_sketch(tok, 48) AS sk
           |  FROM (SELECT lang, explode(${sparkSqlTokens("text")}) AS tok
           |    FROM $v)
           |  GROUP BY lang) g
           |LATERAL VIEW explode(sk) t AS e""".stripMargin)
    },

    // The theta-sketch route: `kmv_sketch` called by name, with the whole
    // union/intersection estimator algebra stated as SQL array arithmetic
    // (element_at / array_union / array_intersect / HOF filter) — the
    // overlap-audit query a SQL analyst would run between two corpus
    // snapshots. Same oracle as sketch_kmv_overlap. The 2^63 hash-space
    // constant is spelled as a double literal that rounds to exactly
    // 2^63 (doubles near 2^63 are 2048 apart; 9223372036854776000 sits
    // 192 away), matching the Column route's math.pow(2, 63).
    checked("sql_kmv_overlap", KpiQueries.kmvOverlapOracleSql) { (s, d) =>
      val v = documentsView(s, d)
      val K = 1024
      val M = "9.223372036854776E18"
      def estD(sk: String) =
        s"""CASE WHEN size($sk) < $K THEN CAST(size($sk) AS DOUBLE)
           |  ELSE CAST(${K - 1} AS DOUBLE) * $M
           |    / CAST(element_at($sk, $K) AS DOUBLE) END""".stripMargin
      def kthOrMax(sk: String) =
        s"CASE WHEN size($sk) < $K THEN 9223372036854775807 " +
          s"ELSE element_at($sk, $K) END"
      s.sql(
        s"""WITH m AS (SELECT max(doc_id) AS mx FROM $v),
           |base AS (SELECT text,
           |    xxhash64(text) & 9223372036854775807 AS h,
           |    doc_id <= CAST(floor(0.7 * mx) AS BIGINT) AS in_a,
           |    doc_id >= CAST(floor(0.3 * mx) AS BIGINT) AS in_b
           |  FROM $v, m),
           |sk AS (SELECT
           |    kmv_sketch(CASE WHEN in_a THEN h END, $K) AS ska,
           |    kmv_sketch(CASE WHEN in_b THEN h END, $K) AS skb
           |  FROM base),
           |ex AS (SELECT
           |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           |    CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           |    CAST(sum(CASE WHEN a OR b THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
           |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_intersect
           |  FROM (SELECT text, max(in_a) AS a, max(in_b) AS b
           |        FROM base GROUP BY text)),
           |alg AS (SELECT ex.*, ska, skb,
           |    slice(array_sort(array_union(ska, skb)), 1, $K) AS mrg,
           |    least(${kthOrMax("ska")}, ${kthOrMax("skb")}) AS thr
           |  FROM ex CROSS JOIN sk),
           |alg2 AS (SELECT *,
           |    size(filter(array_intersect(ska, skb), x -> x < thr)) AS n_common
           |  FROM alg)
           |SELECT n_a, n_b, n_union, n_intersect,
           |  abs(${estD("ska")} - n_a) <= 0.10 * n_a AS est_a_ok,
           |  abs(${estD("skb")} - n_b) <= 0.10 * n_b AS est_b_ok,
           |  abs(${estD("mrg")} - n_union) <= 0.10 * n_union AS est_union_ok,
           |  abs(CASE WHEN thr = 9223372036854775807 THEN CAST(n_common AS DOUBLE)
           |        ELSE CAST(n_common AS DOUBLE) * $M / CAST(thr AS DOUBLE) END
           |      - n_intersect) <= 0.10 * n_union AS est_intersect_ok,
           |  CASE WHEN size(ska) < $K AND size(skb) < $K
           |    THEN size(mrg) = n_union AND n_common = n_intersect
           |    ELSE true END AS exact_regime_consistent
           |FROM alg2""".stripMargin)
    }
  )
}
