package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

import graft.Tables
import graft.functions.DetAgg._

/** Scalar-function suite (SURVEY §2.8): the JSON / cast / conditional /
  * string / date-time expression families the reference uses, promoted to
  * driver-checked queries over the harness tables.
  *
  * All pure per-row projections + one small aggregate each — scan-bound at
  * any scale, fully codegen'd, filters pushed to parquet.
  */
object ScalarQueries {
  import QuerySpec._

  /** scalar_predicates' DuckDB twin — shared with `sql_scalar_predicates`
    * (the one family whose parser restatement is hand-spelled rather
    * than dialect-rewritten: DuckDB's list/list_filter/len HOFs map to
    * Spark's collect_list/filter/size + lambda syntax, but the oracle —
    * and therefore the bits — is this single string for both routes). */
  private[queries] val scalarPredicatesOracleSql: String =
    """WITH arrs AS (SELECT l_orderkey,
      |    list(CAST(l_quantity AS BIGINT)) AS qs
      |  FROM lineitem GROUP BY l_orderkey),
      |flags AS (SELECT l_orderkey,
      |    len(list_filter(qs, x -> x > 45)) > 0 AS has_big,
      |    len(list_filter(qs, x -> NOT (x > 0))) = 0 AS all_pos,
      |    CAST(len(list_filter(qs, x -> x < 10)) AS BIGINT) AS n_small
      |  FROM arrs),
      |j AS (SELECT o_orderpriority AS priority, has_big, all_pos, n_small
      |  FROM flags JOIN orders ON l_orderkey = o_orderkey)
      |SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
      |  bool_or(has_big) AS any_has_big,
      |  bool_and(all_pos) AS every_all_pos,
      |  CAST(count_if(n_small > 0) AS BIGINT) AS n_with_small
      |FROM j GROUP BY priority""".stripMargin

  val all: Seq[QuerySpec] = Seq(

    // JSON family (reference from_json/to_json — KafkaKpiPipeline.scala:253,
    // PcapKpiExtractor.scala:253): parse events.props into a typed map,
    // extract, and re-serialize a struct to JSON.
    checked("scalar_json",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
        |  CAST(json_extract_string(props, '$.missing') AS INTEGER) AS k_missing,
        |  concat('{"id":', CAST(event_id AS VARCHAR), ',"k":',
        |         CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS VARCHAR), '}') AS as_json
        |FROM events""".stripMargin) { (s, d) =>
      val m = from_json(col("props"), MapType(StringType, IntegerType))
      Tables.events(s, d).select(
        col("event_id"),
        m.getItem("k").as("k"),
        m.getItem("missing").as("k_missing"),
        // to_json on a struct would also work but field order/spacing is
        // engine-specific; concat gives a byte-identical twin.
        concat(lit("{\"id\":"), col("event_id").cast("string"), lit(",\"k\":"),
          m.getItem("k").cast("string"), lit("}")).as("as_json"))
    },

    // String family: the reference's host-language string ops promoted to
    // column functions (SURVEY §2.8 — concat_ws flowId :207, split/
    // element_at :375, endswith :328, dotted-quad :171).
    checked("scalar_string",
      """SELECT s_suppkey,
        |  concat_ws('_', CAST(s_nationkey AS VARCHAR), CAST(s_suppkey AS VARCHAR)) AS flow_id,
        |  upper(substr(s_name, 1, 8)) AS name8,
        |  list_extract(string_split(s_name, '#'), -1) AS name_num,
        |  CASE WHEN suffix(s_name, '7') THEN 1 ELSE 0 END AS ends_7,
        |  length(s_name) AS name_len,
        |  replace(s_name, 'Supplier', 'S') AS name_short,
        |  lpad(CAST(s_nationkey AS VARCHAR), 4, '0') AS nation_padded,
        |  lower(reverse(s_name)) AS name_rev
        |FROM supplier""".stripMargin) { (s, d) =>
      Tables.supplier(s, d).select(
        col("s_suppkey"),
        concat_ws("_", col("s_nationkey").cast("string"),
          col("s_suppkey").cast("string")).as("flow_id"),
        upper(substring(col("s_name"), 1, 8)).as("name8"),
        element_at(split(col("s_name"), "#"), -1).as("name_num"),
        when(col("s_name").endsWith("7"), 1).otherwise(0).as("ends_7"),
        length(col("s_name")).as("name_len"),
        regexp_replace(col("s_name"), "Supplier", "S").as("name_short"),
        lpad(col("s_nationkey").cast("string"), 4, "0").as("nation_padded"),
        lower(reverse(col("s_name"))).as("name_rev"))
    },

    // Date/time family: truncation grains, epoch round-trips, calendar
    // extraction (the corrected forms of the reference's event-time cast —
    // quirk Q1 — plus the date_trunc/floor-epoch window keys used by the
    // KPI queries).
    checked("scalar_datetime",
      s"""SELECT event_id,
         |  date_trunc('minute', ts) AS ts_minute,
         |  date_trunc('day', ts) AS ts_day,
         |  CAST(epoch_us(ts) // 1000000 AS BIGINT) AS epoch_sec,
         |  CAST(floor(epoch_us(ts) / 1000000.0 / 300) * 300 AS BIGINT) AS bucket_5min,
         |  extract(hour FROM ts) AS hh,
         |  extract(dow FROM ts) AS dow,
         |  CAST(strftime(ts, '%Y-%m-%d') AS VARCHAR) AS ymd
         |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        date_trunc("minute", col("ts")).as("ts_minute"),
        date_trunc("day", col("ts")).as("ts_day"),
        (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("epoch_sec"),
        (floor(unix_micros(col("ts")) / lit(1000000.0) / 300) * 300).cast("long").as("bucket_5min"),
        hour(col("ts")).cast("long").as("hh"),
        dayofweek(col("ts")).minus(1).cast("long").as("dow"),
        date_format(col("ts"), "yyyy-MM-dd").as("ymd"))
    },

    // Generator family (SURVEY §2.11 UDTF-shaped ops): posexplode of the
    // per-order lineitem quantity array — array_agg in a deterministic
    // order, then unnest with ordinality.
    checked("scalar_posexplode",
      """WITH arrs AS (
        |  SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber, l_quantity) AS qs
        |  FROM lineitem WHERE l_orderkey < 100 GROUP BY l_orderkey)
        |SELECT l_orderkey, generate_subscripts(qs, 1) - 1 AS pos, unnest(qs) AS qty
        |FROM arrs""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .groupBy("l_orderkey")
        // array_agg ordered within groups via sort_array of (ln, qty) structs
        .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("pairs"))
        .select(col("l_orderkey"),
          posexplode(transform(col("pairs"), p => p.getField("l_quantity"))))
        .withColumnRenamed("col", "qty")
    },

    // Collection-function family over per-order quantity arrays — the
    // array surface (sort / distinct / slice / contains / flatten-free
    // HOF total) exercised as ONE projection over grouped arrays, with
    // every derived value deterministic: arrays are canonicalized by
    // sorting (array_distinct's preservation order is engine-specific,
    // so distinct is always followed by sort), and the HOF total is an
    // exact integer fold. DuckDB's list_* functions are the twins.
    checked("scalar_array",
      """WITH arrs AS (SELECT l_orderkey,
        |    list(CAST(l_quantity AS BIGINT) ORDER BY CAST(l_quantity AS BIGINT))
        |      AS qs
        |  FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey)
        |SELECT l_orderkey, len(qs) AS n,
        |  array_to_string(qs, ',') AS sorted_qs,
        |  len(list_sort(list_distinct(qs))) AS n_distinct,
        |  array_to_string(qs[1:2], ',') AS first2,
        |  list_contains(qs, 50) AS has50,
        |  CAST(list_aggregate(qs, 'sum') AS BIGINT) AS total
        |FROM arrs""".stripMargin) { (s, d) =>
      // Array ops stay in the plan; the DECLARED surface is scalarized
      // (array_join) because the driver's pandas comparator cannot
      // sort/hash raw ArrayType cells (round-8 `err`). DuckDB twin:
      // array_to_string.
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 200)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list(col("l_quantity").cast("long")))
          .as("qs"))
        .select(col("l_orderkey"), size(col("qs")).cast("long").as("n"),
          array_join(col("qs"), ",").as("sorted_qs"),
          size(array_sort(array_distinct(col("qs")))).cast("long")
            .as("n_distinct"),
          array_join(slice(col("qs"), 1, 2), ",").as("first2"),
          array_contains(col("qs"), 50L).as("has50"),
          aggregate(col("qs"), lit(0L), (a, x) => a + x).as("total"))
    },

    // Predicate surfaces — the boolean HOFs (exists / forall / filter)
    // and boolean aggregates (any / every / count_if) in one pass:
    // per-order quantity arrays answer row-level predicates, then the
    // per-priority rollup folds them through the boolean aggregate
    // family. DuckDB spells the HOFs as list_filter lengths and the
    // aggregates as bool_or / bool_and / count_if — same semantics,
    // null-free by construction.
    checked("scalar_predicates", ScalarQueries.scalarPredicatesOracleSql) { (s, d) =>
      val flags = Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(collect_list(col("l_quantity").cast("long")).as("qs"))
        .select(col("l_orderkey"),
          exists(col("qs"), x => x > 45).as("has_big"),
          forall(col("qs"), x => x > 0).as("all_pos"),
          size(filter(col("qs"), x => x < 10)).cast("long").as("n_small"))
      flags.join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n_orders"),
          expr("any(has_big)").as("any_has_big"),
          expr("every(all_pos)").as("every_all_pos"),
          expr("count_if(n_small > 0)").as("n_with_small"))
    },

    // Ordered LISTAGG — Spark 4's native listagg(...) WITHIN GROUP, the
    // SQL:2016 surface (not a collect_list reshuffle): nation rosters
    // per region, comma-joined in collation order. The aggregate is
    // inherently order-sensitive, so the WITHIN GROUP clause is the
    // whole point — DuckDB's string_agg(... ORDER BY) is the twin.
    checked("agg_string_agg",
      """SELECT r_name AS region,
        |  CAST(count(*) AS BIGINT) AS n_nations,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) { (s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"))
        .agg(count(lit(1)).as("n_nations"),
          expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
            .as("nations_csv"))
    },

    // Pivot (declared addition; no pivot in the reference): order counts by
    // status spread into columns — the oracle is the CASE-aggregation
    // spelling, which is also exactly how Spark plans a pivot.
    checked("scalar_pivot",
      s"""SELECT o_orderpriority,
         |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
         |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
         |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
         |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("f_cnt"),
          coalesce(col("O"), lit(0L)).as("o_cnt"),
          coalesce(col("P"), lit(0L)).as("p_cnt"))
    },

    // VARIANT — Spark 4's semi-structured type: props parses ONCE into a
    // binary variant, fields extract with typed paths; at scale this beats
    // per-field get_json_object re-parses (one parse, many extractions;
    // shredded storage when written to parquet). Nonexistent paths are
    // null-safe via try_variant_get. The DuckDB twin is its native JSON
    // extraction — same values, engine-appropriate machinery on each side.
    checked("scalar_variant",
      s"""SELECT event_type,
         |  CAST(sum(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS k_sum,
         |  CAST(count(CAST(json_extract_string(props, '$$.k') AS INTEGER)) AS BIGINT) AS k_present,
         |  CAST(count(CAST(json_extract_string(props, '$$.nope') AS INTEGER)) AS BIGINT) AS nope_present
         |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          try_variant_get(col("v"), "$.k", "int").as("k"),
          try_variant_get(col("v"), "$.nope", "int").as("nope"))
        .groupBy("event_type")
        .agg(sum(col("k")).cast("long").as("k_sum"),
          count(col("k")).as("k_present"),
          count(col("nope")).as("nope_present"))
    },

    // try_* error-safe family — ANSI mode's escape hatches: arithmetic and
    // casts that yield NULL instead of failing the job. At 100 TB a single
    // malformed row otherwise kills an hours-long job; try_* keeps the
    // pipeline total and lets a quality gate count the casualties.
    checked("scalar_try",
      s"""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN l_quantity = 0 THEN NULL
         |       ELSE ${sqlR6("l_extendedprice / l_quantity")} END AS unit_price,
         |  TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
         |  TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS ln_roundtrip
         |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          r6(try_divide(col("l_extendedprice"),
            when(col("l_quantity") === 0, lit(null)).otherwise(col("l_quantity")))).as("unit_price"),
          try_to_number(col("l_returnflag"), lit("999")).cast("int").as("flag_as_int"),
          col("l_linenumber").cast("string").cast("int").as("ln_roundtrip"))
    },

    // Unpivot/melt — pivot's inverse (the pandas `melt` every
    // feature-table-to-long-format hop needs): four lineitem measures fold
    // into (measure, val) rows, then re-aggregate per measure. Spark plans
    // unpivot as Expand — the same operator rollup/cube use; no shuffle
    // until the final aggregate.
    checked("scalar_unpivot",
      s"""SELECT measure, count(*) AS n, ${sqlSum("val")} AS total
         |FROM (UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount, l_tax
         |               FROM lineitem)
         |      ON l_quantity, l_extendedprice, l_discount, l_tax
         |      INTO NAME measure VALUE val)
         |GROUP BY measure""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .unpivot(
          Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "val")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), dsum(col("val")).as("total"))
    },

    // Conditional/math family over lineitem: when-chains, epsilon division,
    // bit ops, rounding — the reference's expression vocabulary (§2.8).
    checked("scalar_math",
      s"""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN l_quantity < 10 THEN 'S' WHEN l_quantity < 30 THEN 'M' ELSE 'L' END AS qty_class,
         |  ${sqlR("l_extendedprice * (1 - l_discount)", 2)} AS net_price,
         |  ${sqlR6("l_extendedprice / (l_quantity + 0.000001)")} AS unit_price,
         |  CAST(l_linenumber AS BIGINT) & 3 AS ln_mod4,
         |  CAST(l_linenumber AS BIGINT) << 2 AS ln_x4,
         |  abs(l_discount - 0.05) >= 0.03 AS far_from_mid,
         |  greatest(l_tax, l_discount) AS max_rate,
         |  CAST(ceil(l_quantity / 10.0) AS BIGINT) AS qty_decile
         |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "S").when(col("l_quantity") < 30, "M")
          .otherwise("L").as("qty_class"),
        r(col("l_extendedprice") * (lit(1) - col("l_discount")), 2).as("net_price"),
        r6(col("l_extendedprice") / (col("l_quantity") + lit(1e-6))).as("unit_price"),
        col("l_linenumber").cast("long").bitwiseAND(3).as("ln_mod4"),
        shiftleft(col("l_linenumber").cast("long"), 2).as("ln_x4"),
        (abs(col("l_discount") - 0.05) >= 0.03).as("far_from_mid"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        ceil(col("l_quantity") / 10.0).cast("long").as("qty_decile"))
    })
}
