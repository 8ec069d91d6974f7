package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{Tables, Det}

/** Window functions and scalar-function surface (SURVEY.md §2.11):
  * ranking / analytic / frame windows, string / date / math / array /
  * map / JSON scalar functions (reference scalar inventory §2.8 F1-F7
  * re-expressed over the fixture tables).
  *
  * Windows partition by bounded keys (custkey, returnflag) so state per
  * partition stays small at scale; no global single-partition windows.
  */
object WindowScalarQueries {
  private type Q = (SparkSession, String) => DataFrame
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- ranking windows: row_number / rank / dense_rank / ntile ----
    "q24_window_ranks" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),
    // ---- analytic: lag / lead over event time ----
    "q25_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1).over(w).as("next_type"),
          coalesce(col("value") - lag(col("value"), 1).over(w), lit(0.0)).as("delta_raw"))
        .withColumn("value_delta", dround(col("delta_raw"), 6)).drop("delta_raw")
        .filter(col("user_id") < 50)
        .orderBy(col("user_id"), col("event_id"))
    }),
    // ---- frames: running sum/avg with ROWS BETWEEN ----
    "q26_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          // exact-decimal round (NOT dround): the window sum is an exact
          // decimal and the oracle rounds it as a decimal — keep both
          // sides in decimal space, no double conversion anywhere
          round(sum(Det.dec(col("o_totalprice"))).over(w), 4)
            .cast(DoubleType).as("running_spend"),
          count(lit(1)).over(w).as("n_so_far"))
        .filter(col("o_custkey") < 100)
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),
    // ---- frames: RANGE BETWEEN on a numeric key (SQL form — the typed
    //      rangeBetween(Long) API can't frame a double ordering column) ----
    "q27_window_range_frame" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
          count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
            RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
        FROM lineitem
        WHERE l_orderkey < 500
        ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity
      """)
    }),

    // ---- string functions ----
    "q28_string_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "customer").filter(col("c_custkey") <= 500)
        .select(col("c_custkey"),
          concat_ws("|", col("c_name"), col("c_mktsegment")).as("tagged"),
          upper(col("c_name")).as("uname"),
          lower(col("c_mktsegment")).as("lseg"),
          substring(col("c_name"), 1, 8).as("prefix"),
          length(col("c_name")).as("name_len"),
          trim(concat(lit("  "), col("c_name"), lit("  "))).as("trimmed"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_num"),
          regexp_replace(col("c_mktsegment"), "[AEIOU]", "_").as("devowel"),
          reverse(col("c_mktsegment")).as("rev"),
          lpad(col("c_custkey").cast(StringType), 10, "0").as("padded"))
        .orderBy(col("c_custkey"))
    }),
    // ---- date functions ----
    "q29_date_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType)).as("days_to_2002"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso_day"))
        .orderBy(col("o_orderkey"))
    }),
    // ---- math functions ----
    "q30_math_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem").filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          dround(col("l_extendedprice"), 2).as("rounded"),
          dround(abs(col("l_discount") - 0.05), 6).as("disc_dev"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_extendedprice") / 1000.0).as("price_k_ceil"),
          pmod(col("l_orderkey"), lit(7L)).as("key_mod7"),
          dround(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          dround(pow(col("l_discount"), 2.0), 8).as("disc_sq"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixture data —
        // tiebreak on the value columns so row order is deterministic.
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    }),
    // ---- array functions: split / size / contains / explode ----
    "q31_array_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          array_contains(col("toks"), "spark").as("has_spark"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          size(array_distinct(col("toks"))).as("n_distinct_tokens"))
        .orderBy(col("doc_id"))
    }),
    "q32_explode_tokens" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tok"))
    }),
    // ---- map functions over parsed JSON props ----
    "q33_map_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "events").filter(col("event_id") < 1000)
        .select(col("event_id"),
          from_json(col("props"), MapType(StringType, LongType)).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_keys"),
          array_join(map_keys(col("m")), ",").as("keys"))
        .orderBy(col("event_id"))
    }),
    // ---- JSON functions ----
    "q34_json_funcs" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    // ---- CASE / NULL handling ----
    "q35_case_null" -> ((s, dir) => {
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0.0, lit("overdrawn"))
            .when(col("c_acctbal") < 1000.0, lit("low"))
            .otherwise(lit("healthy")).as("balance_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(building)")).as("seg_masked"),
          (col("c_acctbal") > 5000.0).as("is_rich"),
          isnull(nullif(col("c_mktsegment"), lit("BUILDING"))).as("was_building"))
        .orderBy(col("c_custkey"))
    })
  )

  private val S = dsumSql
  private val R = droundSql

  val oracle: Map[String, String] = Map(
    "q24_window_ranks" -> """
      SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER w AS rn,
          rank() OVER w AS rk,
          dense_rank() OVER w AS drk,
          ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3
      ORDER BY o_custkey, rn""",
    "q25_window_lag_lead" -> s"""
      SELECT user_id, event_id, event_type, prev_type, next_type,
        ${R("delta_raw", 6)} AS value_delta
      FROM (
        SELECT user_id, event_id, event_type,
          lag(event_type, 1) OVER w AS prev_type,
          lead(event_type, 1) OVER w AS next_type,
          coalesce(value - lag(value, 1) OVER w, 0.0) AS delta_raw
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      WHERE user_id < 50
      ORDER BY user_id, event_id""",
    "q26_window_running" -> s"""
      SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS DOUBLE) AS running_spend,
        count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
      FROM orders
      WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderkey""",
    "q27_window_range_frame" -> """
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
          RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within_5
      FROM lineitem
      WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""",
    "q28_string_funcs" -> """
      SELECT c_custkey,
        concat_ws('|', c_name, c_mktsegment) AS tagged,
        upper(c_name) AS uname,
        lower(c_mktsegment) AS lseg,
        substr(c_name, 1, 8) AS prefix,
        length(c_name) AS name_len,
        trim('  ' || c_name || '  ') AS trimmed,
        coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_num,
        regexp_replace(c_mktsegment, '[AEIOU]', '_', 'g') AS devowel,
        reverse(c_mktsegment) AS rev,
        lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded
      FROM customer
      WHERE c_custkey <= 500
      ORDER BY c_custkey""",
    "q29_date_funcs" -> """
      SELECT o_orderkey,
        CAST(year(o_orderdate) AS INT) AS yr,
        CAST(month(o_orderdate) AS INT) AS mo,
        CAST(day(o_orderdate) AS INT) AS dom,
        CAST(quarter(o_orderdate) AS INT) AS qtr,
        date_trunc('month', o_orderdate) AS month_start,
        CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
        strftime(o_orderdate, '%Y-%m-%d') AS iso_day
      FROM orders
      WHERE o_orderkey <= 2000
      ORDER BY o_orderkey""",
    "q30_math_funcs" -> s"""
      SELECT l_orderkey, l_linenumber,
        ${R("l_extendedprice", 2)} AS rounded,
        ${R("abs(l_discount - 0.05)", 6)} AS disc_dev,
        CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        CAST(ceil(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
        l_orderkey % 7 AS key_mod7,
        ${R("sqrt(l_quantity)", 6)} AS qty_sqrt,
        ${R("pow(l_discount, 2.0)", 8)} AS disc_sq
      FROM lineitem
      WHERE l_orderkey <= 500
      ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount, l_quantity""",
    "q31_array_funcs" -> """
      SELECT doc_id,
        CAST(len(toks) AS INT) AS n_tokens,
        list_contains(toks, 'spark') AS has_spark,
        toks[1] AS first_tok,
        toks[-1] AS last_tok,
        CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      ORDER BY doc_id""",
    "q32_explode_tokens" -> """
      SELECT tok, count(*) AS n, count(DISTINCT doc_id) AS df
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
      ORDER BY tok""",
    "q33_map_funcs" -> """
      SELECT event_id,
        CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
        CAST(len(json_keys(props)) AS INT) AS n_keys,
        array_to_string(json_keys(props), ',') AS keys
      FROM events
      WHERE event_id < 1000
      ORDER BY event_id""",
    "q34_json_funcs" -> """
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        min(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
        max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type""",
    "q35_case_null" -> """
      SELECT c_custkey,
        CASE WHEN c_acctbal < 0.0 THEN 'overdrawn'
             WHEN c_acctbal < 1000.0 THEN 'low'
             ELSE 'healthy' END AS balance_band,
        coalesce(nullif(c_mktsegment, 'BUILDING'), '(building)') AS seg_masked,
        c_acctbal > 5000.0 AS is_rich,
        nullif(c_mktsegment, 'BUILDING') IS NULL AS was_building
      FROM customer
      ORDER BY c_custkey"""
  )
}
