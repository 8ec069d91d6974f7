package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Tables, Det}

/** Declared relational surface (SURVEY.md §2.11): scans, filters, joins
  * (all types), aggregations incl. rollup/cube/grouping-sets, set ops,
  * sorts/limits/top-k. Every query is deterministic (explicit ORDER BY on
  * a unique key; money through exact-decimal arithmetic, Det.*) and has a
  * DuckDB oracle twin in `oracle`.
  *
  * Scale notes (100 TB design intent, verified on local plans):
  *  - dimension joins (region/nation/supplier/part) are broadcast —
  *    at any scale these stay tiny relative to the fact tables;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key, which
  *    is the natural co-partitioning for a bucketed layout in prod;
  *  - aggregations rely on Spark's partial (map-side) aggregation; no
  *    driver-side collection anywhere.
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame
  import Det._

  val queries: Map[String, Q] = Map(
    // ---- scan + filter + project + agg spine (TPC-H Q1 shape) ----
    "q01_pricing_summary" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- predicates: IN / BETWEEN / LIKE / CASE WHEN / arithmetic ----
    "q02_part_filter" -> ((s, dir) => {
      Tables.load(s, dir, "part")
        .filter(col("p_size").between(10, 30) &&
          col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_name").like("%a%"))
        .select(
          col("p_partkey"), col("p_name"), col("p_brand"), col("p_size"),
          when(col("p_retailprice") > 1500.0, lit("premium"))
            .when(col("p_retailprice") > 800.0, lit("standard"))
            .otherwise(lit("budget")).as("price_tier"),
          dround(col("p_retailprice") * 1.1, 4).as("marked_up"))
        .orderBy(col("p_partkey"))
    }),

    // ---- 3-way join + group + top-k (TPC-H Q3 shape); orders⋈lineitem
    //      shuffles on orderkey, customer side is filtered then joined ----
    "q03_shipping_priority" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.load(s, dir, "orders").filter(col("o_orderdate") < lit("1998-03-15").cast(TimestampType))
      val l = Tables.load(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-03-15").cast(TimestampType))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // ---- outer joins ----
    "q04_left_outer" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val l = Tables.load(s, dir, "lineitem").filter(col("l_quantity") > 45.0)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left")
        .groupBy(col("o_orderstatus"))
        .agg(count(col("l_orderkey")).as("n_big_items"),
             count(lit(1)).as("n_rows"),
             countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("o_orderstatus"))
    }),
    "q05_full_outer" -> ((s, dir) => {
      // customers vs suppliers per nation: which nations have only one side
      val c = Tables.load(s, dir, "customer").groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.load(s, dir, "supplier").groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, Seq("nationkey"), "full_outer")
        .select(coalesce(c("nationkey"), su("nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // ---- semi / anti ----
    "q06_semi_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders").filter(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    }),
    "q07_anti_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // ---- cross join (small dims only — kept broadcastable by design) ----
    "q08_cross_join" -> ((s, dir) => {
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      r.crossJoin(n)
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey"))
    }),

    // ---- theta / range join (banded acctbal match within a nation) ----
    "q09_range_join" -> ((s, dir) => {
      val su = Tables.load(s, dir, "supplier")
      val c = Tables.load(s, dir, "customer")
      su.join(c, su("s_nationkey") === c("c_nationkey") &&
          c("c_acctbal") >= su("s_acctbal") - 100.0 &&
          c("c_acctbal") <= su("s_acctbal") + 100.0)
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_close_customers"),
             davg(col("c_acctbal")).as("avg_cust_bal"))
        .orderBy(col("s_suppkey"))
    }),

    // ---- 6-way join through the full star (TPC-H Q5 shape) ----
    "q10_regional_revenue" -> ((s, dir) => {
      val r = Tables.load(s, dir, "region")
      val n = Tables.load(s, dir, "nation")
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = Tables.load(s, dir, "lineitem")
      val su = Tables.load(s, dir, "supplier")
      // dims are broadcast; fact-fact shuffles on the natural keys
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
        .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === su("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // ---- aggregation variants ----
    "q11_agg_having" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("total_spend"),
             dround(max(col("o_totalprice")), 4).as("max_order"))
        .filter(col("n_orders") >= 3)
        .orderBy(col("o_custkey"))
    }),
    // Plan-audited (guarded in ScaleDesignSpec): the three distincts
    // compile to Expand (3× rows, one gid each) with a key-only partial
    // HashAggregate BEFORE the exchange, so the shuffle carries deduped
    // (rf, col, gid) tuples — already the two-phase distinct plan.
    "q12_count_distinct" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             countDistinct(col("l_orderkey"), col("l_linenumber")).as("n_lines"))
        .orderBy(col("l_returnflag"))
    }),
    "q13_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
                col("n"), col("total"))
        .orderBy(col("status"), col("priority"))
    }),
    "q14_cube" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
                coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
                col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    }),
    "q15_grouping_sets" -> ((s, dir) => {
      // DataFrame API has no direct grouping-sets builder — SQL form is
      // the idiomatic Spark route (same Catalyst Aggregate+Expand plan).
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
      """)
    }),

    // ---- set ops ----
    "q16_union_all" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
      val su = Tables.load(s, dir, "supplier")
        .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
      c.unionAll(su).groupBy(col("nationkey"), col("side"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("nationkey"), col("side"))
    }),
    "q17_union_distinct" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy(col("nationkey"))
    }),
    "q18_intersect" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.intersect(su).orderBy(col("nationkey"))
    }),
    "q19_except" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val su = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      c.except(su).orderBy(col("nationkey"))
    }),

    // ---- sort / limit / per-group top-k ----
    "q20_global_topk" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(25)
    }),

    // ---- subqueries ----
    "q21_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_name,
               floor(CAST(c_acctbal AS DOUBLE) * 1e4 + 0.5) / 1e4 AS acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
        ORDER BY c_custkey
      """)
    }),
    "q22_in_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'F'
        ORDER BY o_orderkey
      """)
    }),
    "q23_exists_correlated" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT p.p_partkey, p.p_name
        FROM part p
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49.0)
        ORDER BY p.p_partkey
      """)
    })
  )

  private val S = dsumSql
  private val A = davgSql
  private val R = droundSql

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" -> s"""
      SELECT l_returnflag, l_linestatus,
        ${S("l_quantity", 4)} AS sum_qty,
        ${S("l_extendedprice", 4)} AS sum_base_price,
        ${S("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
        ${S("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 4)} AS sum_charge,
        ${A("l_quantity", 4)} AS avg_qty,
        ${A("l_extendedprice", 4)} AS avg_price,
        ${A("l_discount", 6)} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q02_part_filter" -> s"""
      SELECT p_partkey, p_name, p_brand, p_size,
        CASE WHEN p_retailprice > 1500.0 THEN 'premium'
             WHEN p_retailprice > 800.0 THEN 'standard'
             ELSE 'budget' END AS price_tier,
        ${R("p_retailprice * 1.1", 4)} AS marked_up
      FROM part
      WHERE p_size BETWEEN 10 AND 30
        AND p_brand IN ('Brand#1','Brand#2','Brand#3')
        AND p_name LIKE '%a%'
      ORDER BY p_partkey""",
    "q03_shipping_priority" -> s"""
      SELECT o_orderkey, o_orderdate, o_orderpriority,
        ${S("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-03-15'
        AND l_shipdate > TIMESTAMP '1998-03-15'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10""",
    "q04_left_outer" -> """
      SELECT o_orderstatus,
        count(l_orderkey) AS n_big_items,
        count(*) AS n_rows,
        count(DISTINCT o_orderkey) AS n_orders
      FROM orders LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity > 45.0) l
        ON o_orderkey = l.l_orderkey
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus""",
    "q05_full_outer" -> """
      SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
        coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      FROM (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL OUTER JOIN (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1) s
        USING (nationkey)
      ORDER BY nationkey""",
    "q06_semi_join" -> """
      SELECT c_custkey, c_name, c_mktsegment
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      ORDER BY c_custkey""",
    "q07_anti_join" -> """
      SELECT c_custkey, c_name, c_acctbal
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""",
    "q08_cross_join" -> """
      SELECT r_regionkey, r_name, n_nationkey, n_name
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey""",
    "q09_range_join" -> s"""
      SELECT s_suppkey, count(*) AS n_close_customers,
        ${A("c_acctbal", 4)} AS avg_cust_bal
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey
        AND c_acctbal >= s_acctbal - 100.0
        AND c_acctbal <= s_acctbal + 100.0
      GROUP BY s_suppkey
      ORDER BY s_suppkey""",
    "q10_regional_revenue" -> s"""
      SELECT r_name, n_name,
        ${S("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""",
    "q11_agg_having" -> s"""
      SELECT o_custkey, count(*) AS n_orders,
        ${S("o_totalprice", 4)} AS total_spend,
        ${R("max(o_totalprice)", 4)} AS max_order
      FROM orders
      GROUP BY o_custkey
      HAVING count(*) >= 3
      ORDER BY o_custkey""",
    "q12_count_distinct" -> """
      SELECT l_returnflag,
        count(DISTINCT l_partkey) AS n_parts,
        count(DISTINCT l_suppkey) AS n_supps,
        count(DISTINCT (l_orderkey, l_linenumber)) AS n_lines
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""",
    "q13_rollup" -> s"""
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n, ${S("o_totalprice", 4)} AS total
      FROM orders
      GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY status, priority""",
    "q14_cube" -> s"""
      SELECT coalesce(l_returnflag, 'ALL') AS rf,
        coalesce(l_linestatus, 'ALL') AS ls,
        count(*) AS n, ${S("l_quantity", 4)} AS qty
      FROM lineitem
      GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY rf, ls""",
    "q15_grouping_sets" -> """
      SELECT coalesce(o_orderstatus, 'ALL') AS status,
        coalesce(o_orderpriority, 'ALL') AS priority,
        count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority""",
    "q16_union_all" -> """
      SELECT nationkey, side, count(*) AS n FROM (
        SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier)
      GROUP BY nationkey, side
      ORDER BY nationkey, side""",
    "q17_union_distinct" -> """
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q18_intersect" -> """
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q19_except" -> """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey""",
    "q20_global_topk" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 25""",
    "q21_scalar_subquery" -> """
      SELECT c_custkey, c_name,
        floor(CAST(c_acctbal AS DOUBLE) * 1e4 + 0.5) / 1e4 AS acctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) * 1.5 FROM customer)
      ORDER BY c_custkey""",
    "q22_in_subquery" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        AND o_orderstatus = 'F'
      ORDER BY o_orderkey""",
    "q23_exists_correlated" -> """
      SELECT p.p_partkey, p.p_name
      FROM part p
      WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49.0)
      ORDER BY p.p_partkey"""
  )
}
