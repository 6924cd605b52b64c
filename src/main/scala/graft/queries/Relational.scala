package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Relational operator surface: scans, projections/filters, the full join
  * family, aggregation (hash-agg, distinct, rollup/cube/grouping sets),
  * analytic window functions, sorts/limits, set operations, scalar
  * functions, and subqueries.
  *
  * The reference (affo/ssp) has none of these as built-ins — users
  * hand-write them inside generic node callbacks (SURVEY.md §2.2) — so
  * this layer exposes the Spark-native equivalents directly. Every query
  * here is a declarative DataFrame plan: Catalyst does pushdown, pruning,
  * join selection (broadcast for the small dims) and partial aggregation,
  * all of which survive a 1000-executor scale-up unchanged.
  *
  * Determinism rules for the DuckDB oracle compare:
  *  - aggregates over money-scale doubles go through exact DECIMAL
  *    arithmetic (`dsum`/`drev` below and the matching CAST in the
  *    oracle SQL): decimal sums are order-independent and identical in
  *    both engines, and the final decimal→double cast is correctly
  *    rounded in both. `round()` on a double whose true value sits ON
  *    the 0.01 grid is NOT portable (the engines' FP sums land on
  *    opposite sides of the half-boundary — observed on sf0.001), so
  *    no double is ever rounded;
  *  - averages/ratios are emitted as raw doubles computed from
  *    bit-identical numerator and denominator (IEEE division is
  *    deterministic given identical inputs);
  *  - every query ends in a total ORDER BY in BOTH engines;
  *  - date comparisons go through CAST(ts AS DATE) in both dialects.
  */
object Relational {

  /** Order-independent exact sum of a scale-2 (money) double column,
    * emitted as double. Keeps the scaled integer < 2^53 so the
    * decimal→double cast is correctly rounded in every engine.
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(14, 2))).cast("double")
  private val dsumSqlFmt = "CAST(sum(CAST(%s AS DECIMAL(14,2))) AS DOUBLE)"

  /** Exact revenue-style sum: Σ price·factor where both operands live on
    * the 0.01 grid. The scale-4 product sum is rounded (exactly, on the
    * decimal) back to scale 2 before the double cast.
    */
  private def drev(price: Column, factor: Column): Column =
    round(sum(price.cast(DecimalType(14, 2)) * factor.cast(DecimalType(4, 2))), 2)
      .cast("double")
  private val drevSqlFmt =
    "CAST(round(sum(CAST(%s AS DECIMAL(14,2)) * CAST(%s AS DECIMAL(4,2))), 2) AS DOUBLE)"

  // q01 — TPC-H Q1-style pricing summary: partial+final hash aggregation,
  // the canonical map-side-combine test. At 100 TB this is a single scan +
  // one tiny shuffle of (flag,status) partials.
  private def q01(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        drev(col("l_extendedprice"), lit(1) - col("l_discount")).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    s"""SELECT l_returnflag, l_linestatus,
      |  ${dsumSqlFmt.format("l_quantity")} AS sum_qty,
      |  ${dsumSqlFmt.format("l_extendedprice")} AS sum_base_price,
      |  ${drevSqlFmt.format("l_extendedprice", "1 - l_discount")} AS sum_disc_price,
      |  ${dsumSqlFmt.format("l_quantity")} / count(*) AS avg_qty,
      |  ${dsumSqlFmt.format("l_discount")} / count(*) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q02 — projection + filter: row-level arithmetic only (no aggregation),
  // so values are bit-exact across engines. Checks parquet filter pushdown
  // and column pruning (ReadSchema should list 5 of 16 columns).
  private def q02(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")).between(lit("1996-01-01"), lit("1996-12-31"))
        && col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * col("l_discount")).as("disc_revenue"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice * l_discount AS disc_revenue
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      |  AND l_discount >= 0.05 AND l_quantity < 24
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // q03 — TPC-H Q3-style shipping priority: 3-way join + agg + top-k.
  // customer is small → Catalyst broadcasts it; orders⋈lineitem shuffles
  // on the join key, which is also the agg key → one shuffle reused.
  private def q03(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(to_date(col("o_orderdate")) < lit("1998-03-15"))
    val l = lineitem(s, d).filter(to_date(col("l_shipdate")) > lit("1998-03-15"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"))
      .agg(drev(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q03Sql =
    s"""SELECT l_orderkey,
      |  ${drevSqlFmt.format("l_extendedprice", "1 - l_discount")} AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-03-15'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-03-15'
      |GROUP BY l_orderkey
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // q04 — left-semi join (EXISTS): order priority counts for orders that
  // have at least one lineitem shipped after order date window.
  private def q04(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(to_date(col("o_orderdate")).between(lit("1996-01-01"), lit("1996-06-30")))
    val l = lineitem(s, d).select(col("l_orderkey"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q04Sql =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q05 — 5-way star join: region→nation→customer→orders→lineitem, revenue
  // per nation. region/nation/customer are broadcast dims; the one real
  // shuffle is orders⋈lineitem on orderkey.
  private def q05(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d).filter(col("r_name") =!= "ZZZ")
    val n = nation(s, d)
    val c = customer(s, d)
    val o = orders(s, d).filter(to_date(col("o_orderdate")) >= lit("1997-01-01"))
    val l = lineitem(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(drev(col("l_extendedprice"), lit(1) - col("l_discount")).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q05Sql =
    s"""SELECT r_name, n_name,
      |  ${drevSqlFmt.format("l_extendedprice", "1 - l_discount")} AS revenue
      |FROM region JOIN nation ON r_regionkey = n_regionkey
      |  JOIN customer ON n_nationkey = c_nationkey
      |  JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE r_name <> 'ZZZ' AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // q06 — TPC-H Q6-style single-row filter aggregate: the purest
  // pushdown test — the whole predicate should reach the parquet reader.
  private def q06(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(to_date(col("l_shipdate")).between(lit("1997-01-01"), lit("1997-12-31"))
        && col("l_discount").between(0.03, 0.07) && col("l_quantity") < 25)
      .agg(drev(col("l_extendedprice"), col("l_discount")).as("revenue"))

  private val q06Sql =
    s"""SELECT ${drevSqlFmt.format("l_extendedprice", "l_discount")} AS revenue
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25""".stripMargin

  // q07 — left-anti join (NOT EXISTS): customers that never placed a
  // large order, counted per market segment.
  private def q07(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_totalprice") > 300000).select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  private val q07Sql =
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // q08 — left outer join preserving zero-order customers, with a
  // deterministic top-k tail.
  private def q08(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(50)
  }

  private val q08Sql =
    s"""SELECT c_custkey, c_name, count(o_orderkey) AS n_orders,
      |  coalesce(${dsumSqlFmt.format("o_totalprice")}, 0) AS total_spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY n_orders DESC, c_custkey
      |LIMIT 50""".stripMargin

  // q09 — full outer join over the two nation-keyed dimensions:
  // per-nation customer and supplier account balances side by side.
  private def q09(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("cust_bal"))
    val sup = supplier(s, d).groupBy(col("s_nationkey").as("s_nkey"))
      .agg(count(lit(1)).as("n_supp"), dsum(col("s_acctbal")).as("supp_bal"))
    c.join(sup, col("nationkey") === col("s_nkey"), "full_outer")
      .select(
        coalesce(col("nationkey"), col("s_nkey")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("cust_bal"), lit(0.0)).as("cust_bal"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"),
        coalesce(col("supp_bal"), lit(0.0)).as("supp_bal"))
      .orderBy(col("nationkey"))
  }

  private val q09Sql =
    s"""SELECT coalesce(c.nationkey, s.s_nkey) AS nationkey,
      |  coalesce(c.n_cust, 0) AS n_cust, coalesce(c.cust_bal, 0) AS cust_bal,
      |  coalesce(s.n_supp, 0) AS n_supp, coalesce(s.supp_bal, 0) AS supp_bal
      |FROM
      |  (SELECT c_nationkey AS nationkey, count(*) AS n_cust,
      |     ${dsumSqlFmt.format("c_acctbal")} AS cust_bal FROM customer GROUP BY 1) c
      |FULL OUTER JOIN
      |  (SELECT s_nationkey AS s_nkey, count(*) AS n_supp,
      |     ${dsumSqlFmt.format("s_acctbal")} AS supp_bal FROM supplier GROUP BY 1) s
      |ON c.nationkey = s.s_nkey
      |ORDER BY nationkey""".stripMargin

  // q10 — distinct aggregation: exact + approximate cardinalities. The
  // approx (HLL) column is engine-specific, so the oracle covers the
  // exact columns and the approx one is asserted in ScalaTest instead.
  private def q10(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private val q10Sql =
    """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
      |  count(DISTINCT l_partkey) AS n_parts, count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // q11 — ROLLUP: hierarchical subtotals (flag → flag+status → grand).
  private def q11(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q11Sql =
    s"""SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  ${dsumSqlFmt.format("l_quantity")} AS qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // q12 — CUBE over order status × priority.
  private def q12(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q12Sql =
    s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  ${dsumSqlFmt.format("o_totalprice")} AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // q13 — GROUPING SETS with grouping() disambiguation of the null rows.
  private def q13(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), grouping(col("o_orderstatus")).cast("int").as("g_status"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  private val q13Sql =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // q14 — analytic window functions: top-3 orders per customer by price
  // (row_number) plus each order's share of the customer total.
  private def q14(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    orders(s, d)
      .withColumn("rk", row_number().over(w))
      .withColumn("cust_total",
        sum(col("o_totalprice").cast(DecimalType(14, 2))).over(wAll).cast("double"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        col("o_totalprice"), (col("o_totalprice") / col("cust_total")).as("share"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  private val q14Sql =
    """SELECT o_custkey, rk, o_orderkey, o_totalprice, share FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk,
      |    o_totalprice / CAST(sum(CAST(o_totalprice AS DECIMAL(14,2)))
      |      OVER (PARTITION BY o_custkey) AS DOUBLE) AS share
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  // q15 — running (cumulative) aggregate: ssp's signature semantics — a
  // stateful per-key running sum emitting one row per input record
  // (SURVEY.md §2.2 "Aggregations", §4.3.4). Batch equivalent: sum over
  // an ordered window frame.
  private def q15(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(14, 2))).over(w).cast("double"))
      .withColumn("running_n", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("running_n"), col("running_spend"))
      .orderBy(col("o_custkey"), col("running_n"))
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey,
      |  count(*) OVER w AS running_n,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) OVER w AS DOUBLE) AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, running_n""".stripMargin

  // q16 — lag/lead: day gaps between consecutive orders per customer.
  private def q16(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev_date").isNotNull)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))).cast("long").as("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q16Sql =
    """SELECT o_custkey, o_orderkey, gap_days FROM (
      |  SELECT o_custkey, o_orderkey,
      |    date_diff('day',
      |      CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS gap_days
      |  FROM orders) t
      |WHERE gap_days IS NOT NULL
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // q17 — global sort + limit (TakeOrderedAndProject): top-k never
  // materializes a full sort at scale.
  private def q17(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  private val q17Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 25""".stripMargin

  // q18 — UNION ALL with source tagging: ssp's multi-input merge (O6)
  // carries a source index on each record; the relational equivalent is
  // an explicit source column before union (SURVEY.md §1.5).
  private def q18(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(lit(0).as("source"), col("c_name").as("name"),
      col("c_nationkey").cast("int").as("nationkey"))
    val sup = supplier(s, d).select(lit(1).as("source"), col("s_name").as("name"),
      col("s_nationkey").cast("int").as("nationkey"))
    c.unionByName(sup)
      .groupBy(col("source"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("source"), col("nationkey"))
  }

  private val q18Sql =
    """SELECT source, nationkey, count(*) AS n FROM (
      |  SELECT 0 AS source, c_name AS name, CAST(c_nationkey AS INT) AS nationkey FROM customer
      |  UNION ALL
      |  SELECT 1 AS source, s_name AS name, CAST(s_nationkey AS INT) AS nationkey FROM supplier) t
      |GROUP BY source, nationkey
      |ORDER BY source, nationkey""".stripMargin

  // q19 — INTERSECT: nations that have both customers and suppliers.
  private def q19(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  private val q19Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  // q20 — EXCEPT (set difference, dedups like the SQL operator):
  // high-balance customers that are not in the BUILDING segment.
  private def q20(s: SparkSession, d: String): DataFrame =
    customer(s, d).filter(col("c_acctbal") > 8000).select(col("c_custkey").as("custkey"))
      .except(customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey")))
      .orderBy(col("custkey"))

  private val q20Sql =
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 8000
      |EXCEPT
      |SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |ORDER BY custkey""".stripMargin

  // q21 — scalar string functions (ssp users call Go strings.* inside
  // node callbacks — SURVEY.md §2.2; here they are codegen'd built-ins).
  private def q21(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"),
        trim(col("p_name")).as("name_trim"))
      .orderBy(col("p_partkey"))

  private val q21Sql =
    """SELECT p_partkey, upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
      |  length(p_name) AS name_len, substring(p_type, 1, 5) AS type_prefix,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
      |  trim(p_name) AS name_trim
      |FROM part ORDER BY p_partkey""".stripMargin

  // q22 — date/time functions: calendar breakdown of order volume.
  private def q22(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(year(col("o_orderdate")).as("yr"), quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"), col("o_totalprice"))
      .groupBy(col("yr"), col("qtr"), col("mth"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("yr"), col("qtr"), col("mth"))

  private val q22Sql =
    s"""SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      |  month(o_orderdate) AS mth,
      |  count(*) AS n_orders, ${dsumSqlFmt.format("o_totalprice")} AS total
      |FROM orders GROUP BY 1, 2, 3 ORDER BY yr, qtr, mth""".stripMargin

  // q23 — math + CASE WHEN bucketing (only IEEE-exact ops: + - * / abs
  // floor ceil — no libm functions whose last ulp differs per engine).
  private def q23(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(
        col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
        ceil(col("c_acctbal") / 1000).cast("long").as("bal_bucket_hi"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium").as("tier"))
      .orderBy(col("c_custkey"))

  private val q23Sql =
    """SELECT c_custkey, abs(c_acctbal) AS abs_bal,
      |  CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
      |  CAST(ceil(c_acctbal / 1000) AS BIGINT) AS bal_bucket_hi,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |       WHEN c_acctbal < 5000 THEN 'standard'
      |       ELSE 'premium' END AS tier
      |FROM customer ORDER BY c_custkey""".stripMargin

  // q24 — HAVING: nations with enough customers.
  private def q24(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      .filter(col("n") >= 3)
      .orderBy(col("c_nationkey"))

  private val q24Sql =
    s"""SELECT c_nationkey, count(*) AS n,
      |  ${dsumSqlFmt.format("c_acctbal")} / count(*) AS avg_bal
      |FROM customer GROUP BY c_nationkey HAVING count(*) >= 3
      |ORDER BY c_nationkey""".stripMargin

  // q25 — IN-subquery + scalar subquery: orders from high-balance
  // customers above the global average price.
  private def q25(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val rich = customer(s, d).filter(col("c_acctbal") > 7500).select(col("c_custkey"))
    val avgPrice = o.agg(avg(col("o_totalprice"))).first().getDouble(0)
    o.join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left_semi")
      .filter(col("o_totalprice") > avgPrice)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val q25Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
      |  AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q01_pricing_summary", q01, Some(q01Sql)),
    Q("q02_filter_project", q02, Some(q02Sql)),
    Q("q03_top_revenue", q03, Some(q03Sql)),
    Q("q04_semi_join", q04, Some(q04Sql)),
    Q("q05_star_join", q05, Some(q05Sql)),
    Q("q06_filter_agg", q06, Some(q06Sql)),
    Q("q07_anti_join", q07, Some(q07Sql)),
    Q("q08_outer_join", q08, Some(q08Sql)),
    Q("q09_full_outer_join", q09, Some(q09Sql)),
    Q("q10_distinct_agg", q10, Some(q10Sql)),
    Q("q11_rollup", q11, Some(q11Sql)),
    Q("q12_cube", q12, Some(q12Sql)),
    Q("q13_grouping_sets", q13, Some(q13Sql)),
    Q("q14_window_topn", q14, Some(q14Sql)),
    Q("q15_running_sum", q15, Some(q15Sql)),
    Q("q16_lag_lead", q16, Some(q16Sql)),
    Q("q17_sort_limit", q17, Some(q17Sql)),
    Q("q18_union_tagged", q18, Some(q18Sql)),
    Q("q19_intersect", q19, Some(q19Sql)),
    Q("q20_except", q20, Some(q20Sql)),
    Q("q21_string_funcs", q21, Some(q21Sql)),
    Q("q22_date_funcs", q22, Some(q22Sql)),
    Q("q23_math_case", q23, Some(q23Sql)),
    Q("q24_having", q24, Some(q24Sql)),
    Q("q25_subqueries", q25, Some(q25Sql)),
  )
}
