package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** q161 — declarative data-expectations audit (the Deequ/Great-
  * Expectations pattern): a fixed suite of constraints validated in
  * one pass per table, emitted as a (table, constraint, violations,
  * n_rows, status) report. This is the admission gate a training-data
  * pipeline runs on every ingest batch before anything downstream
  * trusts the data.
  *
  * Scale shape: every range/domain/null constraint on a table folds
  * into conditional aggregates of the SAME single scan (map-side
  * combined, one 1-row result each); uniqueness is count −
  * count(DISTINCT key) over partial aggregates; referential integrity
  * is a LEFT ANTI join count on the key — each check is a bounded
  * 1-row frame and the report is their union, so the audit costs one
  * scan per table plus one shuffle per uniqueness/FK constraint, at
  * any scale. The reference (affo/ssp) has no validation surface at
  * all — its sinks accept whatever arrives (collect.go:7-13).
  */
object Expectations {

  private def check(tbl: String, con: String, df: DataFrame,
      violations: Column): DataFrame =
    df.agg(coalesce(sum(violations.cast("long")), lit(0L)).as("violations"),
        count(lit(1)).as("n_rows"))
      .select(lit(tbl).as("tbl"), lit(con).as("con"),
        col("violations"), col("n_rows"))

  private def dupCheck(tbl: String, con: String, df: DataFrame,
      key: Column*): DataFrame =
    // distinct over a STRUCT of the keys, not countDistinct(keys):
    // countDistinct drops any row with a null key (it would count
    // null-keyed rows as violations), while the oracle's SELECT
    // DISTINCT keeps one NULL group — a struct is never null, and both
    // engines group its null FIELDS as equal, so the two sides agree
    // even on null-key data (TPC-H keys are non-null; the guard is for
    // real ingest batches, where a null PK is exactly what this
    // constraint must flag as at most one distinct group)
    df.agg((count(lit(1)) - countDistinct(struct(key: _*)))
        .as("violations"), count(lit(1)).as("n_rows"))
      .select(lit(tbl).as("tbl"), lit(con).as("con"),
        col("violations"), col("n_rows"))

  private def fkCheck(tbl: String, con: String, child: DataFrame,
      parent: DataFrame, key: String): DataFrame = {
    val orphans = child.join(parent, Seq(key), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val total = child.agg(count(lit(1)).as("n_rows"))
    orphans.crossJoin(total)
      .select(lit(tbl).as("tbl"), lit(con).as("con"),
        col("violations"), col("n_rows"))
  }

  private def q161(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val checks = Seq(
      check("lineitem", "qty_range", li,
        when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L)),
      check("lineitem", "discount_range", li,
        when(col("l_discount") < 0.0 || col("l_discount") > 0.1, 1L).otherwise(0L)),
      dupCheck("lineitem", "pk_unique", li,
        col("l_orderkey"), col("l_linenumber")),
      fkCheck("lineitem", "fk_orders",
        li.select(col("l_orderkey").as("k")), o.select(col("o_orderkey").as("k")), "k"),
      dupCheck("orders", "pk_unique", o, col("o_orderkey")),
      check("orders", "status_domain", o,
        when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)),
      check("orders", "totalprice_positive", o,
        when(col("o_totalprice") <= 0.0, 1L).otherwise(0L)),
      fkCheck("orders", "fk_customer",
        o.select(col("o_custkey").as("k")), c.select(col("c_custkey").as("k")), "k"),
      check("customer", "acctbal_nonnull", c,
        when(col("c_acctbal").isNull, 1L).otherwise(0L)),
    )
    checks.reduce(_ unionAll _)
      .withColumn("status",
        when(col("violations") === 0L, "pass").otherwise("fail"))
      .orderBy(col("tbl"), col("con"))
  }

  private val q161Sql = {
    def chk(tbl: String, con: String, pred: String) =
      s"""SELECT '$tbl' AS tbl, '$con' AS con,
        |  CAST(coalesce(sum(CASE WHEN $pred THEN 1 ELSE 0 END), 0) AS BIGINT)
        |    AS violations, count(*) AS n_rows FROM $tbl""".stripMargin
    def dup(tbl: String, con: String, keys: String) =
      s"""SELECT '$tbl' AS tbl, '$con' AS con,
        |  CAST(count(*) - (SELECT count(*)
        |    FROM (SELECT DISTINCT $keys FROM $tbl)) AS BIGINT) AS violations,
        |  count(*) AS n_rows FROM $tbl""".stripMargin
    def fk(tbl: String, con: String, ck: String, ptbl: String, pk: String) =
      s"""SELECT '$tbl' AS tbl, '$con' AS con,
        |  CAST((SELECT count(*) FROM $tbl ch WHERE NOT EXISTS
        |    (SELECT 1 FROM $ptbl p WHERE p.$pk = ch.$ck)) AS BIGINT)
        |    AS violations, count(*) AS n_rows FROM $tbl""".stripMargin
    val rows = Seq(
      chk("lineitem", "qty_range", "l_quantity < 1 OR l_quantity > 50"),
      chk("lineitem", "discount_range", "l_discount < 0.0 OR l_discount > 0.1"),
      dup("lineitem", "pk_unique", "l_orderkey, l_linenumber"),
      fk("lineitem", "fk_orders", "l_orderkey", "orders", "o_orderkey"),
      dup("orders", "pk_unique", "o_orderkey"),
      chk("orders", "status_domain", "o_orderstatus NOT IN ('F', 'O', 'P')"),
      chk("orders", "totalprice_positive", "o_totalprice <= 0.0"),
      fk("orders", "fk_customer", "o_custkey", "customer", "c_custkey"),
      chk("customer", "acctbal_nonnull", "c_acctbal IS NULL"),
    ).mkString("\nUNION ALL\n")
    s"""SELECT tbl, con, violations, n_rows,
      |  CASE WHEN violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM (
      |$rows
      |) ORDER BY tbl, con""".stripMargin
  }

  // q234 — functional-dependency discovery (the Metanome/TANE-style
  // profiling pass, restricted to a declared candidate set): for each
  // candidate FD lhs → rhs, the exact violation count
  // |distinct(lhs, rhs)| − |distinct lhs| — zero iff the dependency
  // holds — plus a fixed-point determinacy ratio. This is the
  // profiling report schema inference, join-key validation (q161's
  // uniqueness checks are the FD lhs → * special case) and CDC
  // key-selection all read. Candidates mix holding and failing
  // dependencies on this data: o_orderkey → o_custkey holds (orderkey
  // is a key); every lineitem candidate fails.
  //
  // Scale shape: one aggregate PER CANDIDATE, all six subtrees in one
  // union plan (optimization round 17 — the q180 split, measured 2×
  // there): grouping by the FD's lhs and counting distinct rhs WITHIN
  // each group yields |distinct lhs| (= the group count) and
  // |distinct (lhs, rhs)| (= Σ per-group distinct-rhs) from ONE
  // column-pruned scan and ONE exchange of the candidate's distinct
  // pairs. The previous single 8-distinct aggregate planned through
  // Expand — every lineitem row REPLICATED 8× (once per distinct
  // group) into one fat (gid, 4-col-key) hash aggregate — 8× the
  // pre-shuffle rows and one monolithic exchange instead of six
  // independent ones that overlap in-flight. The Σ identity needs
  // lhs non-null (count(DISTINCT lhs…) drops null-key rows, a group-by
  // keeps the null group); TPC-H keys are NOT NULL by spec, matching
  // the oracle's countDistinct semantics exactly. No joins, no
  // windows; the only shuffles are the per-candidate distinct-pair
  // exchanges the semantics require.
  private def q234(s: SparkSession, d: String): DataFrame = {
    def fd(df: DataFrame, name: String, lhs: Seq[String],
        rhs: String): DataFrame =
      // lhs non-null GUARD (no-op on TPC-H, where keys are NOT NULL by
      // spec): the Σ identity counts a null-lhs group that the oracle's
      // countDistinct(lhs…) drops — the filter makes the asymmetry
      // impossible to import if this helper is ever reused on nullable
      // keys (r17 advice)
      df.select((lhs :+ rhs).map(col): _*)
        .filter(lhs.map(col(_).isNotNull).reduce(_ && _))
        .groupBy(lhs.map(col): _*)
        .agg(countDistinct(col(rhs)).as("k"))
        .agg(count(lit(1)).as("n_lhs"), sum(col("k")).as("n_pairs"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_pairs"))
    val li = lineitem(s, d)
    val ord = orders(s, d)
    Seq(
      fd(li, "lineitem: l_orderkey -> l_returnflag",
        Seq("l_orderkey"), "l_returnflag"),
      fd(li, "lineitem: l_partkey -> l_suppkey",
        Seq("l_partkey"), "l_suppkey"),
      fd(li, "lineitem: l_suppkey -> l_linestatus",
        Seq("l_suppkey"), "l_linestatus"),
      fd(li, "lineitem: l_orderkey,l_linenumber -> l_partkey",
        Seq("l_orderkey", "l_linenumber"), "l_partkey"),
      fd(ord, "orders: o_orderkey -> o_custkey",
        Seq("o_orderkey"), "o_custkey"),
      fd(ord, "orders: o_custkey -> o_orderpriority",
        Seq("o_custkey"), "o_orderpriority"),
    ).reduce(_ unionAll _)
      .select(col("fd"), col("n_lhs"), col("n_pairs"),
        (col("n_pairs") - col("n_lhs")).as("n_violations"),
        when(col("n_pairs") === col("n_lhs"), 1L).otherwise(0L).as("holds_fd"),
        expr("n_lhs * 1048576 DIV n_pairs").as("determinacy_fp"))
      .orderBy(col("fd"))
  }

  private val q234Sql =
    """WITH a AS (SELECT
      |    count(DISTINCT l_orderkey) AS l1,
      |    count(DISTINCT (l_orderkey, l_returnflag)) AS r1,
      |    count(DISTINCT l_partkey) AS l2,
      |    count(DISTINCT (l_partkey, l_suppkey)) AS r2,
      |    count(DISTINCT l_suppkey) AS l3,
      |    count(DISTINCT (l_suppkey, l_linestatus)) AS r3,
      |    count(DISTINCT (l_orderkey, l_linenumber)) AS l4,
      |    count(DISTINCT (l_orderkey, l_linenumber, l_partkey)) AS r4
      |  FROM lineitem),
      |b AS (SELECT
      |    count(DISTINCT o_orderkey) AS l5,
      |    count(DISTINCT (o_orderkey, o_custkey)) AS r5,
      |    count(DISTINCT o_custkey) AS l6,
      |    count(DISTINCT (o_custkey, o_orderpriority)) AS r6
      |  FROM orders),
      |s AS (
      |  SELECT 'lineitem: l_orderkey -> l_returnflag' AS fd, l1 AS n_lhs, r1 AS n_pairs FROM a
      |  UNION ALL
      |  SELECT 'lineitem: l_partkey -> l_suppkey', l2, r2 FROM a
      |  UNION ALL
      |  SELECT 'lineitem: l_suppkey -> l_linestatus', l3, r3 FROM a
      |  UNION ALL
      |  SELECT 'lineitem: l_orderkey,l_linenumber -> l_partkey', l4, r4 FROM a
      |  UNION ALL
      |  SELECT 'orders: o_orderkey -> o_custkey', l5, r5 FROM b
      |  UNION ALL
      |  SELECT 'orders: o_custkey -> o_orderpriority', l6, r6 FROM b)
      |SELECT fd, n_lhs, n_pairs, n_pairs - n_lhs AS n_violations,
      |  CAST(CASE WHEN n_pairs = n_lhs THEN 1 ELSE 0 END AS BIGINT) AS holds_fd,
      |  CAST(n_lhs * 1048576 // n_pairs AS BIGINT) AS determinacy_fp
      |FROM s ORDER BY fd""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q161_data_expectations", q161, Some(q161Sql)),
    Q("q234_fd_discovery", q234, Some(q234Sql)),
  )
}
