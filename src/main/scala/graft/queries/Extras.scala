package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.TextFns.{hash60, hash60Sql}

/** Additional relational surface: pivot-style conditional aggregation,
  * deterministic sampling, quantile bucketing, AS-OF joins, and ordered
  * list aggregation.
  */
object Extras {

  // q42 — pivot via conditional aggregation (the shuffle-free form of
  // PIVOT: one pass, one agg per cell, identical SQL in any engine).
  private def q42(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"),
        sum(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0)).cast("decimal(14,2)")).cast("double").as("total_f"))
      .orderBy(col("o_orderpriority"))

  private val q42Sql =
    """SELECT o_orderpriority,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
      |  CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END
      |    AS DECIMAL(14,2))) AS DOUBLE) AS total_f
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q43 — deterministic hash sampling: a ~10% sample that is identical
  // on every engine and every run (portable md5-derived hash mod 100) —
  // the repeatable-sampling primitive a data pipeline needs (Bernoulli
  // sampling by hash, not by RNG).
  private def q43(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .filter(pmod(hash60(col("text")), lit(100L)) < 10)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))

  private val q43Sql =
    s"""SELECT doc_id, lang, n_chars
      |FROM documents
      |WHERE ${hash60Sql("text")} % 100 < 10
      |ORDER BY doc_id""".stripMargin

  // q44 — quantile bucketing over a total order, WITHOUT the global
  // single-partition ntile window (which funnels the whole table
  // through one task's sort — the 100 TB failure mode). Distributed
  // exact equivalent: range-repartition on the sort key, rank within
  // each range partition, then add per-partition offsets (a ≤#partition
  // row aggregate — bounded by cluster size, not data) to get the exact
  // global rank, and apply ntile's remainder-first bucket formula
  // directly. Output is bit-identical to ntile(4) OVER (ORDER BY ...).
  private def q44(s: SparkSession, d: String): DataFrame = {
    val nb = 4
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val o = orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      .repartitionByRange(nParts, col("o_totalprice"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("pid"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val local = o.withColumn("lrk", row_number().over(wLocal))
    // per-partition counts -> exclusive prefix offsets; <=32 rows, so
    // the unpartitioned window here is O(#partitions), not O(data)
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col("pid"), col("off"))
    val tot = local.groupBy().agg(count(lit(1)).as("n_total"))
    // ntile semantics: q = n/nb, r = n%nb; first r buckets get q+1 rows.
    // Integer `div` throughout — double division would lose exactness
    // past 2^53 rows.
    local.join(broadcast(offsets), "pid")
      .crossJoin(broadcast(tot))
      .withColumn("rk", col("off") + col("lrk"))
      .withColumn("q", expr(s"n_total div $nb"))
      .withColumn("r", col("n_total") % nb)
      .withColumn("bucket",
        when(col("rk") <= col("r") * (col("q") + 1),
          expr("(rk + q) div (q + 1)"))
          .otherwise(col("r") +
            expr("(rk - r * (q + 1) + greatest(q, 1L) - 1) div greatest(q, 1L)"))
        .cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
      .orderBy(col("bucket"))
  }

  private val q44Sql =
    """SELECT bucket, count(*) AS n, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM (
      |  SELECT o_totalprice,
      |    ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      |  FROM orders) t
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin

  // q45 — AS-OF join: for every click event, the most recent signup of
  // the same user at-or-before it. Spark has no asof-join operator; the
  // scalable composition is a source-tagged union + running
  // last_value(ignoreNulls) over event time — ONE shuffle on user_id,
  // no range cross-product (the reference lacks joins entirely;
  // SURVEY.md §2.2). The oracle is DuckDB's native ASOF LEFT JOIN.
  private def q45(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"), col("event_id"), lit(1).as("tag"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts_ms"), col("event_id"), lit(0).as("tag"))
    // signup sorts before click at equal ts (tag 0 < 1) => '<=' semantics
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(signups)
      .withColumn("last_signup_ms",
        last(when(col("tag") === 0, col("ts_ms")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("last_signup_ms"))
      .orderBy(col("event_id"))
  }

  private val q45Sql =
    """SELECT c.event_id, c.user_id, c.ts_ms, s.ts_ms AS last_signup_ms
      |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
      |      WHERE event_type = 'click') c
      |ASOF LEFT JOIN
      |     (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
      |      WHERE event_type = 'signup') s
      |  ON c.user_id = s.user_id AND c.ts_ms >= s.ts_ms
      |ORDER BY event_id""".stripMargin

  // q46 — ordered list aggregation: nation names per region as a
  // deterministic sorted CSV (collect_list order is nondeterministic;
  // array_sort pins it — same contract as DuckDB's ORDER BY inside
  // string_agg).
  private def q46(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(broadcast(region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("r_name"))

  private val q46Sql =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  // q47 — JSON extraction from the events.props payload column:
  // parse-free path extraction (get_json_object) + typed cast + agg.
  private def q47(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("event_type"))
      .groupBy(pmod(col("k"), lit(10L)).as("k_bucket"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"))

  private val q47Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
      |  count(*) AS n,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY 1
      |ORDER BY k_bucket""".stripMargin

  // q48 — KMV distinct-count sketch (custom typed Aggregator,
  // graft.functions.KmvSketch) per language: the k-th smallest distinct
  // hash + the cardinality estimate, next to the exact count. The
  // sketch is hash-deterministic, so unlike HLL the oracle verifies it
  // EXACTLY: DuckDB reproduces the same k-th min via row_number over
  // sorted distinct hashes.
  private def q48(s: SparkSession, d: String): DataFrame = {
    val k = 64
    documents(s, d)
      .select(col("lang"), hash60(col("text")).as("h"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("h")).as("exact_distinct"),
        graft.functions.KmvSketch.kthMinHash(col("h"), k).as("kth_min"))
      // sentinel -1 (fewer than k distinct) -> NULL, matching the oracle
      .withColumn("kth_min",
        when(col("kth_min") === -1L, lit(null)).otherwise(col("kth_min")))
      .withColumn("est",
        lit((k - 1).toDouble) * lit(1152921504606846976.0) / col("kth_min"))
      .orderBy(col("lang"))
  }

  private val q48Sql =
    s"""SELECT lang, exact_distinct, kth_min,
      |  CAST(63 AS DOUBLE) * 1152921504606846976 / kth_min AS est
      |FROM (
      |  SELECT lang, count(DISTINCT h) AS exact_distinct,
      |    min(CASE WHEN rn = 64 THEN h END) AS kth_min
      |  FROM (
      |    SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
      |    FROM (SELECT DISTINCT lang, ${hash60Sql("text")} AS h FROM documents) d1) d2
      |  GROUP BY lang) d3
      |ORDER BY lang""".stripMargin

  // q49 — range join, binned (graft.ops.RangeJoins): for each error
  // event, how many clicks the same user made in the preceding 5
  // minutes. The oracle states the naive non-equi range join; the
  // Spark side runs the linear-shuffle binned equi-join.
  private def q49(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_ms"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_ms"))
    graft.ops.RangeJoins.countPreceding(
        errors, clicks, "user_id", "ts_ms", "event_id", 300000L)
      .orderBy(col("event_id"))
  }

  private val q49Sql =
    """SELECT e.event_id, count(c.ts_ms) AS n_preceding
      |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms FROM events
      |      WHERE event_type = 'error') e
      |LEFT JOIN (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
      |      WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id
      |  AND c.ts_ms >= e.ts_ms - 300000 AND c.ts_ms < e.ts_ms
      |GROUP BY e.event_id
      |ORDER BY event_id""".stripMargin

  // q56 — the rest of the analytic-window family: first/last/nth value
  // over ordered frames, percent_rank, cume_dist, dense_rank.
  private def q56(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(s, d)
      .withColumn("first_price", first(col("o_totalprice")).over(wFull))
      .withColumn("last_price", last(col("o_totalprice")).over(wFull))
      .withColumn("second_price", nth_value(col("o_totalprice"), 2).over(wFull))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("dr", dense_rank().over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("first_price"), col("last_price"),
        col("second_price"), col("pr"), col("cd"), col("dr"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q56Sql =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price,
      |  nth_value(o_totalprice, 2) OVER wf AS second_price,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  dense_rank() OVER w AS dr
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // q57 — exact interpolated quantiles per group: Spark `percentile`
  // and DuckDB `quantile_cont` share the (1−g)·x_i + g·x_{i+1}
  // definition on the sorted values, so results are raw-double exact.
  private def q57(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.25)").as("q1_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val q57Sql =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.25) AS q1_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price,
      |  count(*) AS n
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q58 — SQL-text entry point: the engine also accepts ANSI SQL via
  // spark.sql over registered views (the reference has no query
  // language at all — SURVEY.md §3). Correlated scalar subquery,
  // decorrelated by Catalyst into a join under the hood.
  private def q58(s: SparkSession, d: String): DataFrame = {
    customer(s, d).createOrReplaceTempView("customer_v")
    nation(s, d).createOrReplaceTempView("nation_v")
    s.sql(
      """SELECT n.n_name, c.c_custkey, c.c_acctbal
        |FROM customer_v c JOIN nation_v n ON c.c_nationkey = n.n_nationkey
        |WHERE c.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer_v c2
        |                     WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY n.n_name, c.c_custkey""".stripMargin)
  }

  private val q58Sql =
    """SELECT n.n_name, c.c_custkey, c.c_acctbal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE c.c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
      |                     WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY n.n_name, c.c_custkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q42_pivot_case", q42, Some(q42Sql)),
    Q("q43_sample_hash", q43, Some(q43Sql)),
    Q("q44_ntile", q44, Some(q44Sql)),
    Q("q45_asof_join", q45, Some(q45Sql)),
    Q("q46_listagg", q46, Some(q46Sql)),
    Q("q47_json_extract", q47, Some(q47Sql)),
    Q("q48_kmv_sketch", q48, Some(q48Sql)),
    Q("q49_range_join", q49, Some(q49Sql)),
    Q("q56_analytic_funcs", q56, Some(q56Sql)),
    Q("q57_quantiles", q57, Some(q57Sql)),
    Q("q58_sql_correlated", q58, Some(q58Sql)),
  )
}
