package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Order-statistics analytics over the relational tables: Pareto
  * frontier (skyline), interval-sweep peak concurrency, and the native
  * pivot/unpivot relational operators. The reference (affo/ssp) has no
  * comparable surface — its users would hand-roll these inside a
  * stateful node callback (reference node.go:66-82); here each is a
  * declarative plan whose only sequential piece is a
  * partition-count-sized carry frame.
  *
  * Both q153 and q154 are instances of the DISTRIBUTED PREFIX pattern
  * already used by q147/rankDistributed: range-partition on the sweep
  * order, compute the running aggregate per partition, and join a
  * broadcast carry-in of each earlier partition's total — no
  * single-partition window over the data anywhere. The carry frame has
  * one row per partition (32 here, a few thousand on a real cluster),
  * so the one global window it needs is free.
  */
object Frontier {

  private def nPartsOf(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)

  // q153 — skyline / Pareto frontier: the set of (x, y) points not
  // dominated by any other point (minimize x, maximize y). The naive
  // formulation (what the oracle runs) is the quadratic NOT EXISTS
  // anti-join; the scalable form used here is the sort-order sweep: on
  // distinct points ordered (x asc, y desc), a point is on the
  // frontier iff its y strictly exceeds every preceding y — one
  // distributed prefix max, O(n log n), no self-join. Skylines are
  // small by nature (4 points here), so the join back to the fact
  // table broadcasts.

  /** Core: skyline of distinct (x, y) points — minimize x, maximize y,
    * strict domination. Fixture-testable.
    */
  private[graft] def skylineOf(pts0: DataFrame): DataFrame =
    // the generic single-pass carry operator (r18), max/exclusive mode:
    // cum = max y over strictly-preceding sweep rows (null for the
    // first point overall — greatest() null semantics preserved)
    graft.ops.PrefixSum.prefixMaxExclusive(pts0, Seq.empty,
        Seq(col("x").asc, col("y").desc), col("y"))
      .filter(col("cum").isNull || col("y") > col("cum"))
      .select(col("x"), col("y"))

  // Cheapest-per-size frontier of the part catalog: minimize
  // p_retailprice, maximize p_size. All part rows sitting on a
  // frontier point are returned (ties share the point).
  private def q153(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
    val sky = skylineOf(
      p.select(col("p_retailprice").as("x"), col("p_size").as("y")).distinct())
    p.join(broadcast(sky),
        p("p_retailprice") === sky("x") && p("p_size") === sky("y"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  private val q153Sql =
    """WITH pts AS (SELECT DISTINCT p_retailprice AS x, p_size AS y FROM part),
      |sky AS (
      |  SELECT x, y FROM pts p
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM pts q
      |    WHERE q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR q.y > p.y)))
      |SELECT p_partkey, p_retailprice, p_size
      |FROM part JOIN sky ON p_retailprice = sky.x AND p_size = sky.y
      |ORDER BY p_partkey""".stripMargin

  // q154 — peak concurrency by interval sweep: each event opens a
  // [ts, ts + HoldMs) activity interval; the peak number of
  // simultaneously-open intervals per event type is the classic
  // +1/−1 endpoint sweep with a running sum. Ends sort before starts
  // at the same instant (d asc), so touching intervals never count as
  // concurrent (half-open semantics). Within a tie group all deltas
  // are equal, so the running-sum MULTISET over the group — and hence
  // the max — is permutation-invariant: the result is deterministic
  // even though neither engine breaks the tie the same way.
  val HoldMs = 300000L // 5 min activity window per event

  /** Core: (event_type, peak, n_events) over (event_type, ts_ms) rows.
    * Fixture-testable.
    */
  private[graft] def peakConcurrencyOf(ev: DataFrame): DataFrame = {
    val e = ev.select(col("event_type"), col("ts_ms"))
    val ends = e.select(col("event_type"), (col("ts_ms") + HoldMs).as("t"),
      lit(-1L).as("d"))
    val pts = e.select(col("event_type"), col("ts_ms").as("t"), lit(1L).as("d"))
      .unionAll(ends)
    // the generic single-pass carry operator (r18) — the inline
    // range-exchange + localCheckpoint + window + carry-join copy this
    // replaces materialized the full sweep frame a second time
    graft.ops.PrefixSum.prefixSum(pts, Seq("event_type"),
        Seq(col("t"), col("d")), col("d"))
      .withColumnRenamed("cum", "conc")
      .groupBy(col("event_type"))
      .agg(max(col("conc")).as("peak"),
        // DIV, not `/`: Spark's `/` on longs is IEEE double division,
        // exact only below 2^53 rows — integral division keeps the
        // count exact at any scale (file-wide exact-integer rule)
        expr("count(1) DIV 2").as("n_events"))
      .orderBy(col("event_type"))
  }

  private def q154(s: SparkSession, d: String): DataFrame =
    peakConcurrencyOf(events(s, d))

  private val q154Sql =
    s"""WITH pe AS (
      |  SELECT event_type, epoch_ms(ts) AS t, 1 AS d FROM events
      |  UNION ALL
      |  SELECT event_type, epoch_ms(ts) + $HoldMs AS t, -1 AS d FROM events),
      |r AS (
      |  SELECT event_type,
      |    sum(d) OVER (PARTITION BY event_type ORDER BY t, d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM pe)
      |SELECT event_type, CAST(max(conc) AS BIGINT) AS peak,
      |  CAST(count(*) // 2 AS BIGINT) AS n_events
      |FROM r GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // q155 — native pivot/unpivot roundtrip: RelationalGroupedDataset
  // .pivot with an EXPLICIT value list (no extra distinct-values job —
  // the two-arg form a production pipeline should use) widens
  // (flag × status) quantity sums to columns; Dataset.unpivot melts
  // them back to long form. Absent combinations surface as nulls in
  // the wide frame and are dropped on the way back, so the roundtrip
  // equals the plain group-by the oracle states — one scan, one
  // shuffle of grouped partials, nothing resembling the wide shape
  // ever materializes per-row.
  private def q155(s: SparkSession, d: String): DataFrame = {
    val wide = lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity").cast(DecimalType(14, 2))).cast("double"))
    wide.unpivot(Array(col("l_returnflag")), Array(col("F"), col("O")),
        "l_linestatus", "sum_qty")
      .filter(col("sum_qty").isNotNull)
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q155Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // q158 — rank-trimmed robust mean: per-group mean of the middle 80%
  // (drop the lowest and highest ⌊n/10⌋ rows under a deterministic
  // total order — value, then the unique (orderkey, linenumber) pair).
  // Rank-based trimming is the outlier-robust aggregate a metrics
  // pipeline wants when a handful of corrupt rows would drag a plain
  // mean; unlike percentile interpolation it is integer-exact, so the
  // only float op is the final single division of an exact DECIMAL sum
  // (the q01 dsum discipline). Ranks come from rankDistributed (range
  // partition + broadcast carry) — a billion-row group never sits in
  // one window partition; the per-group counts are a group-cardinality
  // broadcast.
  private def q158(s: SparkSession, d: String): DataFrame = {
    // Domain-collapsed form (optimization round 17): the summed column
    // IS the ordered column, so rows with equal l_quantity are
    // interchangeable under the (quantity, orderkey, linenumber) total
    // order — the kept multiset of quantity values, and therefore the
    // trimmed sum, depends only on the per-(flag, quantity) COUNTS.
    // l_quantity is integral 1..50 by the TPC-H spec at every scale
    // factor, so the collapsed frame is ≤ |flags|·50 rows at 100 TB —
    // the per-flag window below is domain-bounded, not data-sized
    // (verified: 50 distinct values at sf0.1). This replaces a full
    // rank pass (range exchange + carry over every row) with one
    // map-side-combined aggregate; per-value kept counts come from the
    // overlap of each value's rank interval with the two trim windows.
    val cw = lineitem(s, d).select(col("l_returnflag"), col("l_quantity"))
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("l_returnflag"))
    cw.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n", sum(col("c")).over(wTot))
      // rows of this value occupy ranks (cum-c, cum]; drop the overlap
      // with the bottom lo = n DIV 10 ranks and the top lo ranks —
      // the two trim intervals are disjoint (2·lo ≤ n), so kept ≥ 0
      .withColumn("kept",
        col("c") -
          greatest(lit(0L), least(expr("n DIV 10") - (col("cum") - col("c")), col("c"))) -
          greatest(lit(0L), least(expr("n DIV 10") - (col("n") - col("cum")), col("c"))))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("kept")).as("n_kept"),
        (sum(col("l_quantity").cast(DecimalType(14, 2)) * col("kept")).cast("double") /
          sum(col("kept"))).as("trimmed_mean"))
      .orderBy(col("l_returnflag"))
  }

  private val q158Sql =
    """WITH r AS (
      |  SELECT l_returnflag, l_quantity,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rk,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem)
      |SELECT l_returnflag, count(*) AS n_kept,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / count(*)
      |    AS trimmed_mean
      |FROM r WHERE rk > n // 10 AND rk <= n - n // 10
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // q160 — per-group OLS trend (closed-form linear regression): the
  // revenue-per-day slope for each order priority, computed entirely
  // from the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) of one
  // map-side-combined aggregation pass — the canonical "reduce a model
  // fit to sums" pattern that makes regression free at 100 TB (no
  // iteration, no per-group data movement beyond the 5-number
  // partials). All arithmetic is integer: x = days since 1992-01-01,
  // y = cents (through the DECIMAL bridge — never a double→int cast),
  // the cross sums accumulate in DECIMAL(38,0) (HUGEINT in the
  // oracle), and the slope ships as cents/day in 2^20 fixed point via
  // one integer DIV — bit-equal across engines, negative slopes
  // included (Spark DIV and DuckDB // both truncate toward zero).
  val TrendScale = 1048576L // 2^20

  private def q160(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority"),
      datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")).cast("long").as("x"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("yc"))
    o.groupBy(col("o_orderpriority")).agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("yc").cast(DecimalType(38, 0))).as("sy"),
        // per-row products fit a long comfortably (x ≤ ~2.5k days,
        // yc ≤ ~6·10^7 cents); the SUM is what needs 38 digits
        sum((col("x") * col("yc")).cast(DecimalType(38, 0))).as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxx"))
      .select(col("o_orderpriority"), col("n"),
        expr(s"""CAST((CAST(n AS DECIMAL(38,0)) * sxy
                |  - CAST(sx AS DECIMAL(38,0)) * sy) * $TrendScale
                |  DIV (CAST(n AS DECIMAL(38,0)) * sxx
                |  - CAST(sx AS DECIMAL(38,0)) * sx) AS BIGINT)""".stripMargin)
          .as("slope_fp"))
      .orderBy(col("o_orderpriority"))
  }

  private val q160Sql =
    s"""WITH o AS (
      |  SELECT o_orderpriority,
      |    date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS yc
      |  FROM orders),
      |a AS (
      |  SELECT o_orderpriority, count(*) AS n, sum(x) AS sx, sum(yc) AS sy,
      |    sum(x * yc) AS sxy, sum(x * x) AS sxx
      |  FROM o GROUP BY o_orderpriority)
      |SELECT o_orderpriority, n,
      |  CAST((n * sxy - sx * sy) * $TrendScale
      |    // (n * sxx - sx * sx) AS BIGINT) AS slope_fp
      |FROM a ORDER BY o_orderpriority""".stripMargin

  // q170 — distributed exact discrete percentiles: the value at rank
  // ⌈p·n⌉ under a deterministic total order, per group. q57's
  // `percentile` UDAF is exact but buffers every group member in one
  // aggregation buffer — fine for dims, a straggler-OOM at 100 TB
  // groups; this form ranks through rankDistributed (range partition +
  // carry broadcast), joins the group-cardinality broadcast, and
  // keeps only the two rows per group whose rank hits a target — no
  // value array ever materializes anywhere. No interpolation: the
  // emitted number is a real row's value, bit-identical by
  // construction (the oracle replays the same rank arithmetic rather
  // than trusting quantile_disc's convention).
  private def q170(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderpriority"), col("o_totalprice"),
      col("o_orderkey"))
    // per-group counts ride on the ranked rows as a column (r18 fused
    // operator) — no broadcast join
    val ranked = Sampling.rankDistributedWithCounts(o,
      Seq("o_orderpriority"),
      Seq(col("o_totalprice"), col("o_orderkey")), "n")
    ranked
      .filter(col("rk") === expr("(n + 1) DIV 2") ||
        col("rk") === expr("(9 * n + 9) DIV 10"))
      .groupBy(col("o_orderpriority"))
      .agg(
        max(when(col("rk") === expr("(n + 1) DIV 2"), col("o_totalprice")))
          .as("p50_disc"),
        max(when(col("rk") === expr("(9 * n + 9) DIV 10"), col("o_totalprice")))
          .as("p90_disc"),
        max(col("n")).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  private val q170Sql =
    """WITH r AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey) AS rk,
      |    count(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders)
      |SELECT o_orderpriority,
      |  max(CASE WHEN rk = (n + 1) // 2 THEN o_totalprice END) AS p50_disc,
      |  max(CASE WHEN rk = (9 * n + 9) // 10 THEN o_totalprice END) AS p90_disc,
      |  CAST(max(n) AS BIGINT) AS n
      |FROM r WHERE rk = (n + 1) // 2 OR rk = (9 * n + 9) // 10
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q188 — robust outlier gate (median / MAD): per event type, the
  // exact lower median of `value`, the median absolute deviation, and
  // the count past the classic 3·MAD fence — the robust analogue of
  // z-scoring that a heavy-tailed metric needs (mean/stddev fences
  // move with the outliers they should catch; the median/MAD pair
  // does not). Both medians are SELECTED (rank ⌈(n+1)/2⌉ under a
  // total order, the q170 machinery — rankDistributed + broadcast
  // cardinalities, no buffering UDAF, no interpolation), so every
  // emitted number is a real row's value or an exact |difference| of
  // two — bit-identical across engines with no float accumulation.
  //
  // Scale shape: two rank passes (range exchange + carry) and two
  // per-type aggregates; the only broadcasts are |event types|-sized.
  private def q188(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("event_type"), col("event_id"), col("value"))
    // per-type counts ride on the ranked rows as a column (r18 fused
    // operator); med (|event types| rows) carries n forward for the
    // second rank pass
    val r1 = Sampling.rankDistributedWithCounts(e, Seq("event_type"),
      Seq(col("value"), col("event_id")), "n")
    val med = r1
      .filter(col("rk") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("value").as("median"), col("n"))
    val dev = e.join(broadcast(med.select(col("event_type"), col("median"))),
        Seq("event_type"))
      .select(col("event_type"), col("event_id"),
        abs(col("value") - col("median")).as("dev"))
    val r2 = Sampling.rankDistributed(dev, Seq("event_type"),
      Seq(col("dev"), col("event_id")))
    val mad = r2.join(broadcast(med.select(col("event_type"), col("n"))),
        Seq("event_type"))
      .filter(col("rk") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), col("dev").as("mad"))
    val outl = dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("dev") > col("mad") * 3, 1L).otherwise(0L))
        .as("n_outliers"))
    med.join(mad, Seq("event_type")).join(outl, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_events"), col("median"),
        col("mad"), col("n_outliers"))
      .orderBy(col("event_type"))
  }

  private val q188Sql =
    """WITH e AS (
      |  SELECT event_type, event_id, value FROM events),
      |r1 AS (
      |  SELECT event_type, event_id, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM e),
      |med AS (SELECT event_type, value AS median, n FROM r1
      |  WHERE rk = (n + 1) // 2),
      |dev AS (
      |  SELECT e.event_type, e.event_id, abs(e.value - m.median) AS dev
      |  FROM e JOIN med m USING (event_type)),
      |r2 AS (
      |  SELECT event_type, dev,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY dev, event_id) AS rk,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev),
      |mad AS (SELECT event_type, dev AS mad FROM r2 WHERE rk = (n + 1) // 2),
      |o AS (
      |  SELECT d.event_type,
      |    sum(CASE WHEN d.dev > m.mad * 3 THEN 1 ELSE 0 END) AS n_outliers
      |  FROM dev d JOIN mad m USING (event_type) GROUP BY 1)
      |SELECT med.event_type, CAST(med.n AS BIGINT) AS n_events, med.median,
      |  mad.mad, CAST(o.n_outliers AS BIGINT) AS n_outliers
      |FROM med JOIN mad USING (event_type) JOIN o USING (event_type)
      |ORDER BY event_type""".stripMargin

  // q221 — weighted median (per group): the quantity-weighted median
  // unit price per return flag — "the price at which half the UNITS
  // moved", the volume-weighted location statistic a plain median of
  // rows (q57/q170) gets wrong whenever line sizes vary. Exact
  // integers: prices on the cent grid, quantities integral; the
  // median is the smallest price whose cumulative weight reaches half
  // the total (2·cum ≥ W — no halving division, no interpolation).
  //
  // Scale shape: rows collapse to a (flag, cents) weight frame
  // (values-sized); the weighted cumulative runs as the q44/q194
  // distributed prefix — range exchange on (flag, cents), per-physical-
  // partition window, cluster-sized carry broadcast — never a
  // per-flag single-partition sort window (a popular flag would
  // serialize at corpus scale). The pick is a flags-sized min.
  private def q221(s: SparkSession, d: String): DataFrame = {
    val cw = lineitem(s, d)
      .select(col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .groupBy(col("flag"), col("cents")).agg(sum(col("qty")).as("w"))
    // the generic carry machinery (single-pass fused operator since
    // r18): one range exchange, and wtot rides on every row as a
    // column — no totals broadcast join, no re-run of the cw aggregate
    val cum = graft.ops.PrefixSum.prefixSumWithTotal(
      cw, Seq("flag"), Seq(col("cents")), col("w"), "wtot")
    cum
      .filter(col("cum") * 2 >= col("wtot"))
      .groupBy(col("flag"))
      .agg(max(col("wtot")).as("total_units"), min(col("cents")).as("median_cents"))
      .orderBy(col("flag"))
  }

  private val q221Sql =
    """WITH cw AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (
      |  SELECT flag, cents, w,
      |    sum(w) OVER (PARTITION BY flag ORDER BY cents
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(w) OVER (PARTITION BY flag) AS wtot
      |  FROM cw)
      |SELECT flag, CAST(max(wtot) AS BIGINT) AS total_units,
      |  min(cents) AS median_cents
      |FROM c WHERE cum * 2 >= wtot
      |GROUP BY flag
      |ORDER BY flag""".stripMargin

  // q227 — ABC / Pareto contribution classes: parts ranked by revenue,
  // classified A (first parts covering ≤ 80% of cumulative revenue),
  // B (to 95%), C (tail) — the 80/20 inventory-analysis operator every
  // BI layer ships. Exact: revenue in cents (q01 grid), the cumulative
  // runs as the q221 range-exchange + carry prefix over the
  // parts-sized frame (never a single-partition sort of all parts),
  // class bounds as integer cross-multiplications (5·cum ≤ 4·tot for
  // the 80% line — no percent doubles). Report is the 3-row class
  // summary with exact revenue mass and 2^20 share.
  private def q227(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .groupBy(col("l_partkey").as("part"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    // the generic single-pass carry operator (r18): one range exchange
    // replaces the inline checkpoint + window + carry join, and tot
    // rides on every row as the totals column instead of re-running
    // the rev aggregate for a 1-row cross join
    graft.ops.PrefixSum.prefixSumWithTotal(rev, Seq.empty,
        Seq(col("cents").desc, col("part")), col("cents"), "tot")
      .withColumn("cls",
        when(col("cum") * 5 <= col("tot") * 4, "A")
          .when(col("cum") * 20 <= col("tot") * 19, "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("revenue_cents"),
        max(col("tot")).as("tot"))
      .select(col("cls"), col("n_parts"), col("revenue_cents"),
        expr("CAST(CAST(revenue_cents AS DECIMAL(38,0)) * 1048576 DIV tot AS BIGINT)")
          .as("share_fp"))
      .orderBy(col("cls"))
  }

  private val q227Sql =
    """WITH rev AS (
      |  SELECT l_partkey AS part,
      |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(sum(cents) AS BIGINT) AS tot FROM rev),
      |c AS (
      |  SELECT part, cents,
      |    sum(cents) OVER (ORDER BY cents DESC, part
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM rev),
      |k AS (
      |  SELECT CASE WHEN cum * 5 <= tot * 4 THEN 'A'
      |              WHEN cum * 20 <= tot * 19 THEN 'B'
      |              ELSE 'C' END AS cls,
      |    cents, tot
      |  FROM c, t)
      |SELECT cls, count(*) AS n_parts,
      |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
      |  CAST(CAST(sum(cents) AS HUGEINT) * 1048576 // max(tot) AS BIGINT)
      |    AS share_fp
      |FROM k GROUP BY cls
      |ORDER BY cls""".stripMargin

  /** q231 — interval-overlap self-join over user sessions: which user
    * PAIRS are online together, for how long, and how often — the
    * co-presence primitive behind social-graph inference, fraud rings
    * (always-concurrent accounts), and capacity attribution. Sessions
    * come from the shared 30-min-gap sessionizer
    * ([[EventWindows.sessionize]]); two sessions of DIFFERENT users
    * overlap when the closed intervals touch
    * (a.start ≤ b.end ∧ b.start ≤ a.end), and the pair contributes
    * `min(end) − max(start)` ms of co-presence.
    *
    * Scale shape: a naive interval join is |sessions|² — instead each
    * session explodes into the [[OvBucketMs]]-wide time slices it
    * covers (bounded by duration/W + 1 rows) and the pair join becomes
    * an EQUI-join on the slice key, so Spark plans a shuffled hash
    * join whose per-task work is (sessions concurrent in one slice)²
    * — the sweep-width bound, not the corpus bound (1-hour slices:
    * 30-min-gap sessions are mostly sub-hour, so a session lands in
    * 1-2 slices while per-slice concurrency stays ~sessions/hour —
    * day-wide slices measured 4× slower here from the d² blowup). A
    * pair spanning
    * multiple slices is counted ONCE by the standard overlap-start
    * dedup: only the slice containing max(start_a, start_b) emits the
    * pair (no distinct needed, no double counting). Output is bounded
    * to the top [[OvTopK]] pairs by co-presence via
    * TakeOrderedAndProject.
    */
  val OvBucketMs = 3600000L // 1-hour slices
  val OvTopK = 100

  /** Core: top-K co-presence pairs over a (user_id, st, en) interval
    * frame via time-slice blocking. Fixture-testable.
    */
  private[graft] def sessionOverlapOf(
      sess: DataFrame, bucketMs: Long, topK: Int): DataFrame = {
    val sliced = sess.withColumn("bucket",
        explode(sequence(expr(s"st div $bucketMs"), expr(s"en div $bucketMs"))))
      .localCheckpoint(false) // one sessionize feeds both join sides
    // bucket equality needs no sort order — hash join per slice
    val pairs = sliced.as("a").hint("shuffle_hash").join(sliced.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.user_id") < col("b.user_id") &&
          col("a.st") <= col("b.en") && col("b.st") <= col("a.en") &&
          col("a.bucket") === expr(s"greatest(a.st, b.st) div $bucketMs"))
      .select(col("a.user_id").as("user_a"), col("b.user_id").as("user_b"),
        (least(col("a.en"), col("b.en")) - greatest(col("a.st"), col("b.st")))
          .as("ov"))
    pairs.groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"), sum(col("ov")).as("overlap_ms"))
      .orderBy(col("overlap_ms").desc, col("user_a"), col("user_b"))
      .limit(topK)
  }

  private def q231(s: SparkSession, d: String): DataFrame =
    sessionOverlapOf(
      EventWindows.sessionize(events(s, d))
        .select(col("user_id"), col("session_start").as("st"),
          (col("session_start") + col("duration_ms")).as("en")),
      OvBucketMs, OvTopK)

  private val q231Sql =
    s"""WITH t AS (
      |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
      |    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ms(ts), event_id) AS prev_ms
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts_ms,
      |    CASE WHEN prev_ms IS NULL OR ts_ms - prev_ms > 1800000
      |      THEN 1 ELSE 0 END AS ns
      |  FROM t),
      |sess AS (
      |  SELECT user_id, min(ts_ms) AS st, max(ts_ms) AS en
      |  FROM (SELECT user_id, ts_ms,
      |      sum(ns) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |    FROM f) g
      |  GROUP BY user_id, sid),
      |p AS (
      |  SELECT a.user_id AS user_a, b.user_id AS user_b,
      |    least(a.en, b.en) - greatest(a.st, b.st) AS ov
      |  FROM sess a JOIN sess b
      |    ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en)
      |SELECT user_a, user_b, count(*) AS n_overlaps,
      |  CAST(sum(ov) AS BIGINT) AS overlap_ms
      |FROM p GROUP BY user_a, user_b
      |ORDER BY overlap_ms DESC, user_a, user_b LIMIT $OvTopK""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q153_skyline", q153, Some(q153Sql)),
    Q("q154_peak_concurrency", q154, Some(q154Sql)),
    Q("q155_pivot_unpivot", q155, Some(q155Sql)),
    Q("q158_trimmed_mean", q158, Some(q158Sql)),
    Q("q160_trend_regression", q160, Some(q160Sql)),
    Q("q170_percentile_rank", q170, Some(q170Sql)),
    Q("q188_mad_outliers", q188, Some(q188Sql)),
    Q("q221_weighted_median", q221, Some(q221Sql)),
    Q("q227_abc_pareto", q227, Some(q227Sql)),
    Q("q231_session_overlap", q231, Some(q231Sql)),
  )
}
