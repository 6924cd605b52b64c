package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Time-series signal statistics over the event log: cross-type
  * covariance and lag-1 autocovariance on the dense hourly grid.
  * Correlation-style analytics reduce to exact integer sufficient
  * statistics (the q160 discipline): the engines only ever exchange
  * and compare integers, and anything involving a square root (the
  * normalized coefficients) is left to the consumer, who divides two
  * exact numbers however they like.
  */
object Signals {

  // q162 — click↔purchase co-movement: hourly counts of the two event
  // types on the DENSE hour grid (zero-filled via an exploded
  // sequence between the global min/max hour — absent hours are real
  // zeros, not missing rows), then one aggregation pass yields the
  // covariance numerator n·Σxy − Σx·Σy, both variance numerators, and
  // the lag-1 autocovariance numerator of the click series (pairs
  // joined hr→hr+1 — a key-equi self-join, never a global-order
  // window). All sums accumulate in DECIMAL(38,0)/HUGEINT.
  //
  // Scale shape: the raw scan aggregates to per-hour counts first
  // (map-side combined, output is hours-sized, not events-sized); the
  // grid explode is a 1-row broadcast source; the lag join shuffles
  // the hours frame on the hour key.
  /** Core: the q162 statistics over a sparse (hr, x, y) count frame —
    * zero-fills the dense [min hr, max hr] grid, then emits the one-row
    * (n_hours, cov_num, varx_num, vary_num, lag1_num) frame.
    * Fixture-testable.
    */
  private[graft] def signalStatsOf(counts: DataFrame): DataFrame = {
    val bounds = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
    val xy = grid.join(counts, Seq("hr"), "left")
      .select(col("hr"),
        coalesce(col("x"), lit(0L)).as("x"), coalesce(col("y"), lit(0L)).as("y"))
    val base = xy.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      // cast ONE operand before the multiply so the product itself is
      // computed in decimal — x*y in LongType first would overflow
      // before the cast and forfeit the DECIMAL(38,0) headroom
      sum(col("x").cast(DecimalType(38, 0)) * col("y")).as("sxy"),
      sum(col("x").cast(DecimalType(38, 0)) * col("x")).as("sxx"),
      sum(col("y").cast(DecimalType(38, 0)) * col("y")).as("syy"),
      min(struct(col("hr"), col("x"))).as("fst"),
      max(struct(col("hr"), col("x"))).as("lst"))
    val lag = xy.select(col("hr"), col("x"))
      .join(xy.select((col("hr") - 1).as("hr"), col("x").as("xn")), Seq("hr"))
      .agg(coalesce(sum(col("x").cast(DecimalType(38, 0)) * col("xn")),
        lit(0).cast(DecimalType(38, 0))).as("sll"))
    base.crossJoin(lag).select(
      col("n").as("n_hours"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
        .as("cov_num"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
        .as("varx_num"),
      expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
        .as("vary_num"),
      expr("""CAST(CAST(n - 1 AS DECIMAL(38,0)) * sll
             |  - CAST(sx - lst.x AS DECIMAL(38,0)) * (sx - fst.x) AS BIGINT)"""
        .stripMargin).as("lag1_num"))
  }

  private def q162(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
    signalStatsOf(ev.groupBy(col("hr")).agg(
      sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
      sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y")))
  }

  private val q162Sql =
    """WITH ev AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, event_type FROM events
      |  WHERE event_type IN ('click', 'purchase')),
      |c AS (
      |  SELECT hr,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      |  FROM ev GROUP BY hr),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM b),
      |xy AS (
      |  SELECT g.hr, CAST(coalesce(c.x, 0) AS BIGINT) AS x,
      |    CAST(coalesce(c.y, 0) AS BIGINT) AS y
      |  FROM g LEFT JOIN c ON g.hr = c.hr),
      |base AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy,
      |    arg_min(x, hr) AS x_first, arg_max(x, hr) AS x_last
      |  FROM xy),
      |lag AS (
      |  SELECT coalesce(sum(a.x * b2.x), 0) AS sll
      |  FROM xy a JOIN xy b2 ON b2.hr = a.hr + 1)
      |SELECT n AS n_hours,
      |  CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
      |  CAST(n * sxx - sx * sx AS BIGINT) AS varx_num,
      |  CAST(n * syy - sy * sy AS BIGINT) AS vary_num,
      |  CAST((n - 1) * sll - (sx - x_last) * (sx - x_first) AS BIGINT) AS lag1_num
      |FROM base, lag""".stripMargin

  // q169 — A/B conversion audit with the exact 2×2 chi-square: users
  // split deterministically by id parity (the seeded-bucket assignment
  // a real experiment platform derives from a hashed unit id — q89's
  // discipline), "converted" = has ≥1 purchase event. Emitted: per-arm
  // user and converter counts, conversion rates in 2^20 fixed point,
  // and the chi-square statistic n·(ad−bc)²/(margins product) in the
  // same fixed point — every operand an exact integer, one staged
  // DECIMAL(38,0) division at the end. (At 10^9-user scale the
  // (ad−bc)² term still fits DECIMAL(38,0); the n· multiplier is the
  // first thing to stage through an extra DIV if units outgrow that.)
  private def q169(s: SparkSession, d: String): DataFrame = {
    // conversion = a big-ticket purchase; a plain "any purchase" is
    // degenerate in this dense synthetic log (every user has one)
    val u = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 80.0, 1L)
        .otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("conv"))
    val cells = u.groupBy(col("arm")).agg(
      count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    // 2x2: a/b = arm-0 conv/non-conv, c/d = arm-1 conv/non-conv
    val wide = cells.agg(
      sum(when(col("arm") === 0, col("n_conv"))).as("a"),
      sum(when(col("arm") === 0, col("n_users") - col("n_conv"))).as("b"),
      sum(when(col("arm") === 1, col("n_conv"))).as("c"),
      sum(when(col("arm") === 1, col("n_users") - col("n_conv"))).as("d"))
    wide.select(
      (col("a") + col("b")).as("n_a"), col("a").as("conv_a"),
      (col("c") + col("d")).as("n_b"), col("c").as("conv_b"),
      expr("CASE WHEN a + b = 0 THEN 0 ELSE a * 1048576 DIV (a + b) END")
        .as("cr_a_fp"),
      expr("CASE WHEN c + d = 0 THEN 0 ELSE c * 1048576 DIV (c + d) END")
        .as("cr_b_fp"),
      // degenerate margins (an empty arm, or all/none converting) make
      // chi-square undefined — report 0 ("no evidence"), same CASE in
      // the oracle
      expr("""CAST(CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0
             |  THEN 0 ELSE
             |  (CAST(a AS DECIMAL(38,0)) + b + c + d)
             |  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
             |  * (CAST(a AS DECIMAL(38,0)) * d - CAST(b AS DECIMAL(38,0)) * c)
             |  * 1048576
             |  DIV ((CAST(a AS DECIMAL(38,0)) + b) * (CAST(c AS DECIMAL(38,0)) + d)
             |    * (CAST(a AS DECIMAL(38,0)) + c) * (CAST(b AS DECIMAL(38,0)) + d))
             |  END AS BIGINT)""".stripMargin).as("chi2_fp"))
  }

  private val q169Sql =
    """WITH u AS (
      |  SELECT user_id % 2 AS arm,
      |    max(CASE WHEN event_type = 'purchase' AND value > 80.0
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT arm, count(*) AS n_users, sum(conv) AS n_conv
      |  FROM u GROUP BY arm),
      |w AS (
      |  SELECT
      |    sum(CASE WHEN arm = 0 THEN n_conv END) AS a,
      |    sum(CASE WHEN arm = 0 THEN n_users - n_conv END) AS b,
      |    sum(CASE WHEN arm = 1 THEN n_conv END) AS c,
      |    sum(CASE WHEN arm = 1 THEN n_users - n_conv END) AS d
      |  FROM cells)
      |SELECT CAST(a + b AS BIGINT) AS n_a, CAST(a AS BIGINT) AS conv_a,
      |  CAST(c + d AS BIGINT) AS n_b, CAST(c AS BIGINT) AS conv_b,
      |  CAST(CASE WHEN a + b = 0 THEN 0
      |    ELSE a * 1048576 // (a + b) END AS BIGINT) AS cr_a_fp,
      |  CAST(CASE WHEN c + d = 0 THEN 0
      |    ELSE c * 1048576 // (c + d) END AS BIGINT) AS cr_b_fp,
      |  CAST(CASE WHEN a + b = 0 OR c + d = 0 OR a + c = 0 OR b + d = 0
      |    THEN 0 ELSE
      |    (a + b + c + d) * (a * d - b * c) * (a * d - b * c) * 1048576
      |    // ((a + b) * (c + d) * (a + c) * (b + d)) END AS BIGINT) AS chi2_fp
      |FROM w""".stripMargin

  // q173 — deterministic online-bootstrap confidence intervals: B = 32
  // resample replicates of the mean order value per priority, with each
  // row's multiplicity in replicate b drawn NOT from an RNG but from
  // TWO bits of a per-row portable md5 hash — Binomial(2, 1/2), mean 1
  // — the online-bootstrap trick that makes resampling a per-row pure
  // function (re-runnable bit-for-bit, mergeable, streamable). The CI
  // is rank-based over the 32 replicate means (2nd and (n−1)th — the
  // ~5th/95th percentile of B = 32), so the only float op anywhere is
  // one IEEE division per (group, replicate).
  //
  // Scale shape: the explode factor is exactly B (the accepted cost of
  // bootstrap at scale; partial aggregation combines (group, b) cells
  // map-side so the shuffle is |groups|·B rows); the rank window runs
  // over B = 32 rows per group, a constant. Hashing is per ROW, not
  // per (row, replicate): two 60-bit hashes supply 60 bit-pairs, and
  // each replicate reads its own pair with codegen shift/mask — the
  // md5 count drops B-fold (measured 6.2 → 2.1 s at sf0.1).
  private val BootReps = 32

  private def q173(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFns.hash60
    val o = orders(s, d).select(col("o_orderpriority").as("pri"),
      col("o_orderkey").as("k"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)").as("yc"))
    // replicate b's two multiplicity bits: pair b of hA for b < 30,
    // pair (b - 30) of hB above. r18: the ×B explode is gone — each
    // replicate's (count, weighted sum) is one CONDITIONAL aggregate
    // pair over the single scan (64 map-side-combined sums; b is a
    // literal per aggregate, so the bit arithmetic is constant-folded
    // codegen), and the point-estimate scan folds into the same
    // aggregate instead of a second pass + join. The |pri|-row result
    // unpivots via stack() into the identical (pri, b, n_b, s_b) cells.
    def multExpr(b: Int): String =
      if (b < 30)
        s"(shiftright(hA, ${2 * b}) % 2) + (shiftright(hA, ${2 * b + 1}) % 2)"
      else
        s"(shiftright(hB, ${2 * (b - 30)}) % 2) + (shiftright(hB, ${2 * (b - 30) + 1}) % 2)"
    val aggCols = (0 until BootReps).flatMap { b =>
      Seq(expr(s"sum(${multExpr(b)})").as(s"n_$b"),
        expr(s"sum(CAST(${multExpr(b)} AS DECIMAL(38,0)) * yc)").as(s"s_$b"))
    } ++ Seq(count(lit(1)).as("n_orders"),
      (sum(col("yc").cast(DecimalType(38, 0))).cast("double") /
        count(lit(1))).as("mean_cents"))
    val cells = o
      .withColumn("hA", hash60(concat(lit("bootA:"), col("k").cast("string"))))
      .withColumn("hB", hash60(concat(lit("bootB:"), col("k").cast("string"))))
      .groupBy(col("pri"))
      .agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = (0 until BootReps).map(b => s"$b, n_$b, s_$b").mkString(", ")
    val reps = cells
      .selectExpr("pri", "n_orders", "mean_cents",
        s"stack($BootReps, $stackArgs) AS (b, n_b, s_b)")
      .filter(col("n_b") > 0)
      .withColumn("mean_b", col("s_b").cast("double") / col("n_b").cast("double"))
    val w = Window.partitionBy(col("pri")) // B = 32 rows per group
    val wr = w.orderBy(col("mean_b"), col("b"))
    reps
      .withColumn("rk", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(w))
      .groupBy(col("pri"))
      .agg(max(col("n_orders")).as("n_orders"),
        max(col("mean_cents")).as("mean_cents"),
        max(when(col("rk") === 2, col("mean_b"))).as("ci_lo_cents"),
        max(when(col("rk") === col("cnt") - 1, col("mean_b"))).as("ci_hi_cents"),
        count(lit(1)).as("n_reps"))
      .select(col("pri").as("o_orderpriority"), col("n_orders"),
        col("mean_cents"), col("ci_lo_cents"), col("ci_hi_cents"),
        col("n_reps"))
      .orderBy(col("o_orderpriority"))
  }

  private val q173Sql = {
    val hA = graft.functions.TextFns.hash60Sql("'bootA:' || k")
    val hB = graft.functions.TextFns.hash60Sql("'bootB:' || k")
    val m = """CASE WHEN b < 30
      |      THEN ((hA >> CAST(2 * b AS INT)) % 2)
      |        + ((hA >> CAST(2 * b + 1 AS INT)) % 2)
      |      ELSE ((hB >> CAST(2 * (b - 30) AS INT)) % 2)
      |        + ((hB >> CAST(2 * (b - 30) + 1 AS INT)) % 2) END""".stripMargin
    s"""WITH o AS (
      |  SELECT o_orderpriority AS pri, o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS yc
      |  FROM orders),
      |pt AS (
      |  SELECT pri, count(*) AS n_orders,
      |    CAST(sum(yc) AS DOUBLE) / count(*) AS mean_cents
      |  FROM o GROUP BY pri),
      |oh AS (SELECT pri, yc, $hA AS hA, $hB AS hB FROM o),
      |e AS (SELECT pri, yc, hA, hB, unnest(range($BootReps)) AS b FROM oh),
      |r AS (
      |  SELECT pri, b, sum($m) AS n_b, sum(($m) * yc) AS s_b
      |  FROM e GROUP BY pri, b),
      |rm AS (
      |  SELECT pri, b, CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mean_b,
      |    row_number() OVER (PARTITION BY pri ORDER BY
      |      CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), b) AS rk,
      |    count(*) OVER (PARTITION BY pri) AS cnt
      |  FROM r WHERE n_b > 0),
      |ci AS (
      |  SELECT pri,
      |    max(CASE WHEN rk = 2 THEN mean_b END) AS ci_lo_cents,
      |    max(CASE WHEN rk = cnt - 1 THEN mean_b END) AS ci_hi_cents,
      |    count(*) AS n_reps
      |  FROM rm GROUP BY pri)
      |SELECT pri AS o_orderpriority, n_orders, mean_cents,
      |  ci_lo_cents, ci_hi_cents, n_reps
      |FROM pt JOIN ci USING (pri)
      |ORDER BY o_orderpriority""".stripMargin
  }

  // q174 — randomization test for the q169 conversion difference: the
  // observed |rate_A − rate_B| compared against B = 32 deterministic
  // re-randomizations (each user's pseudo-arm in replicate p is a bit
  // of the portable md5 hash of 'perm' || p || ':' || user_id — the
  // Bernoulli-reassignment randomization test, the resampling
  // counterpart of q169's parametric chi-square). p-value = share of
  // replicates whose diff reaches the observed one, in 2^20 fixed
  // point; rates are fixed-point integers, so every comparison is
  // exact. Same scale shape as q173: one users-sized frame exploded
  // B ways into a (replicate, pseudo-arm) aggregate — |B|·2 cells.
  private val PermReps = 32

  private def q174(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TextFns.hash60
    val u = events(s, d)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 80.0, 1L)
        .otherwise(0L)).as("conv"))
    // |cA·2^20 DIV nA − cB·2^20 DIV nB| over the (ca, na, cb, nb) cells
    def diffFp(): Column =
      abs(expr("CASE WHEN na = 0 THEN 0 ELSE ca * 1048576 DIV na END") -
        expr("CASE WHEN nb = 0 THEN 0 ELSE cb * 1048576 DIV nb END"))
    val obs = u.select(pmod(col("user_id"), lit(2)).as("arm"), col("conv"))
      .agg(sum(when(col("arm") === 0, col("conv"))).as("ca"),
        sum(when(col("arm") === 0, 1L)).as("na"),
        sum(when(col("arm") === 1, col("conv"))).as("cb"),
        sum(when(col("arm") === 1, 1L)).as("nb"))
      .select((col("na") + col("nb")).as("n_users"),
        diffFp().as("obs_diff_fp"))
    val perms = u
      .select(col("user_id"), col("conv"),
        explode(sequence(lit(0), lit(PermReps - 1))).as("p"))
      .withColumn("parm", pmod(hash60(concat(lit("perm"),
        col("p").cast("string"), lit(":"), col("user_id").cast("string"))),
        lit(2)))
      .groupBy(col("p"))
      .agg(sum(when(col("parm") === 0, col("conv"))).as("ca"),
        sum(when(col("parm") === 0, 1L)).as("na"),
        sum(when(col("parm") === 1, col("conv"))).as("cb"),
        sum(when(col("parm") === 1, 1L)).as("nb"))
      .select(col("p"), diffFp().as("diff_fp"))
    perms.crossJoin(broadcast(obs))
      .agg(max(col("n_users")).as("n_users"),
        max(col("obs_diff_fp")).as("obs_diff_fp"),
        sum(when(col("diff_fp") >= col("obs_diff_fp"), 1L).otherwise(0L))
          .as("n_ge"),
        count(lit(1)).as("n_perms"))
      .withColumn("p_value_fp", expr("n_ge * 1048576 DIV n_perms"))
  }

  private val q174Sql = {
    val hv = graft.functions.TextFns
      .hash60Sql("'perm' || p || ':' || user_id")
    s"""WITH u AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'purchase' AND value > 80.0
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |obs0 AS (
      |  SELECT sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS ca,
      |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS na,
      |    sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS cb,
      |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS nb
      |  FROM u),
      |obs AS (
      |  SELECT CAST(na + nb AS BIGINT) AS n_users,
      |    abs(CASE WHEN na = 0 THEN 0 ELSE ca * 1048576 // na END
      |      - CASE WHEN nb = 0 THEN 0 ELSE cb * 1048576 // nb END)
      |      AS obs_diff_fp
      |  FROM obs0),
      |e AS (SELECT user_id, conv, unnest(range($PermReps)) AS p FROM u),
      |pa AS (SELECT p, conv, $hv % 2 AS parm FROM e),
      |r AS (
      |  SELECT p,
      |    abs(CASE WHEN sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END) = 0 THEN 0
      |      ELSE sum(CASE WHEN parm = 0 THEN conv ELSE 0 END) * 1048576
      |        // sum(CASE WHEN parm = 0 THEN 1 ELSE 0 END) END
      |      - CASE WHEN sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END) = 0 THEN 0
      |      ELSE sum(CASE WHEN parm = 1 THEN conv ELSE 0 END) * 1048576
      |        // sum(CASE WHEN parm = 1 THEN 1 ELSE 0 END) END) AS diff_fp
      |  FROM pa GROUP BY p)
      |SELECT n_users, CAST(obs_diff_fp AS BIGINT) AS obs_diff_fp,
      |  CAST(sum(CASE WHEN diff_fp >= obs_diff_fp THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_ge,
      |  count(*) AS n_perms,
      |  CAST(sum(CASE WHEN diff_fp >= obs_diff_fp THEN 1 ELSE 0 END)
      |    * 1048576 // count(*) AS BIGINT) AS p_value_fp
      |FROM r, obs
      |GROUP BY n_users, obs_diff_fp""".stripMargin
  }

  // q179 — weekly seasonality profile: the (day-of-week × hour-of-day)
  // activity heatmap with each cell's share of its day in 2^20 fixed
  // point and a peak flag — the baseline every anomaly detector and
  // capacity plan is drawn against. Day/hour come from epoch-ms
  // integer arithmetic ((ts_ms DIV 86400000 + 4) % 7 — the epoch was a
  // Thursday — and ts_ms DIV 3600000 % 24), so no calendar/timezone
  // machinery is consulted in either engine. One scan, a 168-cell
  // aggregate, per-day shares off a 7-row broadcast.
  /** Batch seasonality profile over any frame with a `ts_ms` column —
    * the q179 body, factored so the streaming twin's spec can pin its
    * converged cells against the same arithmetic on the same rows.
    */
  private[graft] def seasonalityOf(ev: DataFrame): DataFrame = {
    val cells = ev
      .select(expr("(ts_ms div 86400000 + 4) % 7").as("dow"),
        expr("(ts_ms div 3600000) % 24").as("hod"))
      .groupBy(col("dow"), col("hod")).agg(count(lit(1)).as("n_events"))
    val dayTotals = cells.groupBy(col("dow")).agg(sum(col("n_events")).as("day_n"),
      max(col("n_events")).as("day_max"))
    cells.join(broadcast(dayTotals), Seq("dow"))
      .select(col("dow"), col("hod"), col("n_events"),
        expr("n_events * 1048576 DIV day_n").as("share_fp"),
        (col("n_events") === col("day_max")).as("is_day_peak"))
      .orderBy(col("dow"), col("hod"))
  }

  private def q179(s: SparkSession, d: String): DataFrame =
    seasonalityOf(events(s, d))

  private val q179Sql =
    """WITH c AS (
      |  SELECT (epoch_ms(ts) // 86400000 + 4) % 7 AS dow,
      |    (epoch_ms(ts) // 3600000) % 24 AS hod, count(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |d AS (SELECT dow, sum(n_events) AS day_n, max(n_events) AS day_max
      |      FROM c GROUP BY dow)
      |SELECT c.dow, c.hod, c.n_events,
      |  CAST(c.n_events * 1048576 // d.day_n AS BIGINT) AS share_fp,
      |  c.n_events = d.day_max AS is_day_peak
      |FROM c JOIN d USING (dow)
      |ORDER BY dow, hod""".stripMargin

  // q184 — seasonality-adjusted anomaly report: the top-20 absolute
  // hours whose event count deviates most from their (day-of-week ×
  // hour-of-day) seasonal baseline — the alarm q179's profile exists
  // to feed. The hour grid is DENSE (q162's explode between global
  // min/max hour), so silent hours score against a busy cell's
  // baseline instead of being invisible — the outage case a
  // sparse-only join misses. Expected counts are cell_total·2^20 DIV
  // n_slots (exact integers; DECIMAL/HUGEINT headroom for 100 TB cell
  // totals), the score is |n·2^20 − expected_fp|, and the top-20 cut
  // orders by the total (score desc, hr) key, planning as
  // TakeOrdered over the hours-sized frame — nothing events-sized
  // survives the first aggregation.
  private val AnomalyTopN = 20

  /** Core of q184 over any frame with `ts_ms` — split out so the spec
    * can pin the silent-hour story on a crafted fixture.
    */
  private[graft] def seasonalAnomaliesOf(ev: DataFrame): DataFrame = {
    val counts = ev
      .select(expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"))
    val slots = grid.join(counts, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("n"), lit(0L)).as("n"),
        expr("(hr div 24 + 4) % 7").as("dow"), expr("hr % 24").as("hod"))
    val cells = slots.groupBy(col("dow"), col("hod"))
      .agg(sum(col("n")).as("cell_total"), count(lit(1)).as("n_slots"))
    slots.join(broadcast(cells), Seq("dow", "hod"))
      .withColumn("expected_fp", expr(
        "CAST(CAST(cell_total AS DECIMAL(38,0)) * 1048576 DIV n_slots AS BIGINT)"))
      .withColumn("score_fp", abs(col("n") * lit(1048576L) - col("expected_fp")))
      .orderBy(col("score_fp").desc, col("hr"))
      .limit(AnomalyTopN)
      .select(col("hr"), col("dow"), col("hod"), col("n").as("n_events"),
        col("expected_fp"), col("score_fp"))
  }

  private def q184(s: SparkSession, d: String): DataFrame =
    seasonalAnomaliesOf(events(s, d))

  // q191 — time-in-state occupancy from SCD-2 style intervals: each
  // user's event stream becomes validity intervals [ts, next_ts) —
  // the type-2 slowly-changing-dimension reconstruction every
  // warehouse runs on a changelog — and the report is the
  // time-weighted state occupancy: total/max milliseconds the user
  // base spent in each event_type state and its share of all tracked
  // time. Open last intervals close at the GLOBAL horizon (max ts),
  // the as-of-now convention, via a 1-row broadcast. Where q108 keeps
  // the latest state and q168 counts transitions, this weights states
  // by DURATION — the missing axis. Exact epoch-ms integers end to
  // end; shares in 2^20 fixed point (DECIMAL/HUGEINT headroom).
  //
  // Scale shape: the lead() window partitions BY USER (bounded
  // per-user state, no global sort); everything after is a
  // |event types|-row aggregate with one 1-row horizon broadcast.
  private def q191(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d).select(col("user_id"), col("event_id"),
      col("event_type"), col("ts_ms"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val horizon = e.agg(max(col("ts_ms")).as("hz"))
    val iv = e.withColumn("next_ts", lead(col("ts_ms"), 1).over(w))
      .crossJoin(broadcast(horizon))
      .select(col("event_type"),
        (coalesce(col("next_ts"), col("hz")) - col("ts_ms")).as("dur"))
    val wT = Window.partitionBy(lit(1))
    iv.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur").cast(DecimalType(38, 0))).as("tot_d"),
        max(col("dur")).as("max_ms"))
      .withColumn("tot", sum(col("tot_d")).over(wT))
      .select(col("event_type"), col("n_intervals"),
        col("tot_d").cast("long").as("total_ms"), col("max_ms"),
        expr("CAST(tot_d * 1048576 DIV tot AS BIGINT)").as("share_fp"))
      .orderBy(col("event_type"))
  }

  // q193 — exact Mann-Whitney U (rank-sum) test: does the English
  // slice's quality-score distribution stochastically dominate the
  // rest of the corpus? The nonparametric two-sample comparison a
  // fairness/mixture audit runs when means (q158) and variances are
  // not trustworthy — no normality assumption, outlier-immune. All
  // arithmetic is exact: ranks come from rankDistributed over
  // (quality, doc_id); ties take MIDRANKS computed per distinct value
  // as min(rk)+max(rk) (twice the midrank, so everything stays
  // integer); U is reported doubled (u2 = 2U = Σ2·midrank_A −
  // n_a(n_a+1)) plus the bounded common-language effect size
  // AUC = U/(n_a·n_b) in 2^20 fixed point. Sums stage through
  // DECIMAL(38,0)/HUGEINT (rank sums are O(N²)); at extreme corpus
  // sizes the bounded auc_fp is the headline number while u2 is the
  // raw statistic.
  //
  // Scale shape: one rank pass (range exchange + carry), one
  // values-sized midrank aggregate, a 1-row reduction.
  private def q193(s: SparkSession, d: String): DataFrame = {
    val sc = Filtering.qualityScored(documents(s, d))
      .join(documents(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
    val ranked = Sampling.rankDistributed(sc, Seq.empty,
      Seq(col("quality"), col("doc_id")))
    val byValue = ranked.groupBy(col("quality"))
      .agg((min(col("rk")) + max(col("rk"))).as("mr2"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ca"),
        count(lit(1)).as("c"))
    byValue.agg(
        sum(col("ca")).as("n_a"),
        sum(col("c") - col("ca")).as("n_b"),
        sum(col("ca").cast(DecimalType(38, 0)) * col("mr2")).as("r2a"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1) AS BIGINT)")
          .as("u2_a"),
        expr("""CAST((r2a - CAST(n_a AS DECIMAL(38,0)) * (n_a + 1)) * 1048576
               |  DIV (CAST(n_a AS DECIMAL(38,0)) * n_b * 2) AS BIGINT)"""
          .stripMargin).as("auc_fp"))
  }

  private val q193Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, lang, len(toks) AS n_words,
      |    len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, lang, $toks AS toks FROM documents) t0),
      |s AS (
      |  SELECT doc_id, lang,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM t),
      |r AS (
      |  SELECT quality, lang,
      |    row_number() OVER (ORDER BY quality, doc_id) AS rk
      |  FROM s),
      |v AS (
      |  SELECT quality, min(rk) + max(rk) AS mr2,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
      |    count(*) AS c
      |  FROM r GROUP BY quality),
      |a AS (
      |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(c - ca) AS BIGINT) AS n_b,
      |    sum(CAST(ca AS HUGEINT) * mr2) AS r2a
      |  FROM v)
      |SELECT n_a, n_b,
      |  CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS BIGINT) AS u2_a,
      |  CAST((r2a - CAST(n_a AS HUGEINT) * (n_a + 1)) * 1048576
      |    // (CAST(n_a AS HUGEINT) * n_b * 2) AS BIGINT) AS auc_fp
      |FROM a""".stripMargin
  }

  // q194 — exact two-sample Kolmogorov-Smirnov statistic: the maximum
  // CDF gap between the English slice's quality distribution and the
  // rest — THE classic distribution-drift test, the continuous
  // counterpart of q176's bucketed TVD (no ruler to choose: the sup
  // runs over every distinct value). Exact integer form: per distinct
  // quality value, (ca, cb) group counts; cumulative counts via the
  // tokenBudgetOver distributed-prefix pattern (range exchange on the
  // value + per-partition window + broadcast carry — the VALUES frame
  // can approach corpus cardinality for a continuous score, so a
  // single-partition running window would be the classic
  // scale-killer); the gap numerator is |cumA·n_b − cumB·n_a| in
  // DECIMAL(38,0) (exact to N ≈ 10^19), and D ships as
  // d_fp = max·2^20 DIV (n_a·n_b) plus the value where the sup is
  // attained (ties → smallest value).
  private def q194(s: SparkSession, d: String): DataFrame = {
    val sc = Filtering.qualityScored(documents(s, d))
      .join(documents(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
    val v = sc.groupBy(col("quality"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ca"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cb"))
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)
    val parted = v.repartitionByRange(nParts, col("quality"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("quality"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(lit(1)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parted.groupBy(col("__pid"))
      .agg(sum(col("ca")).as("pa"), sum(col("cb")).as("pb"))
      .withColumn("carrya", sum(col("pa")).over(wCarry))
      .withColumn("carryb", sum(col("pb")).over(wCarry))
      .select(col("__pid"), col("carrya"), col("carryb"))
    val tot = v.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    parted
      .withColumn("la", sum(col("ca")).over(wLocal))
      .withColumn("lb", sum(col("cb")).over(wLocal))
      .join(broadcast(carry), Seq("__pid"))
      .withColumn("cuma", col("la") + coalesce(col("carrya"), lit(0L)))
      .withColumn("cumb", col("lb") + coalesce(col("carryb"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("dnum", expr(
        "abs(CAST(cuma AS DECIMAL(38,0)) * n_b - CAST(cumb AS DECIMAL(38,0)) * n_a)"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(struct(col("dnum"), (-col("quality")).as("nq"))).as("m"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(m.dnum * 1048576 DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("d_fp"),
        (-col("m.nq")).as("at_quality"))
  }

  private val q194Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, lang, len(toks) AS n_words,
      |    len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, lang, $toks AS toks FROM documents) t0),
      |s AS (
      |  SELECT doc_id, lang,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM t),
      |v AS (
      |  SELECT quality,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cb
      |  FROM s GROUP BY quality),
      |c AS (
      |  SELECT quality,
      |    sum(ca) OVER (ORDER BY quality
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY quality
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
      |  FROM v),
      |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |  CAST(sum(cb) AS BIGINT) AS n_b FROM v),
      |g AS (
      |  SELECT quality,
      |    abs(CAST(cuma AS HUGEINT) * n_b - CAST(cumb AS HUGEINT) * n_a) AS dnum
      |  FROM c, tt)
      |SELECT tt.n_a, tt.n_b,
      |  CAST((SELECT max(dnum) FROM g) * 1048576
      |    // (CAST(tt.n_a AS HUGEINT) * tt.n_b) AS BIGINT) AS d_fp,
      |  (SELECT quality FROM g ORDER BY dnum DESC, quality LIMIT 1)
      |    AS at_quality
      |FROM tt""".stripMargin
  }

  // q195 — exact Spearman rank correlation between per-document
  // quality and token count: Pearson's sufficient statistics computed
  // on tie-aware DOUBLED midranks (the q193 midrank trick per
  // variable, the q160 integer-numerator discipline for the moments)
  // — the monotone-association audit that answers "does the quality
  // score just measure length?" without assuming linearity. Emitted
  // as exact integer numerators (consumer divides/sqrt's as they
  // like): ρ = cov_num / √(varx_num·vary_num). DECIMAL(38,0) keeps
  // the numerators exact to N ≈ 10^8 docs; past that the production
  // form stages the same sums through scaled DIVs.
  //
  // Scale shape: two rank passes, two values-sized midrank joins, one
  // 1-row reduction.
  private def q195(s: SparkSession, d: String): DataFrame = {
    val sc = Filtering.qualityScored(documents(s, d))
      .join(documents(s, d)
        .select(col("doc_id"), graft.functions.TextFns.tokenCount(col("text")).as("nt")),
        Seq("doc_id"))
    def midranks2(df: DataFrame, v: String, out: String): DataFrame = {
      val ranked = Sampling.rankDistributed(df.select(col("doc_id"), col(v)),
        Seq.empty, Seq(col(v), col("doc_id")))
      val mr = ranked.groupBy(col(v))
        .agg((min(col("rk")) + max(col("rk"))).as(out))
      ranked.join(mr, Seq(v)).select(col("doc_id"), col(out))
    }
    val mx = midranks2(sc, "quality", "mx2")
    val my = midranks2(sc, "nt", "my2")
    mx.join(my, Seq("doc_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("mx2")).as("sx"), sum(col("my2")).as("sy"),
        sum(col("mx2").cast(DecimalType(38, 0)) * col("my2")).as("sxy"),
        sum(col("mx2").cast(DecimalType(38, 0)) * col("mx2")).as("sxx"),
        sum(col("my2").cast(DecimalType(38, 0)) * col("my2")).as("syy"))
      .select(col("n"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("cov_num"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS BIGINT)")
          .as("varx_num"),
        expr("CAST(CAST(n AS DECIMAL(38,0)) * syy - CAST(sy AS DECIMAL(38,0)) * sy AS BIGINT)")
          .as("vary_num"))
  }

  private val q195Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS n_words,
      |    len(list_distinct(toks)) AS n_distinct, len(toks) AS nt
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |s AS (
      |  SELECT doc_id,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality,
      |    CAST(nt AS BIGINT) AS nt
      |  FROM t),
      |rx AS (SELECT doc_id, quality,
      |    row_number() OVER (ORDER BY quality, doc_id) AS rk FROM s),
      |mxv AS (SELECT quality, min(rk) + max(rk) AS mx2 FROM rx GROUP BY quality),
      |mx AS (SELECT doc_id, mx2 FROM rx JOIN mxv USING (quality)),
      |ry AS (SELECT doc_id, nt,
      |    row_number() OVER (ORDER BY nt, doc_id) AS rk FROM s),
      |myv AS (SELECT nt, min(rk) + max(rk) AS my2 FROM ry GROUP BY nt),
      |my AS (SELECT doc_id, my2 FROM ry JOIN myv USING (nt)),
      |j AS (SELECT mx2, my2 FROM mx JOIN my USING (doc_id)),
      |a AS (
      |  SELECT count(*) AS n, sum(mx2) AS sx, sum(my2) AS sy,
      |    sum(CAST(mx2 AS HUGEINT) * my2) AS sxy,
      |    sum(CAST(mx2 AS HUGEINT) * mx2) AS sxx,
      |    sum(CAST(my2 AS HUGEINT) * my2) AS syy
      |  FROM j)
      |SELECT n,
      |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS BIGINT)
      |    AS cov_num,
      |  CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS BIGINT)
      |    AS varx_num,
      |  CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS BIGINT)
      |    AS vary_num
      |FROM a""".stripMargin
  }

  // q196 — CUSUM changepoint locator on the hourly event-count
  // series: the hour t maximizing |S_t·T − t·S_T| (the cumulative sum
  // against the fitted constant rate), which is the exact-integer
  // CUSUM estimate of WHERE the level shifted — the "when did the
  // pipeline change" question q176/q184 alarms hand off to. Dense
  // grid (q162's zero-filled hours: a dead stretch is a level shift,
  // not missing data); the numerator is DECIMAL-exact; the magnitude
  // ships as max·2^20 DIV (T·S_T). The cumulative runs over the
  // HOURS-sized frame (bounded — a decade ≈ 88k rows), so a plain
  // ordered window is the right tool.
  private def q196(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"),
      col("h0"))
    val w = Window.partitionBy(lit(1)).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.join(counts, Seq("hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("t", col("hr") - col("h0") + 1)
      .withColumn("st", sum(col("n")).over(w))
    val tot = cum.agg(max(col("t")).as("bigt"), max(col("st")).as("stot"))
    cum.crossJoin(broadcast(tot))
      .withColumn("dnum", expr(
        "abs(CAST(st AS DECIMAL(38,0)) * bigt - CAST(t AS DECIMAL(38,0)) * stot)"))
      .agg(max(col("bigt")).as("n_hours"), max(col("stot")).as("n_events"),
        max(struct(col("dnum"), (-col("hr")).as("nh"))).as("m"))
      .select(col("n_hours"), col("n_events"),
        (-col("m.nh")).as("changepoint_hr"),
        expr("CAST(m.dnum * 1048576 DIV (CAST(n_hours AS DECIMAL(38,0)) * n_events) AS BIGINT)")
          .as("mag_fp"))
  }

  private val q196Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (SELECT unnest(range(h0, h1 + 1)) AS hr, h0 FROM b),
      |cu AS (
      |  SELECT g.hr, g.hr - g.h0 + 1 AS t,
      |    sum(coalesce(c.n, 0)) OVER (ORDER BY g.hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      |  FROM g LEFT JOIN c ON g.hr = c.hr),
      |tt AS (SELECT max(t) AS bigt, max(st) AS stot FROM cu),
      |d AS (
      |  SELECT hr, abs(CAST(st AS HUGEINT) * bigt - CAST(t AS HUGEINT) * stot)
      |    AS dnum
      |  FROM cu, tt)
      |SELECT CAST(tt.bigt AS BIGINT) AS n_hours,
      |  CAST(tt.stot AS BIGINT) AS n_events,
      |  (SELECT hr FROM d ORDER BY dnum DESC, hr LIMIT 1) AS changepoint_hr,
      |  CAST((SELECT max(dnum) FROM d) * 1048576
      |    // (CAST(tt.bigt AS HUGEINT) * tt.stot) AS BIGINT) AS mag_fp
      |FROM tt""".stripMargin

  // q197 — co-engagement matrix: for every PAIR of event types, the
  // exact number of users who do both, with per-type totals and the
  // pairwise Jaccard in fixed point — the audience-overlap report
  // behind cross-sell and cannibalization questions, and the exact
  // counterpart of sketch-based set-intersection estimates. The pair
  // join runs on the distinct (user, type) frame whose per-user
  // fanout is bounded by the type-set size (≤ C(|types|, 2) pair rows
  // per user — type vocabularies are small by nature), so the join is
  // users-sized, never quadratic in events.
  private def q197(s: SparkSession, d: String): DataFrame = {
    val dt = events(s, d).select(col("user_id"), col("event_type")).distinct()
    val totals = dt.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = dt.as("a").join(dt.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(totals.select(col("event_type").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(totals.select(col("event_type").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        expr("n_both * 1048576 DIV (n_a + n_b - n_both)").as("jaccard_fp"))
      .orderBy(col("type_a"), col("type_b"))
  }

  private val q197Sql =
    """WITH dt AS (SELECT DISTINCT user_id, event_type FROM events),
      |t AS (SELECT event_type, count(*) AS n FROM dt GROUP BY event_type),
      |p AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_both
      |  FROM dt a JOIN dt b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_both, ta.n AS n_a, tb.n AS n_b,
      |  CAST(n_both * 1048576 // (ta.n + tb.n - n_both) AS BIGINT)
      |    AS jaccard_fp
      |FROM p JOIN t ta ON ta.event_type = type_a
      |JOIN t tb ON tb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // q198 — R×C chi-square independence test: is event type
  // independent of day-of-week? The contingency table comes from one
  // scan; the statistic Σ (o·N − r·c)²·2^20 DIV (N·r·c) is exact
  // integer per cell (both engines floor identically), generalizing
  // q169's 2×2 to the full table, with the worst-fit cell named so
  // the alarm is actionable. Everything after the (dow × type)
  // aggregate is a ≤ 7·|types|-row frame joined against two broadcast
  // margin frames.
  private def q198(s: SparkSession, d: String): DataFrame = {
    val o = events(s, d)
      .select(expr("(ts_ms div 86400000 + 4) % 7").as("dow"), col("event_type"))
      .groupBy(col("dow"), col("event_type")).agg(count(lit(1)).as("o"))
    val r = o.groupBy(col("dow")).agg(sum(col("o")).as("r"))
    val c = o.groupBy(col("event_type")).agg(sum(col("o")).as("c"))
    val n = o.agg(sum(col("o")).as("n"), count(lit(1)).as("n_cells"),
      countDistinct(col("dow")).as("n_dow"),
      countDistinct(col("event_type")).as("n_types"))
    val cells = o.join(broadcast(r), Seq("dow"))
      .join(broadcast(c), Seq("event_type"))
      .crossJoin(broadcast(n))
      .withColumn("term_fp", expr(
        """CAST((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
          |  * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
          |  * 1048576 DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)"""
          .stripMargin))
    cells.agg(max(col("n")).as("n_events"), max(col("n_cells")).as("n_cells"),
        ((max(col("n_dow")) - 1) * (max(col("n_types")) - 1)).as("dof"),
        sum(col("term_fp")).as("chi2_fp"),
        max(struct(col("term_fp"), (-col("dow")).as("nd"), col("event_type"))).as("m"))
      .select(col("n_events"), col("n_cells"), col("dof"), col("chi2_fp"),
        (-col("m.nd")).as("worst_dow"), col("m.event_type").as("worst_type"))
  }

  private val q198Sql =
    """WITH o AS (
      |  SELECT (epoch_ms(ts) // 86400000 + 4) % 7 AS dow, event_type,
      |    count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT dow, sum(o) AS r FROM o GROUP BY dow),
      |c AS (SELECT event_type, sum(o) AS c FROM o GROUP BY event_type),
      |n AS (SELECT sum(o) AS n, count(*) AS n_cells,
      |    count(DISTINCT dow) AS n_dow,
      |    count(DISTINCT event_type) AS n_types FROM o),
      |cells AS (
      |  SELECT o.dow, o.event_type,
      |    CAST((CAST(o.o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c)
      |      * (CAST(o.o AS HUGEINT) * n.n - CAST(r.r AS HUGEINT) * c.c)
      |      * 1048576 // (CAST(n.n AS HUGEINT) * r.r * c.c) AS BIGINT)
      |      AS term_fp
      |  FROM o JOIN r USING (dow) JOIN c USING (event_type) CROSS JOIN n)
      |SELECT CAST(n.n AS BIGINT) AS n_events,
      |  CAST(n.n_cells AS BIGINT) AS n_cells,
      |  CAST((n.n_dow - 1) * (n.n_types - 1) AS BIGINT) AS dof,
      |  CAST((SELECT sum(term_fp) FROM cells) AS BIGINT) AS chi2_fp,
      |  (SELECT dow FROM cells
      |   ORDER BY term_fp DESC, dow, event_type DESC LIMIT 1) AS worst_dow,
      |  (SELECT event_type FROM cells
      |   ORDER BY term_fp DESC, dow, event_type DESC LIMIT 1) AS worst_type
      |FROM n""".stripMargin

  // q199 — incident report capstone: one row that answers the on-call
  // page end to end by composing the monitoring family — WHEN did the
  // level shift (the q196 CUSUM changepoint), HOW BIG is it (pre/post
  // exact hourly rates and their fixed-point ratio), and did the MIX
  // change too (total-variation distance between the pre and post
  // event-type compositions, q176's exact-integer TVD on the type
  // axis). Hours are the dense grid (silent hours count toward rate
  // denominators); rates are events·2^20 DIV hours; the split point
  // is computed once and broadcast (1 row). Everything downstream of
  // the hourly/type aggregates is constant-sized.
  private def q199(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"), col("event_type"))
    val counts = ev.groupBy(col("hr")).agg(count(lit(1)).as("n"))
    val bounds = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"),
      col("h0"), col("h1"))
    val w = Window.partitionBy(lit(1)).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid.join(counts, Seq("hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("t", col("hr") - col("h0") + 1)
      .withColumn("st", sum(col("n")).over(w))
    val tot = cum.agg(max(col("t")).as("bigt"), max(col("st")).as("stot"))
    val cp = cum.crossJoin(broadcast(tot))
      .withColumn("dnum", expr(
        "abs(CAST(st AS DECIMAL(38,0)) * bigt - CAST(t AS DECIMAL(38,0)) * stot)"))
      .agg(max(struct(col("dnum"), (-col("hr")).as("nh"))).as("m"),
        max(col("h0")).as("h0"), max(col("h1")).as("h1"))
      .select((-col("m.nh")).as("cp"), col("h0"), col("h1"))
    val split = ev.crossJoin(broadcast(cp))
      .withColumn("side", when(col("hr") < col("cp"), "pre").otherwise("post"))
    val sides = split.groupBy(col("side")).agg(count(lit(1)).as("ne"))
    val types = split.groupBy(col("side"), col("event_type"))
      .agg(count(lit(1)).as("nt"))
    val shift = types
      .join(broadcast(sides), Seq("side"))
      .withColumn("share_fp", expr("nt * 1048576 DIV ne"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("side") === "pre", col("share_fp")).otherwise(0L)).as("pa"),
        sum(when(col("side") === "post", col("share_fp")).otherwise(0L)).as("pb"))
      .agg(expr("CAST(sum(abs(pa - pb)) DIV 2 AS BIGINT)").as("mix_tvd_fp"))
    val rates = sides.crossJoin(broadcast(cp))
      .withColumn("hours",
        when(col("side") === "pre", col("cp") - col("h0"))
          .otherwise(col("h1") - col("cp") + 1))
      .select(col("side"), col("ne"), col("hours"),
        expr("ne * 1048576 DIV hours").as("rate_fp"))
    val wide = rates.groupBy(lit(1).as("g")).agg(
        sum(when(col("side") === "pre", col("ne")).otherwise(0L)).as("pre_events"),
        sum(when(col("side") === "pre", col("hours")).otherwise(0L)).as("pre_hours"),
        sum(when(col("side") === "pre", col("rate_fp")).otherwise(0L)).as("pre_rate_fp"),
        sum(when(col("side") === "post", col("ne")).otherwise(0L)).as("post_events"),
        sum(when(col("side") === "post", col("hours")).otherwise(0L)).as("post_hours"),
        sum(when(col("side") === "post", col("rate_fp")).otherwise(0L)).as("post_rate_fp"))
      .drop("g")
    wide.crossJoin(broadcast(cp.select(col("cp").as("changepoint_hr"))))
      .crossJoin(broadcast(shift))
      .withColumn("rate_ratio_fp", expr(
        // a changepoint at the series edge leaves one side empty —
        // report 0 ("no comparable baseline") instead of dividing by 0
        """CAST(CASE WHEN pre_rate_fp = 0 THEN 0 ELSE
          |  CAST(post_rate_fp AS DECIMAL(38,0)) * 1048576 DIV pre_rate_fp
          |END AS BIGINT)""".stripMargin))
      .select(col("changepoint_hr"), col("pre_hours"), col("pre_events"),
        col("pre_rate_fp"), col("post_hours"), col("post_events"),
        col("post_rate_fp"), col("rate_ratio_fp"), col("mix_tvd_fp"))
  }

  private val q199Sql =
    """WITH e AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, event_type FROM events),
      |c AS (SELECT hr, count(*) AS n FROM e GROUP BY hr),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (SELECT unnest(range(h0, h1 + 1)) AS hr, h0, h1 FROM b),
      |cu AS (
      |  SELECT g.hr, g.hr - g.h0 + 1 AS t,
      |    sum(coalesce(c.n, 0)) OVER (ORDER BY g.hr
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS st
      |  FROM g LEFT JOIN c ON g.hr = c.hr),
      |tt AS (SELECT max(t) AS bigt, max(st) AS stot FROM cu),
      |cp AS (
      |  SELECT (SELECT hr FROM cu, tt
      |      ORDER BY abs(CAST(st AS HUGEINT) * bigt
      |        - CAST(t AS HUGEINT) * stot) DESC, hr LIMIT 1) AS cp,
      |    b.h0, b.h1
      |  FROM b),
      |sp AS (
      |  SELECT CASE WHEN e.hr < cp.cp THEN 'pre' ELSE 'post' END AS side,
      |    e.event_type
      |  FROM e CROSS JOIN cp),
      |sides AS (SELECT side, count(*) AS ne FROM sp GROUP BY side),
      |types AS (SELECT side, event_type, count(*) AS nt
      |  FROM sp GROUP BY side, event_type),
      |shift AS (
      |  SELECT CAST(sum(abs(pa - pb)) // 2 AS BIGINT) AS mix_tvd_fp FROM (
      |    SELECT event_type,
      |      sum(CASE WHEN side = 'pre' THEN nt * 1048576 // ne ELSE 0 END) AS pa,
      |      sum(CASE WHEN side = 'post' THEN nt * 1048576 // ne ELSE 0 END) AS pb
      |    FROM types JOIN sides USING (side)
      |    GROUP BY event_type)),
      |rates AS (
      |  SELECT side, ne,
      |    CASE WHEN side = 'pre' THEN cp.cp - cp.h0
      |         ELSE cp.h1 - cp.cp + 1 END AS hours
      |  FROM sides CROSS JOIN cp),
      |wide AS (
      |  SELECT
      |    sum(CASE WHEN side = 'pre' THEN ne ELSE 0 END) AS pre_events,
      |    sum(CASE WHEN side = 'pre' THEN hours ELSE 0 END) AS pre_hours,
      |    sum(CASE WHEN side = 'pre' THEN ne * 1048576 // hours ELSE 0 END)
      |      AS pre_rate_fp,
      |    sum(CASE WHEN side = 'post' THEN ne ELSE 0 END) AS post_events,
      |    sum(CASE WHEN side = 'post' THEN hours ELSE 0 END) AS post_hours,
      |    sum(CASE WHEN side = 'post' THEN ne * 1048576 // hours ELSE 0 END)
      |      AS post_rate_fp
      |  FROM rates)
      |SELECT cp.cp AS changepoint_hr,
      |  CAST(pre_hours AS BIGINT) AS pre_hours,
      |  CAST(pre_events AS BIGINT) AS pre_events,
      |  CAST(pre_rate_fp AS BIGINT) AS pre_rate_fp,
      |  CAST(post_hours AS BIGINT) AS post_hours,
      |  CAST(post_events AS BIGINT) AS post_events,
      |  CAST(post_rate_fp AS BIGINT) AS post_rate_fp,
      |  CAST(CASE WHEN pre_rate_fp = 0 THEN 0 ELSE
      |    CAST(post_rate_fp AS HUGEINT) * 1048576 // pre_rate_fp END AS BIGINT)
      |    AS rate_ratio_fp,
      |  shift.mix_tvd_fp
      |FROM wide CROSS JOIN cp CROSS JOIN shift""".stripMargin

  private val q191Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
      |  FROM events),
      |hz AS (SELECT max(ts_ms) AS hz FROM e),
      |iv AS (
      |  SELECT event_type,
      |    coalesce(lead(ts_ms) OVER (PARTITION BY user_id
      |      ORDER BY ts_ms, event_id), hz) - ts_ms AS dur
      |  FROM e CROSS JOIN hz),
      |a AS (
      |  SELECT event_type, count(*) AS n_intervals,
      |    CAST(sum(dur) AS BIGINT) AS total_ms,
      |    CAST(max(dur) AS BIGINT) AS max_ms
      |  FROM iv GROUP BY event_type)
      |SELECT event_type, n_intervals, total_ms, max_ms,
      |  CAST(CAST(total_ms AS HUGEINT) * 1048576 // sum(total_ms) OVER ()
      |    AS BIGINT) AS share_fp
      |FROM a ORDER BY event_type""".stripMargin

  private val q184Sql =
    s"""WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM b),
      |s AS (
      |  SELECT g.hr, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
      |    (g.hr // 24 + 4) % 7 AS dow, g.hr % 24 AS hod
      |  FROM g LEFT JOIN c ON g.hr = c.hr),
      |cl AS (
      |  SELECT dow, hod, sum(n) AS cell_total, count(*) AS n_slots
      |  FROM s GROUP BY dow, hod)
      |SELECT s.hr, s.dow, s.hod, s.n AS n_events,
      |  CAST(CAST(cell_total AS HUGEINT) * 1048576 // n_slots AS BIGINT)
      |    AS expected_fp,
      |  CAST(abs(CAST(s.n AS HUGEINT) * 1048576
      |    - CAST(cell_total AS HUGEINT) * 1048576 // n_slots) AS BIGINT)
      |    AS score_fp
      |FROM s JOIN cl USING (dow, hod)
      |ORDER BY score_fp DESC, hr LIMIT $AnomalyTopN""".stripMargin

  // q185 — inter-arrival-time spectrum: per-user gaps between
  // consecutive events, bucketed by log2 milliseconds (the q181
  // bit-length trick — no float log2), with each bucket's share of
  // all gaps in 2^20 fixed point — the latency/heartbeat fingerprint
  // that separates bot-like sub-second cadences from humans and
  // surfaces dead sessions. The lag window partitions BY USER (state
  // is per-user and bounded; no global sort), ordered by the total
  // (ts_ms, event_id) key so ties cannot flake; everything after the
  // per-pair delta is a ~40-row bucket aggregate.
  private def q185(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms"), col("event_id"))
    val deltas = events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_ms"))
      .withColumn("prev", lag(col("ts_ms"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select((col("ts_ms") - col("prev")).as("delta"))
    val wT = Window.partitionBy(lit(1))
    deltas
      .select(expr("CAST(length(bin(delta + 1)) - 1 AS BIGINT)").as("bucket"),
        col("delta"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), min(col("delta")).as("min_ms"),
        max(col("delta")).as("max_ms"))
      .withColumn("tot", sum(col("n_pairs")).over(wT))
      .withColumn("share_fp",
        expr("CAST(CAST(n_pairs AS DECIMAL(38,0)) * 1048576 DIV tot AS BIGINT)"))
      .drop("tot")
      .orderBy(col("bucket"))
  }

  private val q185Sql =
    s"""WITH d AS (
      |  SELECT epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS delta
      |  FROM events),
      |b AS (
      |  SELECT CAST(length(printf('%b', delta + 1)) - 1 AS BIGINT) AS bucket,
      |    count(*) AS n_pairs, CAST(min(delta) AS BIGINT) AS min_ms,
      |    CAST(max(delta) AS BIGINT) AS max_ms
      |  FROM d WHERE delta IS NOT NULL GROUP BY 1)
      |SELECT bucket, n_pairs, min_ms, max_ms,
      |  CAST(CAST(n_pairs AS HUGEINT) * 1048576 // sum(n_pairs) OVER ()
      |    AS BIGINT) AS share_fp
      |FROM b ORDER BY bucket""".stripMargin

  // q210 — bitmap-index segmentation: each (user, day) folds to ONE
  // integer — the bit-or of that day's event-type bits (click=1,
  // error=2, purchase=4, signup=8, view=16) — and every audience
  // question ("days with a view AND a purchase", "erred without
  // signing up") becomes a mask test on the 8-bytes-per-user-day
  // bitmap table instead of a rescan of the event log. The report is
  // the daily-signature histogram with the two flagship segment bits
  // decoded; any segment intersection/union count is a SUM over these
  // ≤2^|types| rows. This is the roaring-bitmap/audience-index
  // technique in its exact relational form (per-day signatures, the
  // granularity engagement cohorts are actually built on — a lifetime
  // mask saturates for any active user).
  //
  // Scale shape: one (user, day) aggregate — bit_or combines
  // map-side, the shuffle carries one integer per user-day — then a
  // ≤2^|types|-row histogram. The event log never shuffles.
  private def q210(s: SparkSession, d: String): DataFrame = {
    val bitExpr = expr(
      """shiftleft(1, CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
        |  WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END)""".stripMargin)
    events(s, d)
      .select(col("user_id"), expr("ts_ms div 86400000").as("day"), bitExpr.as("b"))
      .groupBy(col("user_id"), col("day"))
      .agg(expr("bit_or(b)").as("mask"))
      .groupBy(col("mask"))
      .agg(count(lit(1)).as("n_user_days"))
      .select(col("mask").cast("long").as("mask"), col("n_user_days"),
        (expr("mask & 16") =!= 0).as("has_view"),
        (expr("mask & 4") =!= 0).as("has_purchase"))
      .orderBy(col("mask"))
  }

  private val q210Sql =
    """WITH u AS (
      |  SELECT user_id, epoch_ms(ts) // 86400000 AS day,
      |    bit_or(1 << (CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END)) AS mask
      |  FROM events GROUP BY 1, 2)
      |SELECT CAST(mask AS BIGINT) AS mask, count(*) AS n_user_days,
      |  (mask & 16) <> 0 AS has_view, (mask & 4) <> 0 AS has_purchase
      |FROM u GROUP BY mask
      |ORDER BY mask""".stripMargin

  // q211 — multi-window SLO burn-rate alerting (the SRE-handbook
  // policy): on the dense hourly grid, the error share over the SHORT
  // window (the current hour) and the LONG window (trailing 6 hours)
  // must BOTH exceed the budget line — 1.25× the corpus-wide error
  // share, exact integers: 4·err·2^20·tot_g > 5·gerr·2^20·tot ⇔
  // 4·err·gtot > 5·gerr·tot — for an hour to page. The two-window AND
  // is what separates a real burn from a blip (short only) or a stale
  // residue (long only). Emits every hour with both rates in 2^20
  // fixed point and the alert verdict.
  //
  // Scale shape: the grid frame is TIME-sized (one row per hour of
  // corpus span — ~9k rows/year regardless of event volume), so the
  // trailing-window scan runs as one bounded single-partition window
  // over an already-aggregated frame; the event log itself collapses
  // in the first (hr)-keyed aggregate. The global share is a 1-row
  // broadcast.
  private def q211(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("e"))
      .groupBy(col("hr"))
      .agg(count(lit(1)).as("tot"), sum(col("e")).as("err"))
    val bounds = counts.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(counts, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("tot"), lit(0L)).as("tot"),
        coalesce(col("err"), lit(0L)).as("err"))
    val g = counts.agg(sum(col("tot")).as("gtot"), sum(col("err")).as("gerr"))
    // time-sized frame (see scaladoc): a bounded window, not a shuffle
    val w6 = Window.partitionBy(lit(1)).orderBy(col("hr")).rowsBetween(-5, 0)
    grid
      .withColumn("tot6", sum(col("tot")).over(w6))
      .withColumn("err6", sum(col("err")).over(w6))
      .crossJoin(broadcast(g))
      .select(col("hr"), col("tot"), col("err"),
        expr("CAST(err * 1048576 DIV greatest(tot, 1) AS BIGINT)").as("rate_fp"),
        expr("CAST(err6 * 1048576 DIV greatest(tot6, 1) AS BIGINT)").as("rate6_fp"),
        (expr("4 * err * gtot") > expr("5 * gerr * tot") &&
          expr("4 * err6 * gtot") > expr("5 * gerr * tot6")).as("alert"))
      .orderBy(col("hr"))
  }

  private val q211Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS tot,
      |    sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS err
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |grid AS (
      |  SELECT g.hr, CAST(coalesce(c.tot, 0) AS BIGINT) AS tot,
      |    CAST(coalesce(c.err, 0) AS BIGINT) AS err
      |  FROM (SELECT unnest(range(h0, h1 + 1)) AS hr FROM b) g
      |  LEFT JOIN c ON g.hr = c.hr),
      |t AS (SELECT CAST(sum(tot) AS BIGINT) AS gtot,
      |  CAST(sum(err) AS BIGINT) AS gerr FROM c),
      |w AS (
      |  SELECT hr, tot, err,
      |    sum(tot) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
      |      AS tot6,
      |    sum(err) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
      |      AS err6
      |  FROM grid)
      |SELECT w.hr, w.tot, w.err,
      |  CAST(err * 1048576 // greatest(tot, 1) AS BIGINT) AS rate_fp,
      |  CAST(err6 * 1048576 // greatest(tot6, 1) AS BIGINT) AS rate6_fp,
      |  (4 * err * gtot > 5 * gerr * tot
      |    AND 4 * err6 * gtot > 5 * gerr * tot6) AS alert
      |FROM w, t
      |ORDER BY hr""".stripMargin

  // q214 — forecastability audit (MASE-style): per event type, on the
  // SHARED dense hour grid, compare the seasonal-naive forecast
  // (x̂_t = x_{t−24}, "same hour yesterday") against the naive
  // forecast (x̂_t = x_{t−1}) by summed absolute error — the
  // M-competition baseline pair every forecasting effort must beat,
  // and the cheapest possible answer to "is this series daily-seasonal
  // enough that q179's profile is predictive?". ratio_fp < 2^20 means
  // the daily season explains more than simple persistence. Both error
  // sums restrict to hours where BOTH forecasts exist (t ≥ h0+24),
  // exact BIGINT end to end.
  //
  // Scale shape: events collapse in one (type, hr) aggregate; the
  // grid is time-sized × |types| (q211's argument), lags run per-type
  // over it, and the report is |types| rows.
  private def q214(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .select(col("event_type"), expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("n"))
    val b = c.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = c.select(col("event_type")).distinct()
      .crossJoin(broadcast(b))
      .select(col("event_type"), col("h0"),
        explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(c, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("h0"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    grid
      .withColumn("p1", lag(col("n"), 1).over(w))
      .withColumn("p24", lag(col("n"), 24).over(w))
      .filter(col("hr") >= col("h0") + 24)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(abs(col("n") - col("p1"))).as("sae_naive"),
        sum(abs(col("n") - col("p24"))).as("sae_seasonal"))
      .withColumn("ratio_fp", expr(
        "CAST(sae_seasonal * 1048576 DIV greatest(sae_naive, 1) AS BIGINT)"))
      .orderBy(col("event_type"))
  }

  private val q214Sql =
    """WITH c AS (
      |  SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g0 AS (
      |  SELECT t.event_type, b.h0, gh.hr
      |  FROM (SELECT DISTINCT event_type FROM c) t
      |  CROSS JOIN b, unnest(range(b.h0, b.h1 + 1)) AS gh(hr)),
      |g AS (
      |  SELECT g0.event_type, g0.h0, g0.hr,
      |    CAST(coalesce(c.n, 0) AS BIGINT) AS n
      |  FROM g0 LEFT JOIN c ON c.event_type = g0.event_type AND c.hr = g0.hr),
      |l AS (
      |  SELECT event_type, h0, hr, n,
      |    lag(n, 1) OVER (PARTITION BY event_type ORDER BY hr) AS p1,
      |    lag(n, 24) OVER (PARTITION BY event_type ORDER BY hr) AS p24
      |  FROM g)
      |SELECT event_type, count(*) AS n_hours,
      |  CAST(sum(abs(n - p1)) AS BIGINT) AS sae_naive,
      |  CAST(sum(abs(n - p24)) AS BIGINT) AS sae_seasonal,
      |  CAST(sum(abs(n - p24)) * 1048576
      |    // greatest(sum(abs(n - p1)), 1) AS BIGINT) AS ratio_fp
      |FROM l WHERE hr >= h0 + 24
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // q216 — Theil-Sen robust trend estimator on the hourly event-count
  // series: the MEDIAN of all pairwise slopes (n_j − n_i)/(hr_j − hr_i)
  // — up to 29% outlier contamination moves it not at all, which is
  // why it's the estimator of record for trend-in-noisy-telemetry
  // (vs q160's least-squares line that one bad day drags). The median
  // element is picked by rank (slopes ORDER BY exact double value with
  // an (i,j) tiebreak — IEEE division of bit-identical integers is
  // deterministic, and selection is not arithmetic), emitted with its
  // exact integer (dy, dx) pair so the consumer can re-derive the
  // slope at any precision. Lower/upper median both reported (even
  // pair counts have no unique middle).
  //
  // Scale shape: the pairwise self-join is over the TIME-sized hourly
  // aggregate — hours², independent of event volume (a year is 9k
  // hours → 38M pairs; a century of hours still fits one executor's
  // afternoon) — and the median comes from one rankDistributed pass
  // over the pair frame, no single-partition sort.
  private def q216(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val pairs = c.as("a").join(c.as("b"), col("a.hr") < col("b.hr"))
      .select(col("a.hr").as("h1"), col("b.hr").as("h2"),
        (col("b.n") - col("a.n")).as("dy"), (col("b.hr") - col("a.hr")).as("dx"))
      .withColumn("slope", col("dy").cast("double") / col("dx"))
    val ranked = Sampling.rankDistributed(pairs, Seq.empty,
      Seq(col("slope"), col("h1"), col("h2")))
    val nP = pairs.agg(count(lit(1)).as("n_pairs"))
    ranked.crossJoin(broadcast(nP))
      .filter(col("rk") === expr("(n_pairs + 1) DIV 2") ||
        col("rk") === expr("(n_pairs + 2) DIV 2"))
      .select(col("n_pairs"),
        when(col("rk") === expr("(n_pairs + 1) DIV 2"), "lower")
          .otherwise("upper").as("which"),
        col("dy"), col("dx"), col("slope"))
      .orderBy(col("which"))
  }

  private val q216Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1),
      |p AS (
      |  SELECT a.hr AS h1, b.hr AS h2, b.n - a.n AS dy, b.hr - a.hr AS dx,
      |    CAST(b.n - a.n AS DOUBLE) / (b.hr - a.hr) AS slope
      |  FROM c a JOIN c b ON a.hr < b.hr),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY slope, h1, h2) AS rk,
      |    count(*) OVER () AS n_pairs
      |  FROM p)
      |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CASE WHEN rk = (n_pairs + 1) // 2 THEN 'lower' ELSE 'upper' END AS which,
      |  CAST(dy AS BIGINT) AS dy, CAST(dx AS BIGINT) AS dx, slope
      |FROM r
      |WHERE rk = (n_pairs + 1) // 2 OR rk = (n_pairs + 2) // 2
      |ORDER BY which""".stripMargin

  // q222 — exact 1-D Wasserstein-1 (earth mover's) distance between
  // the English slice's quality distribution and the rest: ∫|F_A−F_B|
  // over the score axis — the drift metric that, unlike q176's TVD
  // (bucket ruler) and q194's KS (sup only), weighs BOTH how many
  // documents moved AND how far. Scores land on the 2^20 integer grid
  // via floor() (floor of a bit-identical double is exact in both
  // engines — no round()-on-the-half-grid hazard), the CDF gap
  // numerator |cumA·n_b − cumB·n_a| integrates against exact grid
  // gaps Δx, and w1_fp ships as 2^20-fixed-point quality units. The
  // last distinct value's open interval contributes zero (both CDFs
  // are 1 there) and is dropped by the pairing join.
  //
  // Scale shape: corpus collapses to the distinct-score frame; the
  // combined rank+cumulative pass is ONE q194-style range exchange
  // with a cluster-sized carry (counts AND group sums in the same
  // carry), and the "next value" comes from a rank self-join — no
  // cross-partition lead, no single-partition window.
  private def q222(s: SparkSession, d: String): DataFrame = {
    val sc = Filtering.qualityScored(documents(s, d))
      .join(documents(s, d).select(col("doc_id"), col("lang")), Seq("doc_id"))
    val v = sc.select(floor(col("quality") * 1048576).cast("long").as("x"),
        col("lang"))
      .groupBy(col("x"))
      .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ca"),
        sum(when(col("lang") =!= "en", 1L).otherwise(0L)).as("cb"))
    val nParts = s.conf.get("spark.sql.shuffle.partitions").toIntOption
      .getOrElse(s.sparkContext.defaultParallelism)
    val parted = v.repartitionByRange(nParts, col("x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = Window.partitionBy(col("__pid")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRn = Window.partitionBy(col("__pid")).orderBy(col("x"))
    val wCarry = Window.partitionBy(lit(1)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = parted.groupBy(col("__pid"))
      .agg(sum(col("ca")).as("pa"), sum(col("cb")).as("pb"),
        count(lit(1)).as("pn"))
      .withColumn("carrya", sum(col("pa")).over(wCarry))
      .withColumn("carryb", sum(col("pb")).over(wCarry))
      .withColumn("carryn", sum(col("pn")).over(wCarry))
      .select(col("__pid"), col("carrya"), col("carryb"), col("carryn"))
    val cums = parted
      .withColumn("la", sum(col("ca")).over(wLocal))
      .withColumn("lb", sum(col("cb")).over(wLocal))
      .withColumn("lrn", row_number().over(wRn).cast("long"))
      .join(broadcast(carry), Seq("__pid"))
      .select(col("x"),
        (col("la") + coalesce(col("carrya"), lit(0L))).as("cuma"),
        (col("lb") + coalesce(col("carryb"), lit(0L))).as("cumb"),
        (col("lrn") + coalesce(col("carryn"), lit(0L))).as("rk"))
    val nxt = cums.select((col("rk") - 1).as("rk"), col("x").as("xn"))
    val tot = v.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    cums.join(nxt, Seq("rk"))
      .crossJoin(broadcast(tot))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(expr(
          "abs(CAST(cuma AS DECIMAL(38,0)) * n_b - CAST(cumb AS DECIMAL(38,0)) * n_a)"
          ) * (col("xn") - col("x"))).as("num"))
      .select(col("n_a"), col("n_b"),
        expr("CAST(num DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)")
          .as("w1_fp"))
  }

  private val q222Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, lang, len(toks) AS n_words,
      |    len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, lang, $toks AS toks FROM documents) t0),
      |sc AS (
      |  SELECT CAST(floor(((CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END))
      |      * 1048576) AS BIGINT) AS x,
      |    lang
      |  FROM t),
      |v AS (
      |  SELECT x,
      |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ca,
      |    sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS cb
      |  FROM sc GROUP BY x),
      |r AS (
      |  SELECT x,
      |    sum(ca) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
      |    sum(cb) OVER (ORDER BY x
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
      |    lead(x) OVER (ORDER BY x) AS xn
      |  FROM v),
      |tt AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a,
      |  CAST(sum(cb) AS BIGINT) AS n_b FROM v)
      |SELECT tt.n_a, tt.n_b,
      |  CAST(sum(abs(CAST(cuma AS HUGEINT) * n_b - CAST(cumb AS HUGEINT) * n_a)
      |      * (xn - x))
      |    // (CAST(tt.n_a AS HUGEINT) * tt.n_b) AS BIGINT) AS w1_fp
      |FROM r, tt WHERE xn IS NOT NULL
      |GROUP BY tt.n_a, tt.n_b""".stripMargin
  }

  /** Lag scan half-width for q223 (hours). */
  val LeadLagMax = 12

  // q223 — lead-lag discovery: scan cross-correlation between the
  // hourly click series and the hourly purchase series over every lag
  // in ±LeadLagMax hours — "how long after clicks do purchases move?"
  // — the question q162 (fixed lag 0/1) assumes away. Per lag, the
  // exact integer sufficient statistics over the overlap window
  // (n, Σa, Σb, Σab, Σa², Σb²) and the squared correlation in 2^20
  // fixed point (numerator/denominator products staged through
  // DECIMAL(38,0)/HUGEINT; a constant series degenerates the
  // denominator to 0 → guarded to 1, corr²=0). The consumer reads the
  // peak row; every row ships so the full correlogram is auditable.
  //
  // Scale shape: the event log collapses once to the time-sized
  // hourly frame; the lag scan is a (hours × 25)-row self-join keyed
  // on the shifted hour — independent of event volume.
  private def q223(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("ts_ms div 3600000").as("hr"), col("event_type"))
      .groupBy(col("hr"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
    val bounds = c.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val g = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(c, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .localCheckpoint(false)
    val lags = s.range(1).select(
      explode(expr(s"sequence(${-LeadLagMax}L, ${LeadLagMax}L)")).as("lag"))
    g.as("x").crossJoin(broadcast(lags))
      .join(g.as("y"), col("y.hr") === col("x.hr") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("x.a")).as("sa"), sum(col("y.b")).as("sb"),
        sum(col("x.a").cast(DecimalType(38, 0)) * col("y.b")).as("sab"),
        sum(col("x.a").cast(DecimalType(38, 0)) * col("x.a")).as("saa"),
        sum(col("y.b").cast(DecimalType(38, 0)) * col("y.b")).as("sbb"))
      .select(col("lag"), col("n_hours"),
        expr("CAST(CAST(n_hours AS DECIMAL(38,0)) * sab - CAST(sa AS DECIMAL(38,0)) * sb AS BIGINT)")
          .as("r_num"),
        expr("""CAST((CAST(n_hours AS DECIMAL(38,0)) * sab - CAST(sa AS DECIMAL(38,0)) * sb)
               |  * (CAST(n_hours AS DECIMAL(38,0)) * sab - CAST(sa AS DECIMAL(38,0)) * sb)
               |  * 1048576
               |  DIV greatest(
               |    (CAST(n_hours AS DECIMAL(38,0)) * saa - CAST(sa AS DECIMAL(38,0)) * sa)
               |    * (CAST(n_hours AS DECIMAL(38,0)) * sbb - CAST(sb AS DECIMAL(38,0)) * sb),
               |    1) AS BIGINT)""".stripMargin).as("corr2_fp"))
      .orderBy(col("lag"))
  }

  private val q223Sql =
    s"""WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS a,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS b
      |  FROM events WHERE event_type IN ('click', 'purchase')
      |  GROUP BY 1),
      |bd AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (
      |  SELECT gh.hr, CAST(coalesce(c.a, 0) AS BIGINT) AS a,
      |    CAST(coalesce(c.b, 0) AS BIGINT) AS b
      |  FROM (SELECT unnest(range(h0, h1 + 1)) AS hr FROM bd) gh
      |  LEFT JOIN c ON c.hr = gh.hr),
      |lg AS (SELECT unnest(range(${-LeadLagMax}, ${LeadLagMax + 1})) AS lag),
      |st AS (
      |  SELECT lg.lag, count(*) AS n_hours,
      |    CAST(sum(x.a) AS BIGINT) AS sa, CAST(sum(y.b) AS BIGINT) AS sb,
      |    sum(CAST(x.a AS HUGEINT) * y.b) AS sab,
      |    sum(CAST(x.a AS HUGEINT) * x.a) AS saa,
      |    sum(CAST(y.b AS HUGEINT) * y.b) AS sbb
      |  FROM g x CROSS JOIN lg JOIN g y ON y.hr = x.hr + lg.lag
      |  GROUP BY lg.lag)
      |SELECT lag, n_hours,
      |  CAST(CAST(n_hours AS HUGEINT) * sab - CAST(sa AS HUGEINT) * sb AS BIGINT)
      |    AS r_num,
      |  CAST((CAST(n_hours AS HUGEINT) * sab - CAST(sa AS HUGEINT) * sb)
      |    * (CAST(n_hours AS HUGEINT) * sab - CAST(sa AS HUGEINT) * sb)
      |    * 1048576
      |    // greatest(
      |      (CAST(n_hours AS HUGEINT) * saa - CAST(sa AS HUGEINT) * sa)
      |      * (CAST(n_hours AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb),
      |      1) AS BIGINT) AS corr2_fp
      |FROM st
      |ORDER BY lag""".stripMargin

  // q225 — classical seasonal decomposition (x = trend + seasonal +
  // residual) of the hourly event-count series, exact-integer form:
  // the centered 2×24-hour moving average carries the TREND (emitted
  // ×48, so the half-weight window endpoints stay integral:
  // T48 = x_{t−12} + 2·Σ_{−11..+11} + x_{t+12}), the per-hour-of-day
  // mean of the detrended series carries the SEASONAL (×48, integer
  // DIV over its slot count), and what's left is the RESIDUAL — the
  // decomposition every anomaly/forecast pipeline (q184, q214) stands
  // on, here as an auditable table. Interior hours only (the 25-hour
  // window must be full).
  //
  // Scale shape: events collapse to the dense hourly grid
  // (time-sized, q211's argument); one bounded window pass + one
  // 24-row seasonal join.
  private def q225(s: SparkSession, d: String): DataFrame = {
    val c = events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n"))
    val bounds = c.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
    val grid = bounds.select(explode(sequence(col("h0"), col("h1"))).as("hr"))
      .join(c, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("n"), lit(0L)).as("x"))
    val w = Window.partitionBy(lit(1)).orderBy(col("hr")) // time-sized frame
    val wc = w.rowsBetween(-12, 12)
    val t = grid
      .withColumn("nw", count(lit(1)).over(wc))
      .withColumn("t48",
        sum(col("x")).over(wc) * 2 - lag(col("x"), 12).over(w)
          - lead(col("x"), 12).over(w))
      .filter(col("nw") === 25)
      .select(col("hr"), col("x"), col("t48"),
        (col("x") * 48 - col("t48")).as("d48"), expr("hr % 24").as("hod"))
    val seasonal = t.groupBy(col("hod"))
      .agg(expr("CAST(sum(d48) DIV count(*) AS BIGINT)").as("s48"))
    t.join(broadcast(seasonal), Seq("hod"))
      .select(col("hr"), col("x"), col("t48").as("trend_x48"),
        col("s48").as("seasonal_x48"),
        (col("d48") - col("s48")).as("residual_x48"))
      .orderBy(col("hr"))
  }

  private val q225Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
      |g AS (
      |  SELECT gh.hr, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      |  FROM (SELECT unnest(range(h0, h1 + 1)) AS hr FROM b) gh
      |  LEFT JOIN c ON c.hr = gh.hr),
      |t0 AS (
      |  SELECT hr, x,
      |    count(*) OVER (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
      |      AS nw,
      |    sum(x) OVER (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
      |      * 2
      |      - lag(x, 12) OVER (ORDER BY hr)
      |      - lead(x, 12) OVER (ORDER BY hr) AS t48
      |  FROM g),
      |t AS (
      |  SELECT hr, x, t48, x * 48 - t48 AS d48, hr % 24 AS hod
      |  FROM t0 WHERE nw = 25),
      |se AS (
      |  SELECT hod, CAST(sum(d48) // count(*) AS BIGINT) AS s48
      |  FROM t GROUP BY hod)
      |SELECT t.hr, t.x, CAST(t.t48 AS BIGINT) AS trend_x48,
      |  se.s48 AS seasonal_x48,
      |  CAST(t.d48 - se.s48 AS BIGINT) AS residual_x48
      |FROM t JOIN se USING (hod)
      |ORDER BY hr""".stripMargin

  // q232 — SAX symbolization + motif discovery on the hourly
  // event-count series (Lin/Keogh/Lonardi's Symbolic Aggregate
  // approXimation, the standard time-series indexing alphabet): each
  // day's 24 zero-filled hourly counts compress to 4 six-hour PAA
  // segments, each segment maps to one of 4 symbols, and the per-day
  // 4-letter SAX word groups days by load SHAPE — recurring words are
  // motifs (the dominant daily pattern), hapax words are discords
  // (the days worth paging about). Two exactness substitutions vs the
  // paper: equal segment widths make the PAA mean a plain integer SUM
  // (same order, no division), and the Gaussian breakpoints become
  // exact rank quartiles — sym = 4·(rk−1) DIV n over the
  // (paa, day, seg) total order — so symbols are deterministic
  // integers in both engines (the paper's breakpoints assume a
  // normality that count data doesn't have anyway).
  //
  // Scale shape: one corpus scan aggregates to the hours-sized grid
  // (bounded — a decade ≈ 88k rows, q196's argument), so the rank
  // window over the 4-per-day segment frame is a bounded ordered
  // window, and everything downstream is day-sized. Words have ≤ 4⁴
  // distinct values, so the motif aggregate is constant-sized.
  /** Core: SAX daily words + motif counts over an (hr, n) hourly-count
    * frame. Fixture-testable.
    */
  private[graft] def saxMotifsOf(counts: DataFrame): DataFrame = {
    val bounds = counts.agg(expr("min(hr) div 24").as("d0"), expr("max(hr) div 24").as("d1"))
    val grid = bounds.select(
      explode(sequence(expr("d0 * 24"), expr("d1 * 24 + 23"))).as("hr"))
    val paa = grid.join(counts, Seq("hr"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .groupBy(expr("hr div 24").as("day"), expr("(hr % 24) div 6").as("seg"))
      .agg(sum(col("n")).as("paa"))
    val nseg = paa.agg(count(lit(1)).as("nseg"))
    val sym = paa
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("paa"), col("day"), col("seg"))))
      .crossJoin(broadcast(nseg))
      .withColumn("ch", expr("substr('abcd', CAST(4 * (rk - 1) DIV nseg AS INT) + 1, 1)"))
    val words = sym.groupBy(col("day"))
      .agg(concat(
        max(when(col("seg") === 0, col("ch"))), max(when(col("seg") === 1, col("ch"))),
        max(when(col("seg") === 2, col("ch"))), max(when(col("seg") === 3, col("ch"))))
        .as("word"))
    words.groupBy(col("word"))
      .agg(count(lit(1)).as("n_days"), min(col("day")).as("first_day"),
        max(col("day")).as("last_day"))
      .orderBy(col("n_days").desc, col("word"))
  }

  private def q232(s: SparkSession, d: String): DataFrame =
    saxMotifsOf(events(s, d)
      .select(expr("ts_ms div 3600000").as("hr"))
      .groupBy(col("hr")).agg(count(lit(1)).as("n")))

  private val q232Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hr) // 24 AS d0, max(hr) // 24 AS d1 FROM c),
      |g AS (SELECT unnest(range(d0 * 24, d1 * 24 + 24)) AS hr FROM b),
      |paa AS (
      |  SELECT g.hr // 24 AS day, (g.hr % 24) // 6 AS seg,
      |    CAST(sum(coalesce(c.n, 0)) AS BIGINT) AS paa
      |  FROM g LEFT JOIN c ON g.hr = c.hr GROUP BY 1, 2),
      |rk AS (
      |  SELECT day, seg, paa,
      |    row_number() OVER (ORDER BY paa, day, seg) AS rk,
      |    count(*) OVER () AS nseg
      |  FROM paa),
      |sym AS (
      |  SELECT day, seg,
      |    substr('abcd', CAST(4 * (rk - 1) // nseg AS INT) + 1, 1) AS ch
      |  FROM rk),
      |w AS (
      |  SELECT day,
      |    max(CASE WHEN seg = 0 THEN ch END) || max(CASE WHEN seg = 1 THEN ch END)
      |    || max(CASE WHEN seg = 2 THEN ch END) || max(CASE WHEN seg = 3 THEN ch END)
      |      AS word
      |  FROM sym GROUP BY day)
      |SELECT word, count(*) AS n_days, CAST(min(day) AS BIGINT) AS first_day,
      |  CAST(max(day) AS BIGINT) AS last_day
      |FROM w GROUP BY word
      |ORDER BY n_days DESC, word""".stripMargin

  // q240 — survival analysis: the Kaplan-Meier RISK TABLE for
  // time-to-conversion (first purchase at-or-after first view), with
  // right-censoring at the observation horizon — the
  // "how long until users convert, given most haven't yet" question
  // that a naive mean-of-converted-gaps answers WRONG (it ignores the
  // censored majority; the risk table is the unbiased object). Per
  // day k since first view: the number still at risk, conversions,
  // censorings, the discrete hazard d_k·2^20 DIV n_k, and cumulative
  // conversions. Everything is exact integer counts — the KM survival
  // curve is the running product Π(1 − hazard) a consumer folds over
  // this table (kept out of the output: an exact rational product
  // overflows any fixed precision at depth, and a float product would
  // break the bit-exact oracle for zero analytic gain).
  //
  // Scale shape: two event scans (first-view frame, conditional-min
  // conversion join on (user, ts ≥ tv)) reduce to ONE ROW PER USER;
  // the risk table itself is a reverse-cumulative window over the
  // DAY grid — bounded by the observation span (q196's hours-grid
  // argument, coarser), never by users.
  val SvDayMs = 86400000L

  /** Core: KM risk table over a (k_end, is_event) one-row-per-subject
    * frame. Fixture-testable.
    */
  private[graft] def survivalHazardOf(subjects: DataFrame): DataFrame = {
    val ended = subjects.groupBy(col("k_end").as("day"))
      .agg(sum(col("is_event")).as("d"), sum(lit(1L) - col("is_event")).as("cens"))
    val bounds = ended.agg(max(col("day")).as("kmax"))
    val grid = bounds.select(explode(sequence(lit(0L), col("kmax"))).as("day"))
    val dense = grid.join(ended, Seq("day"), "left")
      .withColumn("d", coalesce(col("d"), lit(0L)))
      .withColumn("cens", coalesce(col("cens"), lit(0L)))
    val wRisk = Window.orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("n_risk", sum(col("d") + col("cens")).over(wRisk))
      .withColumn("cum_events", sum(col("d")).over(wCum))
      .select(col("day"), col("n_risk"), col("d").as("n_events"),
        col("cens").as("n_censored"),
        expr("d * 1048576 DIV n_risk").as("hazard_fp"), col("cum_events"))
      .orderBy(col("day"))
  }

  private def q240(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("tv"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(tv, "user_id")
      .filter(col("ts_ms") >= col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts_ms")).as("tp"))
    val horizon = ev.agg(max(col("ts_ms")).as("hz"))
    val subjects = tv.join(conv, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        when(col("tp").isNotNull, expr(s"(tp - tv) div $SvDayMs"))
          .otherwise(expr(s"(hz - tv) div $SvDayMs")).as("k_end"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("is_event"))
    survivalHazardOf(subjects)
  }

  private val q240Sql =
    s"""WITH tv AS (
      |  SELECT user_id, min(epoch_ms(ts)) AS tv FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id, min(epoch_ms(e.ts)) AS tp
      |  FROM events e JOIN tv ON e.user_id = tv.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= tv.tv
      |  GROUP BY e.user_id),
      |hz AS (SELECT max(epoch_ms(ts)) AS hz FROM events),
      |subj AS (
      |  SELECT CASE WHEN conv.tp IS NOT NULL
      |      THEN (conv.tp - tv.tv) // $SvDayMs
      |      ELSE (hz.hz - tv.tv) // $SvDayMs END AS k_end,
      |    CASE WHEN conv.tp IS NOT NULL THEN 1 ELSE 0 END AS is_event
      |  FROM tv LEFT JOIN conv ON tv.user_id = conv.user_id, hz),
      |ended AS (
      |  SELECT k_end AS day, CAST(sum(is_event) AS BIGINT) AS d,
      |    CAST(sum(1 - is_event) AS BIGINT) AS cens
      |  FROM subj GROUP BY k_end),
      |grid AS (
      |  SELECT unnest(range(0, (SELECT max(day) FROM ended) + 1)) AS day),
      |dense AS (
      |  SELECT g.day, coalesce(e.d, 0) AS d, coalesce(e.cens, 0) AS cens
      |  FROM grid g LEFT JOIN ended e ON g.day = e.day),
      |r AS (
      |  SELECT day, d, cens,
      |    CAST(sum(d + cens) OVER (ORDER BY day DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_risk,
      |    CAST(sum(d) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events
      |  FROM dense)
      |SELECT day, n_risk, d AS n_events, cens AS n_censored,
      |  CAST(d * 1048576 // n_risk AS BIGINT) AS hazard_fp, cum_events
      |FROM r ORDER BY day""".stripMargin

  // q244 — Mann-Kendall trend TEST on the daily event-count series:
  // the nonparametric significance companion to q216's Theil-Sen
  // slope (same robustness contract — no normality or linearity
  // assumption; MK answers IS there a monotone trend, Theil-Sen
  // answers how steep). S = Σ_{i<j} sign(x_j − x_i) and the
  // tie-corrected 18·Var(S) = n(n−1)(2n+5) − Σ t(t−1)(2t+5) are
  // exact integers; z² ships as S²·18·2^20 DIV var18 with the square
  // staged through DECIMAL(38,0) (S is O(days²) — a decade of days
  // puts S² past 2^63; the decimal stage is the overflow-headroom
  // rule). Consumers compare zsq_fp against 1.96²·2^20 ≈ 4.03e6 for
  // the 5% two-sided gate.
  //
  // Scale shape: one scan aggregates to the zero-filled DAY grid
  // (bounded by the time span — a decade ≈ 3650 rows), so the pair
  // self-join is grid², bounded and independent of event volume; the
  // tie term is a values-sized aggregate over the same grid.
  private def q244(s: SparkSession, d: String): DataFrame = {
    val counts = events(s, d)
      .select(expr("ts_ms div 86400000").as("dy"))
      .groupBy(col("dy")).agg(count(lit(1)).as("x"))
    val bounds = counts.agg(min(col("dy")).as("d0"), max(col("dy")).as("d1"))
    val grid = bounds.select(explode(sequence(col("d0"), col("d1"))).as("dy"))
      .join(counts, Seq("dy"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .localCheckpoint(false) // pair join both sides + tie term
    val sStat = grid.as("a").join(grid.as("b"), col("a.dy") < col("b.dy"))
      .agg(sum(when(col("b.x") > col("a.x"), 1L)
        .when(col("b.x") < col("a.x"), -1L).otherwise(0L)).as("s_stat"))
    val ties = grid.groupBy(col("x")).agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"),
        sum(col("t")).as("n_days"))
    sStat.crossJoin(broadcast(ties))
      .select(col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term").as("var18"),
        // greatest(var18, 1): a constant series (every grid day the same
        // count) makes var18 = 0 — Spark's ANSI-off DIV would yield NULL
        // while the DuckDB oracle's // raises; the guard keeps both
        // engines at zsq_fp = S²·18·2^20 (S = 0 there anyway, so 0)
        expr("""CAST(CAST(s_stat AS DECIMAL(38,0)) * s_stat * 18 * 1048576
          | DIV greatest(var18, 1) AS BIGINT)""".stripMargin).as("zsq_fp"),
        when(col("s_stat") > 0, "increasing").when(col("s_stat") < 0, "decreasing")
          .otherwise("none").as("trend"))
  }

  private val q244Sql =
    """WITH c AS (
      |  SELECT epoch_ms(ts) // 86400000 AS dy, count(*) AS x
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(dy) AS d0, max(dy) AS d1 FROM c),
      |g AS (
      |  SELECT gs.dy, coalesce(c.x, 0) AS x
      |  FROM (SELECT unnest(range((SELECT d0 FROM b), (SELECT d1 FROM b) + 1))
      |          AS dy) gs
      |  LEFT JOIN c ON gs.dy = c.dy),
      |s AS (
      |  SELECT CAST(sum(CASE WHEN bb.x > a.x THEN 1
      |    WHEN bb.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |  FROM g a JOIN g bb ON a.dy < bb.dy),
      |t AS (
      |  SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
      |    CAST(sum(t) AS BIGINT) AS n_days
      |  FROM (SELECT x, count(*) AS t FROM g GROUP BY x) u)
      |SELECT t.n_days, s.s_stat,
      |  t.n_days * (t.n_days - 1) * (2 * t.n_days + 5) - t.tie_term AS var18,
      |  CAST(CAST(s.s_stat AS HUGEINT) * s.s_stat * 18 * 1048576
      |    // greatest(t.n_days * (t.n_days - 1) * (2 * t.n_days + 5)
      |        - t.tie_term, 1)
      |    AS BIGINT) AS zsq_fp,
      |  CASE WHEN s.s_stat > 0 THEN 'increasing'
      |       WHEN s.s_stat < 0 THEN 'decreasing' ELSE 'none' END AS trend
      |FROM s, t""".stripMargin

  // q267 — CUPED variance-reduced experiment readout (Deng, Xu,
  // Kohavi & Walker, WSDM 2013 "Improving the Sensitivity of Online
  // Controlled Experiments by Utilizing Pre-Experiment Data"): the
  // continuous-metric sibling of q169's binary chi-square. Revenue per
  // user in the experiment half of the log is adjusted by each user's
  // PRE-period revenue: θ = Cov(X,Y)/Var(X) pooled, Y_adj = Y −
  // θ·(X − mean(X)) — same arm means shift, variance shrinks by ρ²,
  // which is the whole point: detect smaller effects with the same
  // users. The period split is the log's midpoint timestamp; arms are
  // the q169 id-parity assignment.
  //
  // Exact integer discipline (q160): cents grid, all sufficient
  // statistics (Σx, Σy, Σx², Σxy, Σy²) staged through DECIMAL(38,0)/
  // HUGEINT with one operand cast BEFORE the multiply; θ and ρ² are
  // single fixed-point divisions of those stats (covariance numerators
  // may be negative — Spark DIV and DuckDB // both truncate toward
  // zero, so parity holds without sign-splitting); per-user adjusted
  // values are pure multiplications at 2^40 scale, summed in decimal.
  // The n²-rescale before squaring (cov_n2 DIV n DIV n ≈ the per-user
  // covariance, ~σ² independent of n) keeps ρ²'s operands inside
  // DECIMAL(38,0) at ANY user count (the q169 note; a single DIV n
  // leaves n·σ²-sized factors that overflow around 10^8 users).
  //
  // Scale shape: one (user) aggregate over the event scan (map-side
  // combined), a 1-row stats broadcast back onto the per-user frame
  // (the q44/q75 pattern), then a |arms|-row aggregate. Nothing
  // corpus-sized shuffles twice.
  private def q267(s: SparkSession, d: String): DataFrame = {
    val S = 1048576L
    val ev = events(s, d)
      .select(col("user_id"), col("ts_ms"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val mid = ev.agg(
      expr("(min(ts_ms) + max(ts_ms)) DIV 2").as("mid"))
    val u = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        coalesce(sum(when(col("ts_ms") < col("mid"), col("cents"))), lit(0L))
          .as("x"),
        coalesce(sum(when(col("ts_ms") >= col("mid"), col("cents"))), lit(0L))
          .as("y"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("x"), col("y"))
    val stats = u.agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      expr("sum(CAST(x AS DECIMAL(38,0)) * x)").as("sxx"),
      expr("sum(CAST(x AS DECIMAL(38,0)) * y)").as("sxy"),
      expr("sum(CAST(y AS DECIMAL(38,0)) * y)").as("syy"))
    val derived = stats.select(
      expr(s"CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * $S" +
        s" DIV greatest(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 1)" +
        " AS BIGINT)").as("theta_fp"),
      expr(s"CAST(CAST(sx AS DECIMAL(38,0)) * $S DIV n AS BIGINT)")
        .as("mean_x_fp"),
      // DIV yields LONG: re-stage each rescaled factor through
      // DECIMAL(38,0) before squaring/crossing. The rescale is DIV n
      // TWICE per factor: X_n2 DIV n² ≈ the per-user (co)variance
      // (~σ², independent of n), so the squared numerator stays
      // ~σ⁴·2^20 at ANY user count — a single DIV n leaves factors
      // ~n·σ² whose square overflows DECIMAL(38,0)/HUGEINT around
      // 1e8 users. Truncation cost is ≤1 cents² per factor —
      // identical in both engines.
      expr(s"""CAST(
        |  CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) DIV n DIV n
        |    AS DECIMAL(38,0))
        |  * ((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) DIV n DIV n) * $S
        |  DIV greatest(
        |    CAST((n * sxx - CAST(sx AS DECIMAL(38,0)) * sx) DIV n DIV n
        |      AS DECIMAL(38,0))
        |    * ((n * syy - CAST(sy AS DECIMAL(38,0)) * sy) DIV n DIV n), 1)
        |  AS BIGINT)""".stripMargin).as("rho2_fp"))
    u.crossJoin(broadcast(derived))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("y")).as("sum_y_cents"),
        expr(s"sum(CAST(y AS DECIMAL(38,0)) * $S * $S" +
          s" - CAST(theta_fp AS DECIMAL(38,0)) * (x * $S - mean_x_fp))")
          .as("syadj"),
        max(col("theta_fp")).as("theta_fp"),
        max(col("rho2_fp")).as("rho2_fp"))
      .select(col("arm"), col("n_users"), col("sum_y_cents"),
        expr(s"CAST(CAST(sum_y_cents AS DECIMAL(38,0)) * $S DIV n_users AS BIGINT)")
          .as("mean_y_fp"),
        expr(s"CAST(syadj DIV (n_users * $S) AS BIGINT)").as("mean_yadj_fp"),
        col("theta_fp"), col("rho2_fp"))
      .orderBy(col("arm"))
  }

  private val q267Sql = {
    val S = 1048576L
    s"""WITH ev AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |mid AS (SELECT (min(ts_ms) + max(ts_ms)) // 2 AS mid FROM ev),
      |u AS MATERIALIZED (
      |  SELECT user_id % 2 AS arm,
      |    coalesce(sum(CASE WHEN ts_ms < mid THEN cents END), 0) AS x,
      |    coalesce(sum(CASE WHEN ts_ms >= mid THEN cents END), 0) AS y
      |  FROM ev, mid GROUP BY 1, user_id),
      |st AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM u),
      |dv AS (
      |  SELECT
      |    CAST((n * sxy - sx * sy) * $S
      |      // greatest(n * sxx - sx * sx, 1) AS BIGINT) AS theta_fp,
      |    CAST(sx * $S // n AS BIGINT) AS mean_x_fp,
      |    CAST(((n * sxy - sx * sy) // n // n)
      |        * ((n * sxy - sx * sy) // n // n) * $S
      |      // greatest(((n * sxx - sx * sx) // n // n)
      |        * ((n * syy - sy * sy) // n // n), 1) AS BIGINT) AS rho2_fp
      |  FROM st)
      |SELECT arm, count(*) AS n_users,
      |  CAST(sum(y) AS BIGINT) AS sum_y_cents,
      |  CAST(CAST(sum(y) AS HUGEINT) * $S // count(*) AS BIGINT) AS mean_y_fp,
      |  CAST(sum(CAST(y AS HUGEINT) * $S * $S
      |      - CAST(theta_fp AS HUGEINT) * (x * $S - mean_x_fp))
      |    // (count(*) * $S) AS BIGINT) AS mean_yadj_fp,
      |  max(theta_fp) AS theta_fp, max(rho2_fp) AS rho2_fp
      |FROM u, dv
      |GROUP BY arm
      |ORDER BY arm""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q162_signal_correlation", q162, Some(q162Sql)),
    Q("q169_ab_conversion", q169, Some(q169Sql)),
    Q("q267_cuped_readout", q267, Some(q267Sql)),
    Q("q173_bootstrap_ci", q173, Some(q173Sql)),
    Q("q174_randomization_test", q174, Some(q174Sql)),
    Q("q179_seasonality", q179, Some(q179Sql)),
    Q("q184_seasonal_anomaly", q184, Some(q184Sql)),
    Q("q185_interarrival_spectrum", q185, Some(q185Sql)),
    Q("q191_time_in_state", q191, Some(q191Sql)),
    Q("q193_mann_whitney", q193, Some(q193Sql)),
    Q("q194_ks_test", q194, Some(q194Sql)),
    Q("q195_spearman", q195, Some(q195Sql)),
    Q("q196_cusum_changepoint", q196, Some(q196Sql)),
    Q("q197_co_engagement", q197, Some(q197Sql)),
    Q("q198_chi2_independence", q198, Some(q198Sql)),
    Q("q199_incident_report", q199, Some(q199Sql)),
    Q("q210_segment_bitmaps", q210, Some(q210Sql)),
    Q("q211_burn_rate", q211, Some(q211Sql)),
    Q("q214_seasonal_mase", q214, Some(q214Sql)),
    Q("q216_theil_sen", q216, Some(q216Sql)),
    Q("q222_wasserstein_drift", q222, Some(q222Sql)),
    Q("q223_lead_lag", q223, Some(q223Sql)),
    Q("q225_seasonal_decomp", q225, Some(q225Sql)),
    Q("q232_sax_motifs", q232, Some(q232Sql)),
    Q("q240_survival_hazard", q240, Some(q240Sql)),
    Q("q244_mann_kendall", q244, Some(q244Sql)),
  )
}
