package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Observational causal inference — the readout a platform needs when
  * it CANNOT randomize: every experiment query so far (q169 chi-square,
  * q173/q174 resampling, q267 CUPED, q272 SPRT) assumes the arms were
  * assigned by coin flip, but "did heavy error exposure depress user
  * spend?" has no control group — error-heavy users are simply MORE
  * ACTIVE users (corr(n_err, n_events) ≈ 0.44 in this corpus), so the
  * naive treated-vs-untreated difference is confounded by activity.
  *
  * q274 — propensity-stratified ATT (Rosenbaum & Rubin 1983; the
  * five-subclass recipe is Cochran 1968): fit P(treated | covariates)
  * with the SAME class-balanced fixed-point GD/softsign machinery as
  * q271 (the propensity model is just a classifier — one trainer, two
  * callers, both engines run the identical recurrence via
  * Classifier.fitOf / Classifier.gdChainSql), stratify users into
  * propensity QUINTILES — equi-depth on the fitted score with a
  * deterministic (p, user_id) tiebreak, Cochran's actual subclassing
  * rather than fixed score bands, so every stratum is populated even
  * when the fitted propensity is nearly flat — difference treated/
  * control mean outcomes WITHIN each stratum, and average the per-
  * stratum differences weighted by the stratum's treated count.
  * Strata without both groups are reported but excluded (the overlap/
  * positivity requirement, made visible instead of silently
  * absorbed). The naive unadjusted difference is emitted alongside so
  * the report shows what the adjustment removed — on THIS synthetic
  * log the per-user activity is nearly homogeneous, the fitted
  * propensity nearly flat, and the adjusted estimate correctly lands
  * close to the naive one; the report demonstrates the estimator, the
  * per-stratum rows demonstrate why.
  *
  * Semantics on this corpus: treatment = error-heavy user
  * (n_err >= [[PsErrMin]]), outcome = lifetime purchase revenue in
  * exact cents, covariates = activity gauges DELIBERATELY excluding
  * error counts (a covariate that defines the treatment makes
  * propensity separable and overlap empty). Production caveat, stated
  * because the math cannot enforce it: covariates must be
  * pre-treatment; this synthetic log has no causal arrow, so the query
  * demonstrates the estimator, not a discovered effect.
  *
  * Bit-reproducibility: the propensity fit is q271's exact fixed-point
  * recurrence; quintile assignment is integer ((rk-1)*5 DIV n) over a
  * deterministic total order; per-stratum differences are
  * cross-multiplied exact-cents comparisons with ONE staged
  * DECIMAL(38,0)/HUGEINT division each — no float touches any emitted
  * value.
  *
  * Scale shape: one events scan into the per-user frame (7 longs/row),
  * checkpointed once and reused by the fit (24 map-side-combinable
  * aggregate rounds against a broadcast 1-row weight frame — q271's
  * shape) and by the single scoring pass; the quintile rank runs
  * through the distributed range-exchange + carry (rankDistributed /
  * ops.PrefixSum — never a single-task global window); the per-stratum
  * report is one 5-row aggregate and the summary rows are 1-row frames
  * (the q44/q75 pattern). At 100 TB nothing but the user aggregate
  * touches the log.
  */
object Causal {

  /** Treatment threshold: errors at or above this make a user treated. */
  val PsErrMin = 14L

  /** Number of fixed propensity bands (Cochran's five subclasses). */
  val PsBands = 5L

  private val S = Classifier.QcScale

  /** Covariate gauges over the per-user base columns — activity
    * signals only, never the error counts that define treatment.
    * Shared text between engines (`d` = truncating integer division).
    */
  private def covariateExprs(d: String): Seq[(String, String)] = Seq(
    "x0" -> s"CAST($S AS BIGINT)",
    // browse volume (views + clicks), capped at 200, scaled to [0,S].
    // Deliberately NOT n_ev - n_err: that difference counts purchase
    // events, i.e. the outcome itself, and conditioning the propensity
    // model on an outcome-derived gauge is post-treatment bias.
    "x1" -> s"(least(n_view + n_click, 200) * $S) $d 200",
    // view count, capped at 100
    "x2" -> s"(least(n_view, 100) * $S) $d 100",
    // click count, capped at 100
    "x3" -> s"(least(n_click, 100) * $S) $d 100",
    // activity span in days, capped at 40
    "x4" -> s"(least(span_days, 40) * $S) $d 40",
  )

  /** Unguarded cross-multiplied mean difference of treated vs control
    * outcome sums, in fixed point — and its NULL-guarded form. ONE
    * builder for all three report rows in BOTH dialects (six sites
    * hand-copied would drift exactly the way gdChainSql's doc warns).
    */
  private def diffCore(d: String, big: String,
      syt: String, syc: String, nt: String, nc: String): String =
    s"CAST(($syt * $nc - $syc * $nt) * $S $d (CAST($nt AS $big) * $nc) AS BIGINT)"

  private def diffExpr(d: String, big: String,
      syt: String, syc: String, nt: String, nc: String): String =
    s"""CASE WHEN $nt > 0 AND $nc > 0
       | THEN ${diffCore(d, big, syt, syc, nt, nc)}
       | ELSE NULL END""".stripMargin.replace("\n", " ")

  /** The treated-count-weighted average of per-stratum differences:
    * the inner DIV lands in BIGINT (IntegralDivide), so it re-stages
    * through the wide type before the * n_treat and the sum, or the
    * weighted terms wrap at ~1e9 treated per band. Callers pre-filter
    * to overlapping strata.
    */
  private def attExpr(d: String, big: String): String =
    s"""CAST(sum(CAST(${diffCore(d, big, "syt", "syc", "n_treat", "n_ctrl")}
       | AS $big) * n_treat) $d greatest(sum(n_treat), 1) AS BIGINT)"""
      .stripMargin.replace("\n", " ")

  /** Per-user treatment/outcome/covariate frame off one events scan.
    * NULL user_ids are dropped up front: a row with no unit identity
    * is not a unit, and the NULL would otherwise land at opposite ends
    * of the two engines' rank orders (Spark NULLS FIRST vs DuckDB
    * row_number NULLS LAST) and shift every stratum boundary by one.
    */
  private def userFrame(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_ev"),
        sum((col("event_type") === "error").cast("long")).as("n_err"),
        sum((col("event_type") === "view").cast("long")).as("n_view"),
        sum((col("event_type") === "click").cast("long")).as("n_click"),
        expr("CAST((max(ts_ms) - min(ts_ms)) DIV 86400000 AS BIGINT)")
          .as("span_days"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("y_cents"))
      .select(
        (col("user_id") +: col("y_cents") +:
          (col("n_err") >= PsErrMin).cast("long").as("y") +:
          covariateExprs("DIV").map { case (nm, e) => expr(e).as(nm) }): _*)

  private def q274(s: SparkSession, d: String): DataFrame = {
    val users = userFrame(s, d).localCheckpoint()
    val w = Classifier.fitOf(users.select(
      (col("y") +: (0 to 4).map(j => col(s"x$j"))): _*), Classifier.QcRounds)
    val p = Classifier.pExpr("DIV", "DECIMAL(38,0)")
    val scoredUsers = users.crossJoin(broadcast(w))
      .select(col("user_id"), col("y").as("t"), col("y_cents"),
        expr(s"CAST($p AS BIGINT)").as("p"))
    // count off the CHECKPOINTED users frame: counting scoredUsers
    // would re-evaluate the scoring cross-join and the softsign
    // expression a second time for a number users already knows
    val n1 = users.agg(count(lit(1)).as("n_users"))
    val banded = Sampling
      .rankDistributed(scoredUsers, Seq.empty, Seq(col("p"), col("user_id")))
      .crossJoin(broadcast(n1))
      .select(col("t"), col("y_cents"),
        expr(s"(rk - 1) * $PsBands DIV greatest(n_users, 1)").as("stratum"))
    val perBand = banded.groupBy(col("stratum")).agg(
        sum(col("t")).as("n_treat"),
        sum(lit(1L) - col("t")).as("n_ctrl"),
        sum((col("t") * col("y_cents")).cast(DecimalType(38, 0))).as("syt"),
        sum(((lit(1L) - col("t")) * col("y_cents")).cast(DecimalType(38, 0)))
          .as("syc"))
      .localCheckpoint() // ≤PsBands rows; reused by rows + both summaries
    val (dd, bg) = ("DIV", "DECIMAL(38,0)")
    val bandRows = perBand.select(
      col("stratum"), col("n_treat"), col("n_ctrl"),
      expr(diffExpr(dd, bg, "syt", "syc", "n_treat", "n_ctrl")).as("diff_fp"))
    // ATT: per-band differences weighted by the band's treated count,
    // over bands satisfying overlap
    val att = perBand.filter(col("n_treat") > 0 && col("n_ctrl") > 0)
      .agg(
        sum(col("n_treat")).as("n_treat"),
        sum(col("n_ctrl")).as("n_ctrl"),
        expr(attExpr(dd, bg)).as("diff_fp"))
      .select(lit(-1L).as("stratum"), col("n_treat"), col("n_ctrl"),
        col("diff_fp"))
    // the naive contrast over all users — NULL-guarded like the band
    // rows: a corpus with zero treated (or zero control) users must
    // report NULL, not throw under ANSI while the oracle yields NULL
    val naive = perBand.agg(
        sum(col("n_treat")).as("n_treat"),
        sum(col("n_ctrl")).as("n_ctrl"),
        sum(col("syt")).as("syt"), sum(col("syc")).as("syc"))
      .select(lit(-2L).as("stratum"), col("n_treat"), col("n_ctrl"),
        expr(diffExpr(dd, bg, "syt", "syc", "n_treat", "n_ctrl")).as("diff_fp"))
    bandRows.unionAll(att).unionAll(naive).orderBy(col("stratum"))
  }

  private val q274Sql = {
    val d = "//"
    val cov = covariateExprs(d).map { case (nm, e) => s"$e AS $nm" }
      .mkString(",\n    ")
    val p = Classifier.pExpr(d, "HUGEINT")
    s"""WITH base AS (
      |  SELECT user_id,
      |    CAST(count(*) AS BIGINT) AS n_ev,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_err,
      |    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |    CAST((epoch_ms(max(ts)) - epoch_ms(min(ts))) $d 86400000 AS BIGINT) AS span_days,
      |    CAST(sum(CASE WHEN event_type = 'purchase'
      |      THEN CAST(CAST(value AS DECIMAL(14,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS y_cents
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |feats AS MATERIALIZED (
      |  SELECT user_id, y_cents, CAST(n_err >= $PsErrMin AS BIGINT) AS y,
      |    $cov
      |  FROM base),
      |${Classifier.gdChainSql},
      |scored AS MATERIALIZED (
      |  SELECT user_id, y AS t, y_cents, CAST($p AS BIGINT) AS p
      |  FROM feats, w${Classifier.QcRounds}),
      |banded AS (
      |  SELECT t, y_cents,
      |    (row_number() OVER (ORDER BY p, user_id) - 1) * $PsBands
      |      $d (SELECT greatest(count(*), 1) FROM scored) AS stratum
      |  FROM scored),
      |per_band AS MATERIALIZED (
      |  SELECT stratum,
      |    CAST(sum(t) AS BIGINT) AS n_treat,
      |    CAST(sum(1 - t) AS BIGINT) AS n_ctrl,
      |    sum(CAST(t * y_cents AS HUGEINT)) AS syt,
      |    sum(CAST((1 - t) * y_cents AS HUGEINT)) AS syc
      |  FROM banded GROUP BY stratum)
      |SELECT * FROM (
      |  SELECT stratum, n_treat, n_ctrl,
      |    ${diffExpr(d, "HUGEINT", "syt", "syc", "n_treat", "n_ctrl")} AS diff_fp
      |  FROM per_band
      |  UNION ALL
      |  SELECT -1, CAST(sum(n_treat) AS BIGINT), CAST(sum(n_ctrl) AS BIGINT),
      |    ${attExpr(d, "HUGEINT")}
      |  FROM per_band WHERE n_treat > 0 AND n_ctrl > 0
      |  UNION ALL
      |  SELECT -2, CAST(sum(n_treat) AS BIGINT), CAST(sum(n_ctrl) AS BIGINT),
      |    ${diffExpr(d, "HUGEINT",
                      "sum(syt)", "sum(syc)", "sum(n_treat)", "sum(n_ctrl)")}
      |  FROM per_band
      |) ORDER BY stratum""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q274_propensity_att", q274, Some(q274Sql)),
  )
}
