package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.PrefixSum

/** Sequential experimentation — early stopping for A/B tests. Every
  * experiment readout in the registry so far is FIXED-horizon (q169
  * chi-square, q173 bootstrap, q174 randomization, q267 CUPED): the
  * analyst picks n up front and peeking inflates the false-positive
  * rate. Production platforms instead monitor continuously with a
  * sequential test that is valid at every interim look. q272 closes
  * that gap with Wald's SPRT (Wald 1945, "Sequential tests of
  * statistical hypotheses") — the optimal sequential test for a simple
  * Bernoulli hypothesis pair, and the textbook entry point of the
  * whole anytime-valid family.
  *
  * Semantics: users are the trials, in ENROLLMENT order (first event
  * time, user_id tiebreak — the order a live platform would see them),
  * arms split by user-id parity and conversion defined exactly as in
  * q169. For H0: p = 0.90 vs H1: p = 0.95 (the corpus converts ~0.93,
  * so real data lands near the indifference zone and both 'continue'
  * and 'accept_h1' outcomes occur across scales), the log-likelihood
  * ratio after trial n with c conversions is c·ln(p1/p0) +
  * (n−c)·ln((1−p1)/(1−p0)); the test stops at the first n where it
  * leaves (B, A), A = ln((1−β)/α), B = ln(β/(1−α)).
  *
  * Bit-reproducibility: the four transcendental constants are
  * PRECOMPUTED 2^20 fixed-point literals baked into both engines'
  * text (no exp/ln evaluates in either engine), so the running LLR is
  * exact integer arithmetic: llr = c·(C1−C0) + n·C0.
  *
  * Scale shape: ONE pass builds per-user (arm, first_ts, conv); the
  * running state comes from a single distributed prefix sum
  * (ops/PrefixSum — never a per-arm single-task window) of the PACKED
  * value conv·2^31 + 1, which carries both the trial index (low bits)
  * and the conversion count (high bits) in one exchange; the per-arm
  * report is then one map-side-combinable aggregate. Packing bound:
  * 2^31 trials per arm before the high word overflows a BIGINT sum —
  * document-stated, asserted nowhere cheaper than the pack itself.
  */
object Sequential {

  /** Fixed-point scale (2^20), shared with the SQL oracle. */
  val SprtScale = 1048576L

  /** Packing radix for (conversions, trials) in one prefix sum. */
  val SprtPack = 2147483648L // 2^31

  /** ln(p1/p0), ln((1-p1)/(1-p0)) at p0=0.90, p1=0.95, scale 2^20. */
  val SprtC1 = 56694L
  val SprtC0 = -726817L

  /** ln((1-beta)/alpha), ln(beta/(1-alpha)) at alpha=0.05, beta=0.20. */
  val SprtA = 2907270L
  val SprtB = -1633833L

  private def q272(s: SparkSession, d: String): DataFrame = {
    val K = SprtPack
    val u = events(s, d)
      .groupBy(col("user_id"))
      .agg(
        min(col("ts")).as("ft"),
        max(when(col("event_type") === "purchase" && col("value") > 80.0, 1L)
          .otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2)).as("arm"), col("ft"),
        col("user_id"), col("conv"))
    val cum = PrefixSum.prefixSum(
      u, Seq("arm"), Seq(col("ft"), col("user_id")),
      col("conv") * K + 1)
    val llr = cum.select(
      col("arm"),
      expr(s"cum % $K").as("n"),
      expr(s"cum DIV $K").as("cy"))
      .withColumn("llr", expr(s"cy * (${SprtC1} - ${SprtC0}) + n * ${SprtC0}"))
    llr.groupBy(col("arm")).agg(
        max(col("n")).as("n_trials"),
        max(col("cy")).as("n_conv"),
        expr("max_by(llr, n)").as("llr_final_fp"),
        min(when(col("llr") >= SprtA, col("n"))).as("hi"),
        min(when(col("llr") <= SprtB, col("n"))).as("lo"))
      .select(
        col("arm"), col("n_trials"), col("n_conv"), col("llr_final_fp"),
        coalesce(col("hi"), lit(-1L)).as("n_cross_hi"),
        coalesce(col("lo"), lit(-1L)).as("n_cross_lo"),
        expr("""CASE
          | WHEN hi IS NULL AND lo IS NULL THEN 'continue'
          | WHEN coalesce(hi, 4611686018427387904) <= coalesce(lo, 4611686018427387904)
          |   THEN 'accept_h1' ELSE 'accept_h0' END""".stripMargin.replace("\n", " "))
          .as("decision"),
        expr("coalesce(least(coalesce(hi, lo), coalesce(lo, hi)), -1)")
          .as("n_decided"))
      .orderBy(col("arm"))
  }

  private val q272Sql = {
    val K = SprtPack
    s"""WITH u AS (
      |  SELECT user_id, user_id % 2 AS arm, min(ts) AS ft,
      |    max(CASE WHEN event_type = 'purchase' AND value > 80.0
      |        THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT arm, sum(conv * $K + 1) OVER (
      |    PARTITION BY arm ORDER BY ft, user_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM u),
      |l AS (
      |  SELECT arm, CAST(cum % $K AS BIGINT) AS n,
      |    CAST(cum // $K AS BIGINT) AS cy,
      |    CAST((cum // $K) * ($SprtC1 - ($SprtC0)) + (cum % $K) * ($SprtC0)
      |      AS BIGINT) AS llr
      |  FROM c),
      |g AS (
      |  SELECT arm, max(n) AS n_trials, max(cy) AS n_conv,
      |    arg_max(llr, n) AS llr_final_fp,
      |    min(CASE WHEN llr >= $SprtA THEN n END) AS hi,
      |    min(CASE WHEN llr <= $SprtB THEN n END) AS lo
      |  FROM l GROUP BY arm)
      |SELECT CAST(arm AS BIGINT) AS arm, n_trials, n_conv, llr_final_fp,
      |  coalesce(hi, -1) AS n_cross_hi, coalesce(lo, -1) AS n_cross_lo,
      |  CASE WHEN hi IS NULL AND lo IS NULL THEN 'continue'
      |    WHEN coalesce(hi, 4611686018427387904)
      |      <= coalesce(lo, 4611686018427387904)
      |    THEN 'accept_h1' ELSE 'accept_h0' END AS decision,
      |  coalesce(least(coalesce(hi, lo), coalesce(lo, hi)), -1) AS n_decided
      |FROM g ORDER BY arm""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q272_sprt_monitor", q272, Some(q272Sql)),
  )
}
