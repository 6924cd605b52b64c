package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the q267 CUPED invariants on a correlated fixture, end to end
  * through the registered query (driven off a temp parquet dir shaped
  * like the driver testdata):
  *  - the adjustment shifts nothing globally — the user-weighted mean
  *    of Y_adj equals the user-weighted mean of Y up to the recorded
  *    fixed-point truncation bound;
  *  - on a fixture where X strongly predicts Y, the pooled ρ² is
  *    large and positive (that's the variance CUPED removes), and the
  *    arm means move TOWARD each other once the covariate imbalance
  *    is adjusted away.
  */
class CupedSpec extends SparkSpec {
  import spark.implicits._

  test("CUPED preserves the global mean and removes covariate variance") {
    // 40 users x 4 events each: 2 pre-period, 2 experiment-period.
    // Y = X + arm-dependent lift, so X predicts Y almost perfectly and
    // the arms are covariate-imbalanced by construction (users with
    // big X land in arm 1 more often via the value pattern).
    val users = (0L until 40L)
    val rows = users.flatMap { u =>
      val base = 10.0 + (u % 7) * 5.0 + (if (u % 2 == 1) 3.0 else 0.0)
      Seq(
        (1000L + u, "2024-01-05 00:00:00", u, "purchase", base),
        (2000L + u, "2024-01-10 00:00:00", u, "purchase", base / 2),
        (3000L + u, "2024-02-05 00:00:00", u, "purchase", base + (u % 2) * 2.0),
        (4000L + u, "2024-02-10 00:00:00", u, "purchase", base / 2 + 1.0))
    }
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = graft.SparkEntry.queries("q267_cuped_readout")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(0L, 1L))
    val s = 1048576L
    val n0 = out(0L).getLong(1); val n1 = out(1L).getLong(1)
    def g(arm: Long, i: Int) = out(arm).getLong(i)
    // global-mean invariance: Σ_v n_v·mean_yadj ≈ Σ_v n_v·mean_y.
    // Slack: each mean truncates once (≤1 ulp·n_v) and each user's
    // adjusted value carries a ≤θ/S ulp from the truncated mean_x.
    val lhs = n0 * g(0L, 4) + n1 * g(1L, 4)
    val rhs = n0 * g(0L, 3) + n1 * g(1L, 3)
    val theta = g(0L, 5)
    val slack = (n0 + n1) * (theta / s + 2) + theta + s
    assert(math.abs(lhs - rhs) <= slack,
      s"|$lhs - $rhs| = ${math.abs(lhs - rhs)} > $slack")
    // X ≈ Y/… strongly correlated: rho2 well above half
    val rho2 = g(0L, 6)
    assert(rho2 > s / 2, s"rho2_fp $rho2")
    assert(rho2 <= s, s"rho2_fp $rho2 exceeds 1.0")
    // covariate-imbalance correction: adjusted arm gap is no wider
    // than the raw gap (X explains most of the raw difference)
    val rawGap = math.abs(g(0L, 3) - g(1L, 3))
    val adjGap = math.abs(g(0L, 4) - g(1L, 4))
    assert(adjGap <= rawGap, s"adj $adjGap raw $rawGap")
  }
}
