package graft.queries

import graft.SparkSpec

/** Pins q274's propensity-stratified ATT on planted confounding: two
  * activity profiles drive BOTH treatment probability and outcome,
  * with zero true effect inside each profile. The naive difference is
  * large and pure confounding; the quintile-stratified estimate must
  * be exactly zero. Group sizes are multiples of the stratum size
  * (48 low + 32 high over 5 strata of 16), so the equi-depth strata
  * are activity-pure whichever way the fitted propensity orders the
  * two profiles (and even under a fully tied fit, where the
  * deterministic user_id tiebreak does the grouping).
  */
class CausalSpec extends SparkSpec {
  import spark.implicits._

  private val S = Classifier.QcScale

  // (user_id, treated, highActivity): 48 low (12 treated, id%4==0),
  // 32 high (24 treated, id%4!=0) — every 16-user block of either
  // profile contains both groups, so overlap holds in every stratum
  private val users: Seq[(Long, Boolean, Boolean)] =
    (0L until 48L).map(id => (id, id % 4 == 0, false)) ++
      (100L until 132L).map(id => (id, id % 4 != 0, true))

  private def eventsOf(): org.apache.spark.sql.DataFrame = {
    val rows = users.flatMap { case (id, treated, high) =>
      val base = 1700000000000L + id * 1000000L
      val nAct = if (high) 100 else 20
      val price = if (high) 100.0 else 10.0
      val acts = (0 until nAct).map(i =>
        (id * 1000L + i, new java.sql.Timestamp(base + i * 3600000L), id,
          if (i % 2 == 0) "view" else "click", 1.0, "{}"))
      val errs = if (treated) (0 until 14).map(i =>
        (id * 1000L + 500L + i, new java.sql.Timestamp(base + i * 3600000L),
          id, "error", 1.0, "{}")) else Seq.empty
      val buy = Seq((id * 1000L + 900L,
        new java.sql.Timestamp(base + 3600000L), id, "purchase", price, "{}"))
      acts ++ errs ++ buy
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("stratification removes planted confounding exactly") {
    val dir = java.nio.file.Files.createTempDirectory("causal").toString
    eventsOf().coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.SparkEntry.queries("q274_propensity_att")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got.keySet == Set(-2L, -1L, 0L, 1L, 2L, 3L, 4L))
    // every stratum populated with both groups (overlap holds)
    (0L to 4L).foreach { s =>
      val (nt, nc, d) = got(s)
      assert(nt > 0 && nc > 0, s"stratum $s lacks overlap: $nt/$nc")
      assert(d.contains(0L), s"stratum $s diff ${d} != 0 (stratum impure?)")
    }
    // true effect is zero: the stratified ATT must be exactly 0
    assert(got(-1L)._3.contains(0L), s"ATT ${got(-1L)} != 0")
    // the naive contrast is pure confounding: treated skew toward the
    // high-activity/high-spend profile. Expected exactly:
    // treated = 12 low @1000c + 24 high @10000c over 36;
    // control = 36 low @1000c + 8 high @10000c over 44
    // y_cents: low purchase 10.00 -> 1000c, high 100.00 -> 10000c;
    // same truncating division shape as the query's single staged DIV
    val naiveExpect = (BigInt(12 * 1000 + 24 * 10000) * 44 -
      BigInt(36 * 1000 + 8 * 10000) * 36) * S / (36L * 44L)
    assert(got(-2L)._1 == 36L && got(-2L)._2 == 44L)
    assert(got(-2L)._3.contains(naiveExpect.toLong),
      s"naive ${got(-2L)._3} != $naiveExpect")
    assert(naiveExpect > 0)
  }
}
