package graft.queries

import graft.SparkSpec

/** Pins the q271 fixed-point GD core against a sequential fold of the
  * same recurrence (softsign link, truncating integer division — the
  * fixture drives z NEGATIVE on purpose so the toward-zero truncation
  * of Spark's DIV is exercised on signed operands), and checks the
  * trained classifier actually separates the weak labels on a fixture
  * where they are linearly separable.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val S = Classifier.QcScale
  private val Lr = Classifier.QcLrFp

  /** Sequential GD fold, same integer arithmetic as fitOf (class-
    * balanced residuals included). BigInt's / truncates toward zero —
    * the DIV / `//` contract both engines pin.
    */
  private def reference(
      rows: Seq[(Long, Seq[Long])], rounds: Int): Seq[Long] = {
    val n = math.max(rows.size.toLong, 1L)
    val pos = math.max(rows.count(_._1 == 1L).toLong, 1L)
    val bal = (n - pos) * S / pos
    var w = Seq.fill(5)(0L)
    for (_ <- 1 to rounds) {
      val g = Array.fill(5)(BigInt(0))
      rows.foreach { case (y, x) =>
        val z = (x.zip(w).map { case (xj, wj) => BigInt(xj) * wj }.sum / S).toLong
        val p = (S + (BigInt(z) * S / (S + math.abs(z))).toLong) / 2
        val r = BigInt(p - y * S) * (y * bal + (1 - y) * S) / S
        (0 until 5).foreach(j => g(j) += r * x(j))
      }
      w = w.zipWithIndex.map { case (wj, j) =>
        (BigInt(wj) - (g(j) / n) * Lr / (BigInt(S) * S)).toLong
      }
    }
    w
  }

  /** Fixture features: intercept S plus synthetic signals, scaled to
    * [0,S]; ys chosen so "high ttr and in-band length" wins, linearly
    * separable. The negative-label rows push early-round residuals
    * positive and the weights (hence z) negative.
    */
  private val fixture: Seq[(Long, Seq[Long])] = Seq(
    (1L, Seq(S, S / 2, (S * 7) / 10, S / 5, S / 2)),
    (1L, Seq(S, S / 2, (S * 8) / 10, S / 4, S / 2)),
    (1L, Seq(S, (S * 6) / 10, (S * 9) / 10, S / 5, (S * 4) / 10)),
    (1L, Seq(S, (S * 4) / 10, (S * 7) / 10, S / 3, S / 2)),
    (0L, Seq(S, S / 50, S / 10, 0L, S)),
    (0L, Seq(S, S, S / 20, 0L, S / 10)),
    (0L, Seq(S, S / 100, S / 8, S / 100, S)),
  )

  private def fixtureDf = fixture
    .map { case (y, x) => (y, x(0), x(1), x(2), x(3), x(4)) }
    .toDF("y", "x0", "x1", "x2", "x3", "x4")

  test("fitOf equals the sequential fold (signed truncating DIV)") {
    val got = Classifier.fitOf(fixtureDf.localCheckpoint(), Classifier.QcRounds)
      .collect().head
    val want = reference(fixture, Classifier.QcRounds)
    assert((0 until 5).map(got.getLong) == want)
    // the fold must actually have produced a signed weight vector, or
    // the negative-operand DIV path was never exercised
    assert(want.exists(_ < 0) && want.exists(_ > 0))
  }

  test("trained weights separate the fixture labels") {
    val w = reference(fixture, Classifier.QcRounds)
    def score(x: Seq[Long]): Long = {
      val z = (x.zip(w).map { case (xj, wj) => BigInt(xj) * wj }.sum / S).toLong
      (S + (BigInt(z) * S / (S + math.abs(z))).toLong) / 2
    }
    fixture.foreach { case (y, x) =>
      if (y == 1L) assert(score(x) >= S / 2, s"positive row scored ${score(x)}")
      else assert(score(x) < S / 2, s"negative row scored ${score(x)}")
    }
  }

  test("q271 over sf0.001 emits the full report with sane counts") {
    val rows = graft.SparkEntry.queries("q271_quality_classifier")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("w_intercept", "w_lendist", "w_dupfrac",
      "w_stop", "w_wlendist", "tp", "fp", "tn", "fn"))
    val total = rows("tp") + rows("fp") + rows("tn") + rows("fn")
    assert(total == 500L) // sf0.001 corpus size
    // the distilled model must actually separate: both classes
    // predicted (no majority-class collapse), >70% recall on kept
    // docs and better-than-chance overall
    assert(rows("tp") > 0L && rows("tn") > 0L, s"degenerate fit: $rows")
    assert(rows("tp") * 10 >= (rows("tp") + rows("fn")) * 7,
      s"recall under 0.7: $rows")
    assert(rows("tp") + rows("tn") > total / 2,
      s"classifier no better than chance: $rows")
  }
}
