package graft.queries

import graft.SparkSpec

/** Pins q272's SPRT semantics on planted fixtures: a hot arm that must
  * cross the upper boundary (accept H1: p = 0.95), a cold arm that must
  * cross the lower one (accept H0: p = 0.90), the first-crossing-wins
  * stopping rule, and the exact fixed-point LLR recurrence against a
  * sequential fold.
  */
class SequentialSpec extends SparkSpec {
  import spark.implicits._

  private val C1 = Sequential.SprtC1
  private val C0 = Sequential.SprtC0
  private val A = Sequential.SprtA
  private val B = Sequential.SprtB

  /** Sequential LLR fold over a per-arm conversion sequence: returns
    * (n_trials, n_conv, llr_final, first_hi, first_lo).
    */
  private def fold(ys: Seq[Long]): (Long, Long, Long, Long, Long) = {
    var (llr, n, c) = (0L, 0L, 0L)
    var (hi, lo) = (-1L, -1L)
    ys.foreach { y =>
      n += 1; c += y
      llr = c * (C1 - C0) + n * C0
      if (hi < 0 && llr >= A) hi = n
      if (lo < 0 && llr <= B) lo = n
    }
    (n, c, llr, hi, lo)
  }

  /** Build an events fixture: user u on arm (u % 2), enrollment order
    * by ts = user index, conversion via a purchase with value > 80.
    */
  private def eventsOf(convByUser: Seq[(Long, Boolean)]) = {
    convByUser.zipWithIndex.map { case ((u, conv), i) =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 1000L), u,
        "purchase", if (conv) 99.0 else 10.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def runQ272(df: org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory("sprt").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    graft.SparkEntry.queries("q272_sprt_monitor")(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("hot arm accepts H1, cold arm accepts H0, at the folded stop times") {
    // arm 0 (even users): all convert -> LLR drifts up at C1/trial,
    // crossing A after ceil(A/C1) = 52 trials; arm 1: none convert ->
    // crosses B after ceil(|B|/|C0|) = 3 trials.
    val users = (0 until 120).map(i => (i.toLong * 2, true)) ++
      (0 until 120).map(i => (i.toLong * 2 + 1, false))
    val got = runQ272(eventsOf(users))
    val (n0, c0, l0, hi0, lo0) = fold(Seq.fill(120)(1L))
    val (n1, c1, l1, hi1, lo1) = fold(Seq.fill(120)(0L))
    val a0 = got(0L); val a1 = got(1L)
    assert((a0.getLong(1), a0.getLong(2), a0.getLong(3)) == ((n0, c0, l0)))
    assert((a0.getLong(4), a0.getLong(5)) == ((hi0, lo0)))
    assert(a0.getString(6) == "accept_h1" && a0.getLong(7) == hi0)
    assert(hi0 == 52L)
    assert((a1.getLong(1), a1.getLong(2), a1.getLong(3)) == ((n1, c1, l1)))
    assert(a1.getString(6) == "accept_h0" && a1.getLong(7) == lo1)
    assert(lo1 == 3L)
  }

  test("mixed arm matches the fold and first crossing wins") {
    // arm 0: 60 straight conversions push the LLR past A (first
    // crossing, n=52), then 40 misses plunge it through B as well —
    // the decision must still be the EARLIER upper crossing.
    val ys = Seq.fill(60)(true) ++ Seq.fill(40)(false)
    val users = ys.zipWithIndex.map { case (c, i) => (i.toLong * 2, c) } ++
      Seq((1L, true), (3L, false)) // minimal arm 1 so the query emits 2 rows
    val got = runQ272(eventsOf(users))
    val (n, c, l, hi, lo) = fold(ys.map(b => if (b) 1L else 0L))
    val a0 = got(0L)
    assert(hi > 0 && lo > 0 && hi < lo, s"fixture must cross both: hi=$hi lo=$lo")
    assert((a0.getLong(1), a0.getLong(2), a0.getLong(3)) == ((n, c, l)))
    assert(a0.getString(6) == "accept_h1" && a0.getLong(7) == hi)
  }

  test("under-powered arm continues") {
    // 2 trials, one conversion: |LLR| stays inside (B, A)
    val got = runQ272(eventsOf(Seq((0L, true), (2L, false), (1L, true))))
    val a0 = got(0L)
    assert(a0.getString(6) == "continue")
    assert(a0.getLong(4) == -1L && a0.getLong(5) == -1L && a0.getLong(7) == -1L)
  }
}
