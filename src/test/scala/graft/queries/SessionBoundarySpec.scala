package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Fixture-driven boundary coverage the sf testdata cannot provide
  * (ADVICE r2): events exactly one session-gap apart, and funnel users
  * stopping at every stage.
  */
class SessionBoundarySpec extends SparkSpec {
  import spark.implicits._

  test("both sessionizers merge at an exact 30-min gap and split 1 ms past it") {
    // Empirically pinned: Spark's native session_window MERGES an event
    // arriving exactly at session-end (touching windows coalesce), the
    // same strict-> boundary as the hand-rolled q28 sessionizer. The
    // q65 oracle originally asserted `>=` (split at the boundary) — a
    // latent bug the sf testdata never exercised; this fixture keeps
    // both engines honest on BOTH sides of the boundary.
    def ev(gap: Long) = Seq(
      (1L, 0L, 1L, 1.0), (1L, gap, 2L, 1.0), (1L, 2 * gap, 3L, 1.0))
      .toDF("user_id", "ts_ms", "event_id", "value")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
    val atGap = ev(1800000L)
    val hand = EventWindows.sessionize(atGap).collect()
    assert(hand.length == 1 && hand(0).getAs[Long]("n_events") == 3L,
      s"hand-rolled: boundary events must stay in one session: ${hand.toSeq}")
    val native = Extras2.nativeSessions(atGap).collect()
    assert(native.length == 1 && native(0).getAs[Long]("n_events") == 3L,
      s"native: touching windows must merge: ${native.toSeq}")
    val pastGap = ev(1800001L)
    assert(EventWindows.sessionize(pastGap).collect().length == 3)
    assert(Extras2.nativeSessions(pastGap).collect().length == 3)
  }

  test("funnel stages cover all four buckets including null propagation") {
    val ev = Seq(
      (1L, "view", 1000L, 10L),
      (2L, "view", 1000L, 20L), (2L, "click", 2000L, 21L),
      (3L, "view", 1000L, 30L), (3L, "click", 2000L, 31L),
      (3L, "purchase", 3000L, 32L),
      (4L, "click", 1000L, 40L)) // click with no view: stage 0 via null path
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = Extras2.funnelStages(ev).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L, 3 -> 1L), s"got $got")
  }

  test("journey trigrams: exact 3-event session, short sessions, no cross-session grams") {
    val gap = 1800001L
    val ev = Seq(
      // user 1, session 1: view view click (exactly one trigram)
      (1L, "view", 1000L, 10L), (1L, "view", 2000L, 11L), (1L, "click", 3000L, 12L),
      // user 1, session 2 (past the gap): view click — too short, AND the
      // pair must not chain with session 1's tail into a phantom trigram
      (1L, "view", 3000L + gap, 13L), (1L, "click", 4000L + gap, 14L),
      // user 2: four events → two overlapping trigrams
      (2L, "view", 1000L, 20L), (2L, "view", 2000L, 21L),
      (2L, "click", 3000L, 22L), (2L, "purchase", 4000L, 23L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = EventWindows.journeyPathsOf(ev, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("view>view>click" -> 2L, "view>click>purchase" -> 1L),
      s"got $got")
  }

  test("last-touch attribution: organic, superseded, and cross-session clicks") {
    val gap = 1800001L
    val ev = Seq(
      // user 1: click click purchase — the LATER click wins
      (1L, "click", 1000L, 10L), (1L, "click", 2000L, 11L),
      (1L, "purchase", 5000L, 12L),
      // user 2: purchase before any click (organic), then a click, then a
      // purchase in a NEW session — the old click must not attribute
      (2L, "purchase", 1000L, 20L), (2L, "click", 2000L, 21L),
      (2L, "purchase", 2000L + gap + 1000L, 22L))
      .toDF("user_id", "event_type", "ts_ms", "event_id")
    val got = EventWindows.lastTouchOf(ev).collect()
      .map(r => (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq(
      (12L, Some(11L), Some(3000L)), // later click, 3 s latency
      (20L, None, None),             // organic purchase
      (22L, None, None)),            // previous-session click ignored
      s"got $got")
  }
}
