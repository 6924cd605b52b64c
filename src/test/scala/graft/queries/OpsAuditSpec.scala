package graft.queries

import graft.SparkSpec

/** Fixture pins for q146 (z-order audit) and q147 (lateness audit):
  * the Morton interleave law on a hand grid, and a hand-traced
  * watermark with one late arrival.
  */
class OpsAuditSpec extends SparkSpec {
  import spark.implicits._

  test("z-order audit: interleave puts a 32x32 block in one bucket") {
    // keys 0..1023 with max 1023 make the grid coord the key itself;
    // (0..31)^2 interleaves to z < 1024 = one bucket, (32,0) to bucket 1
    // (bit 5 of x lands on z bit 10), (1023,1023) to the last bucket
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (31L, 31L),
      (32L, 0L), (1023L, 1023L))
    val got = Layout.zorderAuditOf(pts.toDF("x", "y"), "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (0L, 5L, 0L, 31L, 0L, 31L, 1024L),
      (1L, 1L, 32L, 32L, 0L, 0L, 1L),
      (1023L, 1L, 1023L, 1023L, 1023L, 1023L, 1L)), s"got ${got.toSeq}")
  }

  test("lateness audit: watermark in force at arrival, strict prefix") {
    val min = 60000L
    val ev = Seq(
      // arrival order = event_id; delay = 10 min
      (1L, "a", 0L),            // first arrival: no watermark yet, never late
      (2L, "a", 20L * min),     // advances the max
      (3L, "a", 5L * min),      // wm = 20min-10min = 10min > 5min: late by 5min
      (4L, "b", 9L * min),      // wm = 10min > 9min: late by 1min
      (5L, "b", 21L * min))     // on time
      .toDF("event_id", "event_type", "ts_ms")
    val got = EventWindows.latenessAuditOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("a", 3L, 1L, 5L * min),
      ("b", 2L, 1L, 1L * min)), s"got ${got.toSeq}")
  }

  test("retention cohorts: offsets anchor to each user's first-seen day") {
    val day = 86400000L
    // u1 first seen day 0, active again day 2 (twice — dedups to one);
    // u2 first seen day 2 only
    val ev = Seq((1L, 0L), (1L, 2 * day), (1L, 2 * day + 5L), (2L, 2 * day))
      .toDF("user_id", "ts_ms")
    val res = EventWindows.retentionCohortsOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(res == Seq((0L, 0L, 1L), (0L, 2L, 1L), (2L, 0L, 1L)), s"got $res")
  }

  test("decayed activity: exact shift decay, 63-day cutoff, truncation") {
    val day = 86400000L
    val fp = EventWindows.DecayFp
    val ev = Seq(
      (1L, 70 * day, 0.5),  // now-day anchor: age 0 -> floor(.5*2^20) = 2^19
      (1L, 69 * day, 1.0),  // age 1 -> 2^20 DIV 2 = 2^19
      (1L, 68 * day, 1.5),  // age 2 -> floor(1.5*2^20) DIV 4 = 393216
      (1L, 0L, 1e9),        // age 70 >= 63 -> exactly 0
      (2L, 70 * day, 0.25)) // age 0 -> 2^18
      .toDF("user_id", "ts_ms", "value")
    val got = EventWindows.decayedActivityOf(ev, topN = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, fp / 2 + fp / 2 + 393216L, 4L, 70L),
      (2L, fp / 4, 1L, 70L)), s"got $got")
  }

  test("burst detection: trailing-24h baseline, empty-baseline hours excluded") {
    val hr = 3600000L
    val fp = EventWindows.BurstFp
    // type a: 2 events at hr0, 1 at hr1, 5 at hr25; hr0 has no
    // baseline, hr25's window [1,24] sees only hr1's single event
    val ev = (Seq.fill(2)(0L) ++ Seq(1L) ++ Seq.fill(5)(25L))
      .zipWithIndex.map { case (h, i) => (i.toLong, "a", h * hr + 1) }
      .toDF("event_id", "event_type", "ts_ms")
    val got = EventWindows.burstsOf(ev, topN = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      ("a", 25L, 5L, 1L, 1L, 5L * 24 * fp),  // 5x vs one baseline event
      ("a", 1L, 1L, 2L, 1L, 24L * fp / 2)),  // hr1 vs hr0's two events
      s"got $got")
  }

  test("equi-depth histogram: exact boundaries on a ramp and under ties") {
    import org.apache.spark.sql.functions.col
    val ramp = (1L to 32L).toDF("v")
    val got = Layout.equiDepthOf(ramp, "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expect = (1 to 16).map(i => (i.toLong, 2L * i, 2L * i, 2L))
    assert(got == expect, s"got $got")
    val ties = Seq.fill(32)(7L).toDF("v")
    val gotT = Layout.equiDepthOf(ties, "v").collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq
    assert(gotT == Seq.fill(16)((7L, 2L)), s"got $gotT")
  }
}
