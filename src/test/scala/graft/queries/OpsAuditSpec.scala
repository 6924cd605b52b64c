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
}
