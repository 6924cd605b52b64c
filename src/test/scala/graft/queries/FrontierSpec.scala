package graft.queries

import graft.SparkSpec

/** Fixture pins for q153 (skyline sweep) and q154 (interval-sweep peak
  * concurrency): hand-traced frontiers and sweep counts, including the
  * tie and boundary cases the distributed prefix must get right.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("skyline: strict domination, same-x and same-y ties") {
    // minimize x, maximize y. (1,5) and (3,7): both on frontier.
    // (2,5): dominated by (1,5) (smaller x, equal y).
    // (1,4): dominated by (1,5) (equal x, bigger y).
    // (4,7): dominated by (3,7). (5,9): frontier (best y).
    val pts = Seq((1.0, 5L), (3.0, 7L), (2.0, 5L), (1.0, 4L), (4.0, 7L), (5.0, 9L))
      .toDF("x", "y")
    val got = Frontier.skylineOf(pts).collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == Set((1.0, 5L), (3.0, 7L), (5.0, 9L)), s"got $got")
  }

  test("skyline: single point and monotone chain") {
    val one = Frontier.skylineOf(Seq((2.0, 2L)).toDF("x", "y")).collect()
    assert(one.map(r => (r.getDouble(0), r.getLong(1))).toSeq == Seq((2.0, 2L)))
    // strictly increasing x AND y: every point survives
    val chain = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L)).toDF("x", "y")
    assert(Frontier.skylineOf(chain).count() == 3)
  }

  test("peak concurrency: half-open intervals, end-before-start ties") {
    val h = Frontier.HoldMs
    val ev = Seq(
      // type a: three overlapping at t=2h/3 (events at 0, h/3, 2h/3... use
      // explicit ms): events at 0, 100, 200 with hold >> spacing -> peak 3
      ("a", 0L), ("a", 100L), ("a", 200L),
      // type b: second event starts EXACTLY when first expires (t = h):
      // half-open semantics -> never concurrent, peak 1
      ("b", 0L), ("b", h),
      // type c: single event
      ("c", 42L))
      .toDF("event_type", "ts_ms")
    val got = Frontier.peakConcurrencyOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 3L, 3L), ("b", 1L, 2L), ("c", 1L, 1L)), s"got $got")
  }
}
