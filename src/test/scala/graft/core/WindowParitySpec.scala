package graft.core

import graft.SparkSpec

/** F4 — the canonical windowed word count with out-of-order input
  * (reference engine_test.go:616-744): timestamp assignment with fixed
  * lateness 5, sliding window size 5 slide 2 keyed by word, count per
  * window, emit on watermark close. The 29-line golden output includes
  * DUPLICATE emissions for windows re-opened by late records — the
  * reference's documented semantics (README.md:27-77) — and omits
  * windows still open at end-of-stream.
  */
object WindowParityFixture {
  val input: Seq[(Long, String)] = Seq(
    1L -> "foo", 1L -> "foo", 2L -> "foo", 8L -> "foo", 5L -> "foo",
    5L -> "buz", 5L -> "buz", 7L -> "buz", 6L -> "buz",
    10L -> "foo", 10L -> "bar", 10L -> "buz",
    2L -> "foo", // out of order
    13L -> "bar", 15L -> "buz",
    3L -> "buz", // out of order
    31L -> "foo", 31L -> "bar", 30L -> "foo",
    20L -> "bar", // out of order
    100L -> "foo", 100L -> "bar", 100L -> "buz")

  val golden: Seq[String] = Seq(
    "[0, 5): foo - 3", "[2, 7): foo - 3", "[0, 5): foo - 1",
    "[4, 9): foo - 2", "[6, 11): foo - 2", "[8, 13): foo - 2",
    "[10, 15): foo - 1", "[26, 31): foo - 1", "[28, 33): foo - 2",
    "[30, 35): foo - 2",
    "[6, 11): bar - 1", "[8, 13): bar - 1", "[10, 15): bar - 2",
    "[12, 17): bar - 1", "[28, 33): bar - 1", "[30, 35): bar - 1",
    "[16, 21): bar - 1", "[18, 23): bar - 1", "[20, 25): bar - 1",
    "[2, 7): buz - 3", "[4, 9): buz - 4", "[6, 11): buz - 3",
    "[8, 13): buz - 1", "[10, 15): buz - 1", "[12, 17): buz - 1",
    "[14, 19): buz - 1", "[0, 5): buz - 1", "[2, 7): buz - 1")

  /** Pre-stamped records: (seq, ts, monotone operator watermark) — what
    * the reference's engine watermarker attaches before the keyed
    * window operator (wm policy: ts - 5; engine_test.go:663-667).
    */
  def stamped: Seq[Stamped[String]] = {
    var wm = Long.MinValue
    input.zipWithIndex.map { case ((ts, w), i) =>
      wm = math.max(wm, ts - 5)
      Stamped(i.toLong, ts, wm, w)
    }
  }
}

class WindowParitySpec extends SparkSpec {
  import spark.implicits._

  test("F4 batch: windowed word count matches the 29-line golden output") {
    val src = GStream.fromSeq(spark, WindowParityFixture.input)
    val stamped = src.assignTimestamps { case (ts, _) => (ts, ts - 5) }
      .map(s => s.copy(value = s.value._2))
    val got = WindowedOps.windowedAggregate(
      stamped, (w: String) => w, size = 5L, slide = 2L, () => 0)(
      (n, _) => n + 1)(
      (k, w) => s"[${w.start}, ${w.stop}): $k - ${w.state}")
      .collect().toSeq
    assert(got.sorted == WindowParityFixture.golden.sorted)
  }

  test("F4: late records re-open windows; end-of-stream windows drop") {
    val src = GStream.fromSeq(spark, WindowParityFixture.input)
    val stamped = src.assignTimestamps { case (ts, _) => (ts, ts - 5) }
      .map(s => s.copy(value = s.value._2))
    val got = WindowedOps.windowedAggregate(
      stamped, (w: String) => w, 5L, 2L, () => 0)((n, _) => n + 1)(
      (k, w) => (k, w.start, w.state)).collect().toSeq
    // duplicate emission for [0,5) foo: once with 3, again with 1
    assert(got.count { case (k, st, _) => k == "foo" && st == 0L } == 2)
    // ts=100 windows ([96..100+]) never close -> never emitted
    assert(!got.exists(_._2 >= 96L))
  }
}
