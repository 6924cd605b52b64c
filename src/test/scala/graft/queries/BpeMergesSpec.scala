package graft.queries

import graft.SparkSpec

/** Pins q257's BPE merge learning to the classic worked example
  * (Sennrich et al. 2016 §3.2 vocabulary: low:5 lower:2 newest:6
  * widest:3), hand-traced through six rounds including both tie rules
  * (lexicographic on the left then right symbol) and the greedy
  * leftmost rewrite.
  */
class BpeMergesSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merges: Sennrich fixture learns es, est, est</w>, lo, low, ew") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "cnt")
    val got = TextAnalysis.bpeMergesOf(wc, 6).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L),      // es/st/t</w> all 9; "e" wins the tie
      (2L, "es", "t", 9L),     // es+t vs t+</w>; "es" < "t"
      (3L, "est", "</w>", 9L),
      (4L, "l", "o", 7L),      // lo vs ow, both 7; "l" < "o"
      (5L, "lo", "w", 7L),
      (6L, "e", "w", 6L)),     // ew/ne/w-est</w> all 6; "e" wins
      s"got ${got.toSeq}")
  }

  test("BPE merges: greedy leftmost rewrite merges aaa to aa|a, not a|aa") {
    // one word "aaaa" x1: round1 pair (a,a) count 3 (overlapping adjacent
    // occurrences all counted); rewrite is leftmost non-overlapping:
    // "a a a a </w>" -> "aa aa </w>" (NOT "aa a a", the space-eating
    // replace bug), so round2 sees (aa,aa) and (aa,</w>) tied at 1 and
    // the right-symbol tie-break picks (aa,</w>) ('<' sorts before 'a')
    val wc = Seq(("aaaa", 1L)).toDF("w", "cnt")
    val got = TextAnalysis.bpeMergesOf(wc, 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "a", 3L), (2L, "aa", "</w>", 1L)),
      s"got ${got.toSeq}")
  }
}
