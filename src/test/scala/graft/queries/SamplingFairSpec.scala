package graft.queries

import graft.SparkSpec

/** Pins the q219 water-filling allocator on the branch the near-uniform
  * testdata never hits: a mix of fully-satisfied small sources and
  * capped giants, plus the no-cap and zero-demand edges.
  */
class SamplingFairSpec extends SparkSpec {
  import spark.implicits._

  private def run(dem: Seq[(String, Long)], pctX10: Long): Map[String, (Long, Boolean)] =
    Sampling.waterFillOf(dem.toDF("source", "demand"), pctX10)
      .collect().map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap

  test("mixed case: small sources fully satisfied, giants share the level") {
    // total 190, budget 60% -> 114; sorted demands 10,20,60,100:
    // θ candidates: 114/4=28>=10 ok, 104/3=34>=20 ok, 84/2=42<60 BIND,
    // later rows bind lower — level is 42: alloc 10,20,42,42 = 114 exact
    val got = run(Seq("a" -> 10L, "b" -> 20L, "c" -> 60L, "d" -> 100L), 6L)
    assert(got == Map("a" -> (10L, false), "b" -> (20L, false),
      "c" -> (42L, true), "d" -> (42L, true)), s"got $got")
  }

  test("budget covers everything: no source capped, theta is null") {
    val got = run(Seq("a" -> 5L, "b" -> 5L), 10L) // 100% budget
    assert(got == Map("a" -> (5L, false), "b" -> (5L, false)), s"got $got")
  }

  test("one giant absorbs the integer remainder policy: capped at theta") {
    // total 110, budget 66; demands 10,100: θ1=33>=10 ok, θ2=56<100 bind
    // alloc 10+56=66, remainder 0
    val got = run(Seq("tiny" -> 10L, "giant" -> 100L), 6L)
    assert(got == Map("tiny" -> (10L, false), "giant" -> (56L, true)), s"got $got")
  }

  test("zero-demand source stays zero and unflagged") {
    // total 100, budget 60; demands 0,100: θ for the empty source is
    // 30 >= 0 (satisfied), giant binds at 60
    val got = run(Seq("empty" -> 0L, "giant" -> 100L), 6L)
    assert(got == Map("empty" -> (0L, false), "giant" -> (60L, true)), s"got $got")
  }
}
