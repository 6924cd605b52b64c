package graft.queries

import graft.SparkSpec

/** Pins the q263 Bradley–Terry MM core against a sequential fold of
  * the same fixed-point recurrence (identical truncating integer
  * division, pseudo-win prior, per-round rescale), plus hand-checkable
  * ordering facts on a schedule with a known dominance structure.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private val S = Ranking.BtScale

  /** Sequential MM fold, same integer arithmetic as bradleyTerryOf. */
  private def reference(
      cmp: Seq[(String, String)], rounds: Int): Map[String, Long] = {
    val games = (cmp.map { case (a, b) => (a, b) } ++ cmp.map(_.swap))
      .groupBy(identity).map { case ((i, j), v) => (i, j) -> v.size.toLong }
    val players = games.keys.map(_._1).toSeq.distinct.sorted
    val wins = cmp.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    var w = players.map(_ -> S).toMap
    for (_ <- 1 to rounds) {
      val upd = players.map { i =>
        val d = games.collect { case ((`i`, j), n) =>
          (BigInt(n) * S * S / (w(i) + w(j))).toLong
        }.sum
        i -> math.max(
          (BigInt(wins(i) + 1) * S * S / math.max(d, 1L)).toLong, 1L)
      }.toMap
      val tw = upd.values.sum
      w = upd.map { case (i, v) =>
        i -> math.max((BigInt(v) * players.size * S / tw).toLong, 1L)
      }
    }
    w
  }

  test("MM fit equals the sequential fold; dominance orders strengths") {
    // a beats everyone, b beats c and d, c beats d, d wins nothing;
    // repeated games give the matrix off-unit entries
    val cmp = Seq(
      "a" -> "b", "a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "b" -> "d",
      "c" -> "d", "d" -> "c")
    val got = Ranking.bradleyTerryOf(
        cmp.toDF("wsrc", "lsrc"), Ranking.BtRounds)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val want = reference(cmp, Ranking.BtRounds)
    assert(got == want, s"got $got want $want")
    // undefeated a on top, winless d at the bottom
    assert(got("a") > got("b") && got("b") > got("c") && got("c") > got("d"))
  }

  test("zero-win player survives via the pseudo-win prior") {
    val cmp = Seq("a" -> "b", "a" -> "b", "a" -> "b")
    val got = Ranking.bradleyTerryOf(cmp.toDF("wsrc", "lsrc"), 8)
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got("b") >= 1L && got("a") > got("b"))
    assert(got == reference(cmp, 8))
  }
}
