package graft.queries

import graft.SparkSpec

/** Property pin for q200's deletion-neighborhood blocking: over random
  * short strings (including equal strings, pure inserts/deletes/
  * substitutions, transpositions — the classic false-positive shape —
  * and empty-ish strings), the blocked+verified pair set equals the
  * brute-force all-pairs Levenshtein ≤ 1 set EXACTLY. This is the
  * "exact recall" claim in the q200 scaladoc made falsifiable: a
  * missed candidate (recall bug in the variant generation) or a
  * surviving false positive (verify bug) both fail here.
  */
class MatchingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked ed<=1 join equals brute force over adversarial random strings") {
    // seeded LCG so the fixture is reproducible; alphabet kept to 3
    // letters and length <= 5 to force dense collisions (transpositions
    // like ab/ba collide on deletion variants but have ed = 2)
    var st = 12345L
    def nxt(n: Int): Int = { st = st * 6364136223846793005L + 1442695040888963407L
      (math.abs(st >> 33) % n).toInt }
    val strs = (0 until 60).map { i =>
      val len = nxt(5) + 1
      i.toLong -> new String(Array.fill(len)(('a' + nxt(3)).toChar))
    } :+ (60L -> "ab") :+ (61L -> "ba") :+ (62L -> "a") :+ (63L -> "a")

    val expect = (for {
      (k1, n1) <- strs; (k2, n2) <- strs
      if k1 < k2 && lev(n1, n2) <= 1
    } yield (k1, k2, lev(n1, n2).toLong)).toSet

    val got = Matching.edPairsOf(strs.toDF("k", "nm")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got == expect,
      s"missing=${expect -- got}\nextra=${got -- expect}")
    // the fixture must actually exercise the interesting shapes
    assert(expect.exists(_._3 == 0L), "no equal-string pair in fixture")
    assert(expect.exists(_._3 == 1L), "no distance-1 pair in fixture")
    assert(!expect.contains((60L, 61L, 2L)) && lev("ab", "ba") == 2,
      "transposition must stay excluded")
  }
}
