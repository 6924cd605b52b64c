package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Completeness/exactness pin for the q189 prefix-filter similarity
  * join, against a BRUTE-FORCE all-pairs Jaccard computed in plain
  * Scala. This spec exists because the DuckDB oracle replays the same
  * prefix-filter algorithm (the quadratic naive form would be the
  * oracle's own scale-killer), so an algorithmic bug — a wrong prefix
  * length, a length filter that drops a qualifying pair — would be
  * invisible to the driver gate. Here the reference computation shares
  * NOTHING with the implementation except the shingle hash.
  */
class PrefixFilterSpec extends SparkSpec {
  import spark.implicits._

  private val Tau = 0.9

  /** Distinct 3-shingle hash set, replicating Dedup's shingle space
    * (hash60 of the joined trigram, mod P).
    */
  private def shingleSet(text: String): Set[Long] = {
    val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    toks.sliding(3).filter(_.length == 3).map { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.mkString(" ").getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Dedup.P
    }.toSet
  }

  test("q189 core equals brute-force all-pairs Jaccard on a crafted corpus") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    val docs = Seq(
      1L -> base,
      2L -> base, // exact duplicate -> jac 1.0 with 1
      3L -> (base + " uniform"), // near dup: one extra shingle pair
      4L -> base.replace("india", "xray"), // near dup, a few shingles differ
      5L -> ("totally different words entirely unrelated content here now " +
        "one two three four five six seven eight nine ten eleven twelve"),
      6L -> ("another unrelated document with its own vocabulary spread " +
        "red orange yellow green blue indigo violet black white gray"),
      7L -> (base + " " + base)) // same shingle SET as 1 plus the seam
    // brute force over the same shingle space
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val pairs = for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      inter = (sa intersect sb).size
      union = (sa union sb).size
      if union > 0 && inter.toDouble / union >= Tau
    } yield (a, b, inter.toLong,
      inter.toLong * 1048576L / union)
    val expect = (pairs.flatMap { case (a, b, i, j) => Seq((a, b, i, j), (b, a, i, j)) })
      .groupBy(_._1)
      .map { case (id, ps) =>
        val best = ps.minBy(p => (-p._4, p._2))
        (id, ps.size.toLong, best._2, best._3, best._4)
      }.toSet
    assert(pairs.nonEmpty, "degenerate fixture: no qualifying pair")
    assert(pairs.exists(_._4 < 1048576L), "fixture needs a non-identical match")

    val got = Dedup.similarityJoinOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == expect, s"got $got\nexp $expect")
  }

  test("prefix filter finds pairs that share NO rare prefix under a common-token flood") {
    // 40 docs all sharing a dominant common phrase, of which two pairs
    // are true near-dups: the prefix (rarest shingles) of the near-dup
    // pairs is their distinctive tail, and the flood must neither hide
    // the true pairs nor admit false ones past verification.
    val common = "the quick brown fox jumps over the lazy dog again and again today"
    val docs =
      (1 to 36).map(i => i.toLong -> s"$common unique$i marker$i distinct$i token$i word$i") ++
        Seq(101L -> s"$common special tail alpha beta gamma delta epsilon zeta",
          102L -> s"$common special tail alpha beta gamma delta epsilon zeta",
          103L -> s"$common other ending omega psi chi phi upsilon tau",
          104L -> s"$common other ending omega psi chi phi upsilon tau")
    val got = Dedup.similarityJoinOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got.keySet == Set(101L, 102L, 103L, 104L), s"got $got")
    assert(got(101L) == 102L && got(102L) == 101L)
    assert(got(103L) == 104L && got(104L) == 103L)
  }
}
