package graft.queries

import graft.SparkSpec

/** Pins q276 (exact substring spans) against brute-force window
  * enumeration: every L-token window is materialized as a STRING, df
  * counted per window, flagged starts merged into maximal islands —
  * the semantics the hashed prefix-doubling chain must reproduce
  * exactly, boundaries included.
  */
class SubstringSpanSpec extends SparkSpec {
  import spark.implicits._

  private val L = Dedup.SuffixL

  /** Ground truth: (doc_id, span_start, span_end, span_len, n_windows,
    * max_df) via direct window-string comparison.
    */
  private def bruteSpans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector }
    val windows = toks.flatMap { case (id, ts) =>
      (0 to ts.size - L).map(p => (id, p.toLong, ts.slice(p, p + L).mkString(" "))) }
    val df = windows.groupBy(_._3).map { case (w, g) =>
      w -> g.map(_._1).distinct.size.toLong }
    windows.filter(w => df(w._3) >= Dedup.SuffixMinDocs)
      .groupBy(_._1).toSeq
      .flatMap { case (id, ws) =>
        val sorted = ws.sortBy(_._2)
        // islands: split where consecutive starts gap by more than 1
        val islands = sorted.foldLeft(List.empty[List[(Long, Long)]]) {
          case (acc, (_, p, w)) =>
            val e = (p, df(w))
            acc match {
              case (h @ ((lp, _) :: _)) :: t if p == lp + 1 => (e :: h) :: t
              case _ => List(e) :: acc
            }
        }
        islands.map { isl =>
          val ps = isl.map(_._1)
          val (start, last) = (ps.min, ps.max)
          (id, start, last + L - 1, last + L - 1 - start + 1,
            ps.size.toLong, isl.map(_._2).max)
        }
      }
      .sortBy(x => (x._1, x._2))
  }

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, Long)] =
    Dedup.substringSpansOf(docs.toDF("doc_id", "text"))
      .select("doc_id", "span_start", "span_end", "span_len", "n_windows", "max_df")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  private def toksOf(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("planted copies: exact boundaries, disjoint islands, 15-token near-miss invisible") {
    val c = toksOf("c", 26) // the shared passage (26 >= L)
    val d = toksOf("d", 16) // a second shared passage, exactly L
    val docs = Seq(
      1L -> (toksOf("u", 3) ++ c ++ toksOf("uu", 2)).mkString(" "),
      2L -> (Seq("v0") ++ c ++ toksOf("vv", 3)).mkString(" "),
      3L -> toksOf("w", 40).mkString(" "), // all unique: no rows
      4L -> (c.take(16) ++ toksOf("x", 10) ++ d).mkString(" "), // two islands
      5L -> (toksOf("y", 2) ++ d ++ Seq("y9")).mkString(" "),
      6L -> c.take(15).mkString(" ")) // 15 shared tokens: no full window
    val got = run(docs)
    val want = bruteSpans(docs)
    assert(got == want, s"\ngot  $got\nwant $want")
    // spot-pin the headline boundaries by hand
    assert(got.exists(r => r._1 == 1L && r._2 == 3L && r._3 == 28L && r._4 == 26L))
    assert(got.exists(r => r._1 == 2L && r._2 == 1L && r._3 == 26L))
    assert(got.count(_._1 == 4L) == 2) // the two islands stay disjoint
    assert(!got.exists(r => r._1 == 3L || r._1 == 6L))
  }

  test("property: pseudo-random corpus with planted copies matches brute force") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("aa", "bb")
    val bodies = (0 until 30).map { _ =>
      Vector.fill(40 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
    }
    // plant verbatim cross-doc copies of random slices
    val planted = bodies.zipWithIndex.map { case (b, i) =>
      if (i % 3 == 0 && i > 0) {
        val src = bodies(rnd.nextInt(i))
        val len = L + rnd.nextInt(8)
        val from = rnd.nextInt(math.max(src.size - len, 1))
        val at = rnd.nextInt(b.size)
        (b.take(at) ++ src.slice(from, from + len) ++ b.drop(at)).toVector
      } else b
    }
    val docs = planted.zipWithIndex.map { case (b, i) => (i.toLong, b.mkString(" ")) }
    assert(run(docs) == bruteSpans(docs))
  }
}
