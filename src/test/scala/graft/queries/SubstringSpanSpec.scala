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

  /** Ground truth for q277: canonical occurrence per duplicated window
    * string = min (doc_id, pos); a position is removed iff covered by a
    * non-canonical flagged window and by no canonical one in its doc.
    */
  private def bruteScrub(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector }
    val windows = toks.flatMap { case (id, ts) =>
      (0 to ts.size - L).map(p => (id, p, ts.slice(p, p + L).mkString(" "))) }
    val byW = windows.groupBy(_._3)
    val dupW = byW.filter(_._2.map(_._1).distinct.size >= Dedup.SuffixMinDocs)
    val canonOf = dupW.map { case (w, occ) => w -> occ.map(o => (o._1, o._2)).min }
    toks.map { case (id, ts) =>
      val flags = dupW.values.flatten.filter(_._1 == id).toSeq
      val canonCover = flags.filter(f => canonOf(f._3) == ((f._1, f._2)))
        .flatMap(f => f._2 until f._2 + L).toSet
      val nonCover = flags.filterNot(f => canonOf(f._3) == ((f._1, f._2)))
        .flatMap(f => f._2 until f._2 + L).toSet
      val removed = (nonCover -- canonCover).toSeq.sorted
      val spans = removed.foldLeft(0 -> -2) { case ((n, last), p) =>
        (if (p == last + 1) n else n + 1) -> p }._1
      val kept = ts.indices.filterNot(removed.contains).map(ts)
      (id, ts.size.toLong, kept.size.toLong, removed.size.toLong,
        spans.toLong, kept.mkString(" "))
    }.sortBy(_._1)
  }

  private def runScrub(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long, Long)] =
    Dedup.substringScrubOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSeq

  private def h60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15), 16)

  test("scrub: canonical copy survives whole, verbatim copy is emptied, counts match brute force") {
    val c = toksOf("c", 26)
    val shared20 = toksOf("s", 20).mkString(" ")
    val docs = Seq(
      1L -> (toksOf("u", 3) ++ c ++ toksOf("uu", 2)).mkString(" "),
      2L -> (Seq("v0") ++ c ++ toksOf("vv", 3)).mkString(" "),
      3L -> toksOf("w", 40).mkString(" "),
      10L -> shared20, // identical pair: 10 is canonical (smaller id)
      11L -> shared20) // ...so 11 scrubs to EMPTY
    val got = runScrub(docs)
    val want = bruteScrub(docs).map(t =>
      (t._1, t._2, t._3, t._4, t._5, h60(t._6)))
    assert(got == want, s"\ngot  $got\nwant $want")
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1 holds the canonical c-span: nothing removed from it
    assert(byId(1L)._4 == 0L, byId(1L).toString)
    // doc 2's copy of the span is scrubbed
    assert(byId(2L)._4 > 0L && byId(2L)._5 == 1L, byId(2L).toString)
    // the verbatim copy empties completely; its fp is hash60("")
    assert(byId(11L)._3 == 0L && byId(11L)._6 == h60(""), byId(11L).toString)
    assert(byId(10L)._4 == 0L, byId(10L).toString)
    // conservation on every row
    got.foreach(r => assert(r._2 == r._3 + r._4, r.toString))
  }

  test("scrub property: pseudo-random corpus with planted copies matches brute force") {
    val rnd = new scala.util.Random(47L)
    val vocab = Vector("aa", "bb", "cc")
    val bodies = (0 until 24).map { _ =>
      Vector.fill(40 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
    }
    val planted = bodies.zipWithIndex.map { case (b, i) =>
      if (i % 3 == 1 && i > 0) {
        val src = bodies(rnd.nextInt(i))
        val from = rnd.nextInt(math.max(src.size - L - 4, 1))
        val at = rnd.nextInt(b.size)
        (b.take(at) ++ src.slice(from, from + L + 4) ++ b.drop(at)).toVector
      } else b
    }
    val docs = planted.zipWithIndex.map { case (b, i) => (i.toLong, b.mkString(" ")) }
    val want = bruteScrub(docs).map(t => (t._1, t._2, t._3, t._4, t._5, h60(t._6)))
    assert(runScrub(docs) == want)
  }
}
