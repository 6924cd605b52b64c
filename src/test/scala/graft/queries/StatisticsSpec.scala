package graft.queries

import graft.SparkSpec

/** Pins q281 against a test-side fold of the whole computation
  * (bucketed counts, nested prefixes, fixed-point log2, least-squares
  * slopes in BigInt — same toward-zero truncation contract), on a
  * planted Zipfian corpus, and checks the two audit directions on
  * degenerate corpora: boilerplate (identical docs) must read as
  * beta = 0 / slope = 0, ID-pollution (all-unique tokens) as
  * beta = S (vocabulary growing linearly with the corpus).
  */
class StatisticsSpec extends SparkSpec {
  import spark.implicits._

  private val S = Statistics.FpScale
  private val B = Statistics.PrefixBuckets

  private def log2fp(n: Long): Long = {
    val g = math.max(n, 1L)
    val L = 64 - java.lang.Long.numberOfLeadingZeros(g)
    (L - 1) * S + (BigInt(g) * S / (BigInt(1) << (L - 1))).toLong - S
  }

  private def slope(pts: Seq[(Long, Long)]): Long = {
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val den = n * sxx - sx * sx
    // degenerate fit defined as 0, mirroring the query's coalesce
    if (den == 0) 0L else ((n * sxy - sx * sy) * S / den).toLong
  }

  /** Zipfian fixture: word r occurring max(1, 1000/r) times, spread
    * deterministically over 40 docs. The r > 1000 tail is all
    * singletons, so each prefix genuinely discovers new vocabulary —
    * without a hapax tail every word lands in prefix 1 and Heaps
    * degenerates to beta = 0 (the boilerplate case below).
    */
  private val tokensByDoc: Map[Long, Seq[String]] = {
    val occ = for {
      r <- 1 to 2000
      j <- 0 until math.max(1, 1000 / r)
    } yield (((r * 31 + j * 7) % 40).toLong, f"w$r%04d")
    occ.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).toSeq }
  }

  private def zipfDocs = tokensByDoc.toSeq
    .map { case (id, ts) => (id, ts.mkString(" ")) }
    .toDF("doc_id", "text")

  /** The full q281 fold, test-side. */
  private def fold(byDoc: Map[Long, Seq[String]]): Seq[(Long, Long, Long, Long, Long, Long, Long)] = {
    val wb = byDoc.toSeq
      .flatMap { case (id, ts) => ts.map(w => (w, id % B)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val words = wb.groupBy(_._1._1).map { case (w, m) =>
      w -> (m.values.sum, m.keys.map(_._2).min) } // cnt, minb
    val prefs = (1L to B.toLong).map { k =>
      val n = wb.collect { case ((_, b), c) if b < k => c }.sum
      val v = words.count(_._2._2 < k).toLong
      (k, n, v, log2fp(n), log2fp(v))
    }
    val beta = slope(prefs.map(p => (p._4, p._5)))
    val ztop = words.toSeq.map { case (w, (c, _)) => (w, c) }
      .sortBy { case (w, c) => (-c, w) }.take(Statistics.ZipfRanks)
    val zs = slope(ztop.zipWithIndex.map { case ((_, c), i) =>
      (log2fp(i + 1L), log2fp(c)) })
    prefs.map(p => (p._1, p._2, p._3, p._4, p._5, beta, zs))
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Statistics.statisticsOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("q281 matches the first-principles fold on a Zipfian corpus") {
    val got = run(zipfDocs)
    assert(got == fold(tokensByDoc))
    // a 1/r corpus fits near the canonical -1; vocabulary sublinear
    val (beta, zs) = (got.head._6, got.head._7)
    assert(zs < -(S * 6) / 10 && zs > -(S * 15) / 10, s"zipf=$zs")
    assert(beta > 0 && beta < S, s"beta=$beta")
  }

  test("fixed-point log2 matches the fold on adversarial values") {
    // powers of two (exact points), their neighbors (interpolation
    // boundaries), an LCG sample, and the extremes
    val pows = (0 to 62).map(1L << _)
    val lcg = Iterator.iterate(88172645463325252L)(x =>
      x * 6364136223846793005L + 1442695040888963407L)
      .take(64).map(x => math.abs(x % Long.MaxValue)).toSeq
    val vals = (pows ++ pows.map(_ - 1) ++ pows.map(_ + 1) ++ lcg ++
      Seq(0L, 1L, 2L, 3L, Long.MaxValue)).distinct.filter(_ >= 0)
    val got = vals.toDF("n")
      .withColumn("l", org.apache.spark.sql.functions.expr(
        Statistics.log2fpSpark("n")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { n =>
      assert(got(n) == log2fp(n), s"log2fp($n): ${got(n)} != ${log2fp(n)}")
    }
    // monotone over the sorted sample; exact at powers of two
    val sorted = vals.sorted
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(got(a) <= got(b), s"log2fp not monotone at ($a, $b)")
    }
    pows.foreach(p => assert(got(p) ==
      (63 - java.lang.Long.numberOfLeadingZeros(p)) * S))
  }

  test("boilerplate corpus reads as beta = 0 and slope = 0") {
    val byDoc = (0L until 16L).map(_ -> Seq("the", "same", "words")).toMap
    val df = byDoc.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = run(df)
    assert(got == fold(byDoc))
    assert(got.head._6 == 0L, "constant vocabulary must fit beta = 0")
    assert(got.head._7 == 0L, "equal frequencies must fit slope = 0")
  }

  test("single-residue corpus (all prefixes equal) fits slope 0, not NULL") {
    // every doc_id = 0 mod 8: n_tokens/vocab identical across all 8
    // prefixes -> zero fit denominator -> defined as 0 in both engines
    val byDoc = (0L until 4L).map(i =>
      i * 8 -> (0 until 12).map(j => s"res${i}y$j")).toMap
    val df = byDoc.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = run(df)
    assert(got == fold(byDoc))
    assert(got.head._6 == 0L)
  }

  test("ID-pollution corpus reads as beta = S (linear vocabulary growth)") {
    val byDoc = (0L until 64L).map(id =>
      id -> (0 until 10).map(j => s"id${id}x$j")).toMap
    val df = byDoc.toSeq.map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")
    val got = run(df)
    assert(got == fold(byDoc))
    assert(got.head._6 == S, s"all-unique tokens must fit beta = S, got ${got.head._6}")
  }
}
