package graft.queries

import graft.SparkSpec

/** q279 pins on a planted corpus: duplicate families whose members the
  * naive per-doc hash split demonstrably scatters across
  * train/val/test, while the cluster-keyed assignment keeps every
  * family whole. The expected report is recomputed test-side from
  * first principles (md5 bucketing identical to TextFns.hash60, family
  * membership as the pair/cluster ground truth), so the spec pins the
  * whole query — including that the naive column IS q89's registered
  * assignment (same seed, same 100-bucket 80/10/10 thresholds).
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  import TestFolds.splitOf

  /** 3 exact-duplicate families (20 + 5 + 3 members) among 30 unique
    * fillers: 58 docs, 33 clusters. Identical texts guarantee identical
    * MinHash signatures, so every within-family pair is an LSH
    * candidate; fillers share no shingles.
    */
  private val families: Seq[Seq[Long]] = Seq(
    (0L until 20L).map(i => 100L + i * 7L),
    (0L until 5L).map(i => 300L + i * 11L),
    (0L until 3L).map(i => 400L + i * 13L),
  )
  private val fillerIds: Seq[Long] = (0L until 30L).map(500L + _)

  private def docs = {
    val famTexts = Seq(
      "duplicate family alpha body text " * 6,
      "duplicate family beta payload words " * 6,
      "duplicate family gamma content run " * 6)
    val fam = families.zip(famTexts).flatMap { case (ids, t) => ids.map((_, t)) }
    val fillers = fillerIds.map(i =>
      (i, (0 until 30).map(j => s"uniq${i}w${j * 3}t").mkString(" ")))
    (fam ++ fillers).toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
  }

  test("q279 report matches the first-principles fold; families stay whole") {
    val d = docs.cache()
    val nChars = d.collect().map(r => r.getLong(0) -> r.getString(1).length.toLong).toMap

    // ground truth: cluster = min doc_id of the family; fillers are
    // their own cluster; candidate pairs = all within-family pairs
    val cluster: Map[Long, Long] =
      (families.flatMap(ids => ids.map(_ -> ids.min)) ++
        fillerIds.map(i => i -> i)).toMap
    val safe = cluster.map { case (id, c) => id -> splitOf(c) }
    val naive = cluster.keys.map(id => id -> splitOf(id)).toMap
    val pairs = families.flatMap(ids =>
      for (a <- ids; b <- ids if a < b) yield (a, b))

    val perSplit = Seq("test", "train", "val").map { s =>
      val members = cluster.keys.filter(safe(_) == s).toSeq
      (s, members.size.toLong,
        members.map(cluster).distinct.size.toLong,
        members.map(nChars).sum,
        pairs.count { case (a, b) => naive(a) == s && naive(a) != naive(b) }.toLong,
        pairs.count { case (a, b) => safe(a) == s && safe(a) != safe(b) }.toLong)
    }

    val rep = Splits.splitReportOf(d, Dedup.candidatePairsFrom(d)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(rep == perSplit)

    // the headline properties, independent of hash luck
    assert(rep.length == 3 && rep.map(_._2).sum == 58L && rep.map(_._3).sum == 33L)
    assert(rep.map(_._6).sum == 0L, "cluster-keyed split may never cross a pair")
    assert(rep.map(_._5).sum > 0L, "fixture must exhibit naive leakage")
    d.unpersist()
  }

  test("q279 singleton-only corpus reports zero crossings in both columns") {
    val solo = (0L until 12L).map(i =>
      (i, (0 until 25).map(j => s"solo${i}x${j * 5}y").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val rep = Splits.splitReportOf(solo, Dedup.candidatePairsFrom(solo)).collect()
    assert(rep.length == 3)
    assert(rep.map(_.getLong(1)).sum == 12L)
    assert(rep.map(_.getLong(2)).sum == 12L)
    assert(rep.map(_.getLong(4)).sum == 0L)
    assert(rep.map(_.getLong(5)).sum == 0L)
  }
}
