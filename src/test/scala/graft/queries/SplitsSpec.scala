package graft.queries

import graft.SparkSpec

/** q279 behavioral pins on a planted corpus: duplicate families whose
  * members the naive per-doc hash split demonstrably scatters across
  * train/val/test, while the cluster-keyed assignment keeps every
  * family whole (safe_cross_pairs == 0 is computed by the query, not
  * assumed — the spec checks the computation on a corpus engineered to
  * make the naive column nonzero).
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  /** 3 exact-duplicate families (20 + 5 + 3 members) among 30 unique
    * fillers: 58 docs, 33 clusters. Identical texts guarantee identical
    * MinHash signatures, so every within-family pair is an LSH
    * candidate; fillers share no shingles.
    */
  private def docs = {
    val fam = Seq(
      (0L until 20L).map(i => (100L + i * 7L, "duplicate family alpha body text " * 6)),
      (0L until 5L).map(i => (300L + i * 11L, "duplicate family beta payload words " * 6)),
      (0L until 3L).map(i => (400L + i * 13L, "duplicate family gamma content run " * 6)),
    ).flatten
    val fillers = (0L until 30L).map(i =>
      (500L + i, (0 until 30).map(j => s"uniq${i}w${j * 3}t").mkString(" ")))
    (fam ++ fillers).toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
  }

  test("q279 keeps duplicate families whole where the naive split leaks") {
    val d = docs.cache()
    val pairs = Dedup.candidatePairsFrom(d)
    val rep = Splits.splitReportOf(d, pairs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    // full partition of the corpus, clusters counted once per split
    assert(rep.map(_._2).sum == 58L)
    assert(rep.map(_._3).sum == 33L)
    assert(rep.map(_._1).toSet.subsetOf(Set("train", "val", "test")))

    // the audit: cluster-keyed assignment NEVER splits a candidate
    // pair; the naive doc_id hash provably does on this corpus
    assert(rep.map(_._6).sum == 0L)
    assert(rep.map(_._5).sum > 0L)

    // chars conserved
    val totalChars = d.agg(org.apache.spark.sql.functions.sum($"n_chars"))
      .collect().head.getLong(0)
    assert(rep.map(_._4).sum == totalChars)
    d.unpersist()
  }

  test("q279 singleton-only corpus reports zero crossings in both columns") {
    val solo = (0L until 12L).map(i =>
      (i, (0 until 25).map(j => s"solo${i}x${j * 5}y").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val rep = Splits.splitReportOf(solo, Dedup.candidatePairsFrom(solo)).collect()
    assert(rep.map(_.getLong(1)).sum == 12L)
    assert(rep.map(_.getLong(2)).sum == 12L)
    assert(rep.map(_.getLong(4)).sum == 0L)
    assert(rep.map(_.getLong(5)).sum == 0L)
  }
}
