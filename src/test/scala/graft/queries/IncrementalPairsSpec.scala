package graft.queries

import graft.SparkSpec

/** Fixture pins for q140 (skip-gram pairs), q141 (incremental LSH) and
  * q142 (shard manifest): exact pair tables on a hand-enumerable doc,
  * the no-index-self-join law, and the order-invariant checksum law.
  */
class IncrementalPairsSpec extends SparkSpec {
  import spark.implicits._

  test("skip-gram pairs: exact window-2 table for 'a b c d'") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = Corpus.skipgramPairsOf(docs, topN = 50).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val fw = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "d", 1L),
      ("a", "c", 2L), ("b", "d", 2L))
    val expect = (fw ++ fw.map { case (x, y, dd) => (y, x, dd) })
      .map { case (x, y, dd) => (x, y, dd, 1L) }.toSet
    assert(got == expect, s"got $got")
  }

  test("incremental LSH: index is never self-joined; tags are exact") {
    // docs 1,2 (indexed) and 10 (arrival) share identical text — LSH
    // must pair (1,10) and (2,10) as cross but NEVER (1,2); arrival 20
    // is unrelated text and pairs with nothing.
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val u = "completely different content with no overlap whatsoever here now"
    val old = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val nw = Seq((10L, t), (20L, u)).toDF("doc_id", "text")
    val got = Dedup.incrementalPairs(old, nw).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(got.toSeq == Seq((1L, 10L, 1.0, "cross"), (2L, 10L, 1.0, "cross")),
      s"got ${got.toSeq}")
  }

  test("shard manifest: checksum is order-invariant and content-sensitive") {
    val docs = (0 until 16).map(i => (i.toLong, s"tok$i " * (i % 4 + 3)))
    val m1 = Batching.shardManifestOf(docs.toDF("doc_id", "text")).collect()
    val m2 = Batching.shardManifestOf(
      scala.util.Random.shuffle(docs).toDF("doc_id", "text")).collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq) // input order irrelevant
    // flipping one document's content flips exactly that shard's checksum
    val mutated = docs.map { case (id, tx) => (id, if (id == 5L) tx + " extra" else tx) }
    val m3 = Batching.shardManifestOf(mutated.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    val base = m1.map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(m3 != base)
    // every checksum is inside the 2^60 ring
    assert(m1.forall(r => r.getLong(5) >= 0 && r.getLong(5) < Batching.ChecksumMod))
  }
}
