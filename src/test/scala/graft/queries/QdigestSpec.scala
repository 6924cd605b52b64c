package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the q-digest properties the DuckDB oracle compare can't see on
  * its own: that the digest is a lossless PARTITION of the input count
  * mass (the canonical batch build freezes each unit of count at
  * exactly one node), that internal nodes obey the ⌊n/k⌋ merge bound,
  * and that every quantile answered from the digest lands within the
  * (U/k)·n rank-error guarantee.
  */
class QdigestSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def digestOf(thrOf: Long => Long) = {
    val leaf = graft.Tables.lineitem(spark, sf)
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val n = leaf.agg(sum(col("cnt")).cast("long")).first().getLong(0)
    val thr = thrOf(n)
    (leaf, n, thr,
      Sketches.qdigestOf(leaf, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  private def rangeOf(node: Long): (Long, Long) = {
    val u = Sketches.QdUniverseBits
    val lvl = 63 - java.lang.Long.numberOfLeadingZeros(node)
    val lo = (node - (1L << lvl)) << (u - lvl)
    (lo, lo + (1L << (u - lvl)) - 1)
  }

  test("digest counts partition n and ranges nest or are disjoint") {
    val (_, n, thr, dig) = digestOf(n => math.max(n / Sketches.QdK, 1L))
    // each unit of count mass freezes at exactly one node — the digest
    // is a partition of the MASS (ranges may still overlap: an
    // ancestor can accumulate counts from a sibling subtree after a
    // descendant froze; that containment slack is where the ε·n
    // quantile error comes from)
    assert(dig.map(_._2).sum == n)
    assert(dig.nonEmpty && dig.forall(_._2 > 0))
    // dyadic structure: any two covered ranges either nest or are
    // disjoint — partial overlap would mean a non-heap node id
    val spans = dig.map(t => rangeOf(t._1)).sorted
    for (Seq((lo1, hi1), (lo2, hi2)) <- spans.sliding(2))
      assert(hi1 < lo2 || hi2 <= hi1 || lo1 == lo2,
        s"partial overlap: ($lo1,$hi1) vs ($lo2,$hi2)")
    // no node appears twice
    assert(dig.map(_._1).distinct.size == dig.size)
    // internal (merged) nodes were created by a ≤ thr merge
    val u = Sketches.QdUniverseBits
    dig.foreach { case (node, cnt) =>
      val lvl = 63 - java.lang.Long.numberOfLeadingZeros(node)
      if (lvl < u) assert(cnt <= thr, s"internal node $node cnt $cnt > thr $thr")
    }
  }

  test("quantile answers respect the (U/k)*n rank-error bound") {
    val (leaf, n, _, dig) = digestOf(n => math.max(n / Sketches.QdK, 1L))
    val sortedLeaf = leaf.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val byHi = dig.map { case (node, cnt) => (rangeOf(node), cnt) }
      .sortBy { case ((lo, hi), _) => (hi, lo) }
    val epsN = Sketches.QdUniverseBits.toLong * n / Sketches.QdK
    for (pct <- Sketches.QdPcts) {
      val target = math.max((pct * n + 99) / 100, 1L)
      var cum = 0L
      val est = byHi.collectFirst {
        case ((_, hi), cnt) if { cum += cnt; cum >= target } => hi
      }.get
      val rankOfEst = sortedLeaf.takeWhile(_._1 <= est).map(_._2).sum
      assert(rankOfEst >= target, s"pct $pct: digest rank fell short")
      assert(rankOfEst - target <= epsN,
        s"pct $pct: rank err ${rankOfEst - target} > eps*n $epsN")
    }
  }

  test("a tiny threshold keeps every leaf exact") {
    // thr = 1: nothing can merge (every pair total exceeds 1 unless
    // both are singleton leaves with no sibling... sum <= 1 impossible
    // for cnt >= 1 pairs, single children with cnt 1 do float up), so
    // the digest must still partition n exactly
    val (_, n, _, dig) = digestOf(_ => 1L)
    assert(dig.map(_._2).sum == n)
  }
}
