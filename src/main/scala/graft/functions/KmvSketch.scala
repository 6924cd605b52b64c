package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the custom-aggregate surface of the engine
  * (SURVEY.md §7.3: `Aggregator[IN,BUF,OUT]` registered via `udaf`).
  *
  * The sketch keeps the k smallest DISTINCT 60-bit hashes of the
  * values; the k-th smallest h_k estimates the cardinality as
  * (k-1) · 2^60 / h_k. Because the hash ([[TextFns.hash60]]) and the
  * bottom-k selection are deterministic, the sketch — unlike HLL — is
  * reproducible across engines, so the DuckDB oracle can verify it
  * EXACTLY (q48): same k-th min, same estimate, on any row order.
  * Mergeable buffers = partial aggregation works (map-side combine,
  * then merge at the reducer) exactly like a built-in agg at 100 TB.
  *
  * Buffer is a sorted distinct Array[Long] capped at k (merge is a
  * sorted-merge): O(k) memory per group.
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(buf, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than current k-th min
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0; var j = 0; var n = 0
    val out = new Array[Long](math.min(a.length + b.length, k))
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { val v = b(j); j += 1; v }
        else if (j >= b.length) { val v = a(i); i += 1; v }
        else if (a(i) < b(j)) { val v = a(i); i += 1; v }
        else if (a(i) > b(j)) { val v = b(j); j += 1; v }
        else { val v = a(i); i += 1; j += 1; v }
      out(n) = take; n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** k-th smallest distinct hash, or -1 when fewer than k distinct
    * values were seen (caller should fall back to exact count).
    */
  override def finish(buf: Array[Long]): Long =
    if (buf.length < k) -1L else buf(k - 1)

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object KmvSketch {
  /** Column form: kth-min of hash60 values in `c` with sketch size k. */
  def kthMinHash(c: Column, k: Int): Column =
    udaf(new KmvSketch(k)).apply(c)
}
