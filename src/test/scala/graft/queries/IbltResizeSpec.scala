package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Demonstrates q237's resize-and-resend protocol at the sf1-shaped
  * difference (the one row the r13 sf1 sweep recorded as a documented
  * refusal): 50,000 ids with q237's exact planted loss (≡13 mod 97
  * dropped) and foreign inserts (≡41 mod 101 shifted) produce a ~1,000
  * id symmetric difference — far past the default 3x171 sketch.
  *
  *  1. the DEFAULT sketch must refuse loudly (the r12 hardening);
  *  2. the remedy the error message names is then executed: size the
  *     bank from q203-style per-bucket COUNT DELTAS (1.5x margin),
  *     doubling on a further refusal (count deltas UNDERCOUNT when an
  *     insert and a delete share a digest bucket, so the protocol must
  *     tolerate a low first estimate);
  *  3. the resized peel must decode the difference EXACTLY (equal to
  *     the EXCEPT ground truth), proving the refusal was capacity, not
  *     correctness.
  */
class IbltResizeSpec extends SparkSpec {
  import spark.implicits._

  private val N = 50000L // sf1 document count

  private lazy val a = spark.range(N).select(col("id").as("doc_id"))
  private lazy val b = a.filter(pmod(col("doc_id"), lit(97)) =!= 13)
    .unionAll(a.filter(pmod(col("doc_id"), lit(101)) === 41)
      .select((col("doc_id") + 1000000000L).as("doc_id")))

  test("default sketch refuses the sf1-scale difference loudly") {
    val e = intercept[IllegalStateException] {
      Maintenance.ibltReconcileOf(a, b).collect()
    }
    assert(e.getMessage.contains("resize the sketch"), e.getMessage)
  }

  test("bank sized from count deltas (resize-and-resend) decodes exactly") {
    // q203's view: per-bucket row-count deltas of the two replicas —
    // the few-KB digest exchange production sizing reads
    val deltas = a.select(pmod(col("doc_id"), lit(256)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_a"))
      .join(b.select(pmod(col("doc_id"), lit(256)).as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_b")),
        Seq("bucket"), "full_outer")
      .select(abs(coalesce(col("n_a"), lit(0L)) -
        coalesce(col("n_b"), lit(0L))).as("d"))
      .agg(sum(col("d"))).head.getLong(0)
    assert(deltas > 0L)
    // IbBank ~ 1.5x expected diff (the error message's own rule),
    // per-bank; double and resend while the peel still refuses
    var bank = (deltas * 3 / 2 / Maintenance.IbHashes + 1).toInt
    var decoded: Option[Array[(String, Long)]] = None
    var resends = 0
    // the count-delta estimate can be far low (an insert and a delete
    // in the SAME digest bucket cancel), so the doubling loop is load-
    // bearing, not a safety net — each resend still ships only O(cells)
    while (decoded.isEmpty && resends < 10) {
      try decoded = Some(Maintenance.ibltReconcileOf(a, b, bank).collect()
        .map(r => (r.getString(0), r.getLong(1))))
      catch {
        case e: IllegalStateException if e.getMessage.contains("resize") =>
          bank *= 2; resends += 1
      }
    }
    assert(decoded.nonEmpty, s"peel still refused after $resends doublings")
    // exact ground truth via EXCEPT
    val want = (a.exceptAll(b).select(lit("a_only").as("side"), col("doc_id"))
      .unionAll(b.exceptAll(a).select(lit("b_only").as("side"), col("doc_id"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(want.length > 900, s"fixture lost its sf1-scale diff: ${want.length}")
    assert(decoded.get.sorted.toSeq == want.toSeq,
      s"decode mismatch: ${decoded.get.length} vs ${want.length} rows")
    info(s"diff=${want.length} ids, count-delta estimate=$deltas, " +
      s"final bank=$bank after $resends resend(s)")
  }
}
