package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Pins the properties of the HLL sketch (q134), the bitext margin
  * scorer (q135), and the MinHash calibration matrix (q136) that the
  * DuckDB oracle doesn't express: register-level recomputation against
  * an independent sequential reference, the HLL merge law (the reason
  * the sketch exists), streaming/batch register parity, bit-exact
  * margin recomputation, and the matrix's mass accounting.
  */
class SketchEvalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // independent hash60: md5 via MessageDigest, top 15 hex chars
  private def hash60Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def refRegisters(): Map[(String, Long), Long] = {
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val regs = scala.collection.mutable.Map.empty[(String, Long), Long]
    for ((lang, text) <- docs) {
      val h = hash60Ref(text)
      val bucket = h >>> Sketches.HllW
      val rem = h & ((1L << Sketches.HllW) - 1)
      val rho =
        if (rem == 0) Sketches.HllW + 1L
        else java.lang.Long.numberOfLeadingZeros(rem) - (64 - Sketches.HllW) + 1L
      regs.updateWith((lang, bucket))(v => Some(math.max(v.getOrElse(0L), rho)))
    }
    regs.toMap
  }

  test("q134 HLL registers recompute from a sequential reference") {
    val got = Sketches.hllRegistersOf(
        graft.Tables.documents(spark, sf), "lang",
        graft.functions.TextFns.hash60(col("text")))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == refRegisters())
  }

  test("q134 HLL registers obey the merge law across a corpus split") {
    val docs = graft.Tables.documents(spark, sf)
    def regsOf(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegistersOf(df, "lang",
          graft.functions.TextFns.hash60(col("text")))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val full = regsOf(docs)
    val even = regsOf(docs.filter(col("doc_id") % 2 === 0))
    val odd = regsOf(docs.filter(col("doc_id") % 2 === 1))
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> math.max(even.getOrElse(k, 0L), odd.getOrElse(k, 0L))
    }.toMap
    assert(full == merged, "register max over shards must equal whole-corpus registers")
  }

  test("q134 estimate lands within the HLL error envelope per language") {
    val rows = graft.SparkEntry.queries("q134_hll_distinct")(spark, sf)
      .select("lang", "exact_distinct", "est").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (exact, est) = (r.getLong(1).toDouble, r.getDouble(2))
      // 1.04/sqrt(64) = 13% standard error; 4 sigma keeps the test
      // deterministic-corpus-proof while still failing on a broken rho
      assert(math.abs(est - exact) <= 4 * 1.04 / 8 * exact + 1,
        s"lang ${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("q134 streaming registers equal batch registers (complete mode)") {
    implicit val sql = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val (b1, b2) = docs.splitAt(docs.size / 2)
    import spark.implicits._
    val in = MemoryStream[(String, String)]
    in.addData(b1)
    in.addData(b2)
    val regs = Sketches.hllRegistersOf(
      in.toDF().toDF("lang", "text"), "lang",
      graft.functions.TextFns.hash60(col("text")))
    val q = regs.writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("hllregs")
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == refRegisters(),
      "incremental register maintenance must converge to the batch sketch")
  }

  test("q135 margins recompute bit-exactly from a sequential reference") {
    val got = graft.SparkEntry.queries("q135_bitext_margin")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // reference: same arithmetic order as CosineSimilarity + the
    // rank-ordered margin fold, straight-line Scala
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = vecs.filter(v => v._2 < 5 && v._1 < 128).sortBy(_._1)
    val tgt = vecs.filter(_._2 >= 5).sortBy(_._1)
    val k = Similarity.MarginK
    // top-k by (cos desc, id asc), summed in rank order
    def topkSum(cands: Seq[(Long, Double)]): Double =
      cands.sortBy { case (id, c) => (-c, id) }.take(k)
        .foldLeft(0.0) { case (acc, (_, c)) => acc + c }
    val pairCos = (for ((aid, _, av) <- qs; (bid, _, bv) <- tgt)
      yield ((aid, bid), cos(av, bv))).toMap
    val sumB = tgt.map { case (bid, _, _) =>
      bid -> topkSum(qs.map(q => (q._1, pairCos((q._1, bid)))).toSeq)
    }.toMap
    assert(got.keySet == qs.map(_._1).toSet)
    for ((aid, _, _) <- qs) {
      val cands = tgt.map(t => (t._1, pairCos((aid, t._1)))).toSeq
      val (bestB, bestCos) = cands.minBy { case (id, c) => (-c, id) }
      val margin = bestCos * (2.0 * k) / (topkSum(cands) + sumB(bestB))
      val (gotB, gotCos, gotMargin) = got(aid)
      assert(gotB == bestB, s"a=$aid best-match mismatch")
      assert(gotCos == bestCos, s"a=$aid cos mismatch")
      assert(gotMargin == margin, s"a=$aid margin mismatch")
    }
  }

  test("q136 matrix mass equals the q32 candidate pair count") {
    val matrix = graft.SparkEntry.queries("q136_minhash_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nPairs = graft.SparkEntry.queries("q32_minhash_lsh")(spark, sf).count()
    assert(matrix.map(_._3).sum == nPairs,
      "every candidate pair lands in exactly one calibration cell")
    for ((eb, xb, _) <- matrix) {
      assert(eb >= 0 && eb <= 10, s"est bucket $eb out of range")
      assert(xb >= 0 && xb <= 10, s"exact bucket $xb out of range")
    }
  }
}
