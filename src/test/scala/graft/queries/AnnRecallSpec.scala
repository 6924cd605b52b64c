package graft.queries

import graft.SparkSpec
import graft.functions.GraftFunctions

/** Pins the q275 ANN recall@k audit on planted fixtures. Corpus: 200
  * vectors in 10 tight clusters (primary axis 0..9) where each member
  * also carries a small w = 0.1 jitter on a secondary axis 40..55 — so
  * true nearest neighbors are SAME-CLUSTER (cos >= 0.99 vs ~0.01
  * cross-cluster) while the secondary axes are recall-irrelevant noise.
  *
  *  - GOOD codebook (10 centroids on the cluster axes): every query's
  *    probe-1 cell holds its whole cluster -> recall@10 exactly 1.
  *  - BAD codebook (16 centroids on the SECONDARY axes): assignment
  *    follows the jitter, scattering each cluster across 16 cells ->
  *    probe-1 recall collapses (~0.1) — exactly the failure q270's
  *    drift advisory would precede, and the number this audit exists
  *    to surface.
  *  - The 'brute' harness row must read exactly 2^20 on every recall
  *    column, and recall must be nondecreasing in probe depth.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val W = 0.1f

  private def vec(primary: Int, secondary: Int): Seq[Float] = {
    val a = Array.fill(64)(0f)
    a(primary) = 1f
    a(secondary) = W
    a.toIndexedSeq
  }

  // i in 0..199: cluster g = i % 10 (axis g), jitter h = (i/10) % 16
  // (axis 40+h). Queries are vec_id < 20 = the m = 0,1 member of each
  // cluster, per recallAuditOn's fixed sample.
  private lazy val corpus = (0 until 200)
    .map(i => (i.toLong, vec(i % 10, 40 + (i / 10) % 16)))
    .toDF("vec_id", "embedding")

  private def axisBook(cells: Int, axis0: Int) = (0 until cells)
    .map { c =>
      val a = Array.fill(64)(0f); a(axis0 + c) = 1f
      (c, a.toIndexedSeq)
    }
    .toDF("cell", "cvec")

  private def rows(book: org.apache.spark.sql.DataFrame) = {
    GraftFunctions.register(spark)
    Similarity.recallAuditOn(corpus, book).collect()
      .map(r => ((r.getAs[String]("idx"), r.getAs[Long]("param")), r)).toMap
  }

  private val FS = Similarity.FixScale

  test("brute harness row reads exactly 2^20 and good codebook hits full recall") {
    val m = rows(axisBook(10, 0))
    val brute = m(("brute", 0L))
    assert(brute.getAs[Long]("recall5_fp") == FS)
    assert(brute.getAs[Long]("recall10_fp") == FS)
    assert(brute.getAs[Long]("min_recall10_fp") == FS)
    assert(brute.getAs[Long]("mean_cand") == 199L)
    // cluster-aligned cells: the probe-1 cell holds the whole cluster
    val ivf1 = m(("ivf", 1L))
    assert(ivf1.getAs[Long]("recall10_fp") == FS, ivf1.toString)
    assert(ivf1.getAs[Long]("min_recall10_fp") == FS, ivf1.toString)
    // 20 cluster members per cell minus self
    assert(ivf1.getAs[Long]("mean_cand") == 19L, ivf1.toString)
  }

  test("bad codebook collapses probe-1 recall and the audit shows it") {
    val m = rows(axisBook(16, 40))
    val ivf1 = m(("ivf", 1L))
    // neighbors scatter over 16 jitter cells: probe-1 sees ~1/10 of them
    assert(ivf1.getAs[Long]("recall10_fp") <= FS / 2, ivf1.toString)
    // the harness row stays pinned even under the bad book
    assert(m(("brute", 0L)).getAs[Long]("recall10_fp") == FS)
    // recall is nondecreasing in probe depth (nested candidate sets)
    val byP = Similarity.RecallProbes.map(p => m(("ivf", p.toLong)).getAs[Long]("recall10_fp"))
    assert(byP == byP.sorted, byP.toString)
    val byH = Similarity.RecallHams.map(r => m(("srp", r.toLong)).getAs[Long]("recall10_fp"))
    assert(byH == byH.sorted, byH.toString)
    // every config row is present with the full query count
    assert(m.size == 1 + Similarity.RecallProbes.size + Similarity.RecallHams.size)
    m.values.foreach(r => assert(r.getAs[Long]("n_q") == Similarity.RecallQueries.toLong))
  }
}
