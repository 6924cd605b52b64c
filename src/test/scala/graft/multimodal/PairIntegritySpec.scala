package graft.multimodal

import graft.SparkSpec

/** Pins the q284 cross-modal pair-integrity audit on planted swaps: a
  * manifest that re-pairs two docs with differing content must flag
  * exactly those two claims (under the kinds of the CLAIMED media),
  * matched pairs must score exactly PairFpScale with equal norms,
  * PROPORTIONAL content (parallel vectors, cos2 = S) must flag via the
  * norm term, and a swap between IDENTICAL texts must NOT flag — the
  * one inherent limitation of any content-based gate, CLIP included
  * (equal embeddings on both sides are indistinguishable).
  */
class PairIntegritySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  // ids 0..5 -> kinds image(0,3), audio(1,4), video(2,5)
  private val texts = Seq(
    (0L, "alpha beta gamma delta"),
    (1L, "epsilon zeta eta theta"),
    (2L, "same words here exactly"),
    (3L, "iota kappa lambda mu"),
    (4L, "nu xi omicron pi"),
    (5L, "same words here exactly")) // identical to doc 2

  private def towers(rows: Seq[(Long, String)]) = {
    val docs = rows.toDF("doc_id", "text")
    val media = docs.as[(Long, String)].map { case (id, t) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      Multimodal.MediaRecord(id, kind, t.getBytes("UTF-8"))
    }
    (Multimodal.textVecsOf(docs), Multimodal.captionVecsOf(media))
  }

  private def fixture() = towers(texts)

  /** kind -> (n_pairs, n_flagged, n_norm_flagged, min_cos2_fp) */
  private def audit(tv: org.apache.spark.sql.DataFrame,
      mv: org.apache.spark.sql.DataFrame, pairs: Seq[(Long, Long)]) =
    Multimodal.pairIntegrityOf(tv, mv, pairs.toDF("doc_id", "media_id"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap

  test("matched manifest: zero flags, every kind at exactly PairFpScale") {
    val (tv, mv) = fixture()
    val got = audit(tv, mv, (0L to 5L).map(i => (i, i)))
    assert(got.keySet == Set("image", "audio", "video"))
    for ((k, (n, flagged, normFlagged, minc)) <- got) {
      assert(n == 2L, s"$k n_pairs $n")
      assert(flagged == 0L, s"$k flagged $flagged")
      assert(normFlagged == 0L, s"$k norm_flagged $normFlagged")
      assert(minc == Multimodal.PairFpScale, s"$k min_cos2 $minc")
    }
  }

  test("planted swap of differing docs flags exactly the swapped claims") {
    val (tv, mv) = fixture()
    // doc0 (text alpha..) claims media4 (audio tower of doc4's text),
    // doc4 claims media0 (image) — disjoint token sets, cos2 = 0
    val manifest = Seq((0L, 4L), (4L, 0L)) ++
      Seq(1L, 2L, 3L, 5L).map(i => (i, i))
    val got = audit(tv, mv, manifest)
    assert(got("audio") == ((2L, 1L, 0L, 0L)), s"audio ${got("audio")}")
    assert(got("image") == ((2L, 1L, 0L, 0L)), s"image ${got("image")}")
    assert(got("video") ==
      ((2L, 0L, 0L, Multimodal.PairFpScale)), s"video ${got("video")}")
  }

  test("proportional content scores cos2 = S but the norm term flags it") {
    // 'dup dup' vs 'dup': one shared hash bucket, so the count vectors
    // are PARALLEL — cosine² is exactly S and the cosine gate alone is
    // blind. Squared norms differ (4 vs 1), so the norm term catches
    // the adversarially-duplicated claim, counted in n_norm_flagged.
    val (tv, mv) = towers(Seq((0L, "dup dup"), (3L, "dup")))  // both image
    val got = audit(tv, mv, Seq((0L, 3L), (3L, 0L)))
    assert(got("image") == ((2L, 2L, 2L, Multimodal.PairFpScale)),
      s"image ${got("image")}")
  }

  test("swap between identical texts is invisible — inherent to any " +
      "content-based gate") {
    val (tv, mv) = fixture()
    // docs 2 and 5 share the text; both are 'video' media. Equal texts
    // give equal vectors — equal norms AND cos2 = S — so no signal
    // derived from content alone can separate this manifest from the
    // matched one. Named outcome: passes unflagged, by construction.
    val manifest = Seq((2L, 5L), (5L, 2L)) ++
      Seq(0L, 1L, 3L, 4L).map(i => (i, i))
    val got = audit(tv, mv, manifest)
    assert(got("video") ==
      ((2L, 0L, 0L, Multimodal.PairFpScale)), s"video ${got("video")}")
  }

  test("q284 on testdata flags exactly the planted manifest corruption") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("q284_pair_integrity")(spark, sf)
      .agg(sum(col("n_pairs")), sum(col("n_flagged"))).collect()(0)
    val expected = graft.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(23L)) === 3L).count()
    assert(rows.getLong(0) == 500L, s"pairs ${rows.getLong(0)}")
    assert(rows.getLong(1) == expected,
      s"flagged ${rows.getLong(1)} != planted $expected")
  }
}
