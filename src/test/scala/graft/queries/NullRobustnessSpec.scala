package graft.queries

import graft.SparkSpec

/** Degenerate-input hardening for the fixture-testable operator cores:
  * a production corpus ALWAYS contains rows the testdata doesn't —
  * NULL text, empty text, single-char docs, all-punctuation docs. The
  * library contract pinned here: no core throws (ANSI mode makes
  * silent-throw the default failure), NULL/empty documents simply
  * contribute nothing to token-derived frames, and corpus-level
  * reports still produce exact rows for the well-formed remainder.
  */
class NullRobustnessSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def degenerate() = Seq(
    (1L, "a normal english document with words", "en", "web", 37L),
    (2L, null.asInstanceOf[String], "en", "web", 0L),
    (3L, "", "en", "cc", 0L),
    (4L, "x", "en", "cc", 1L),
    (5L, "!!! ??? ...", "en", "books", 11L),
    (6L, "another normal document of words", "en", "books", 32L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token extraction: NULL and token-free docs contribute nothing") {
    val docs = degenerate()
    val toks = docs.select(col("doc_id"),
      explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
    val perDoc = toks.groupBy(col("doc_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!perDoc.contains(2L) && !perDoc.contains(3L) && !perDoc.contains(5L),
      s"NULL/empty/punctuation docs leaked tokens: $perDoc")
    assert(perDoc(1L) == 6L && perDoc(4L) == 1L && perDoc(6L) == 5L)
  }

  test("dedup signatures: shingle-ineligible docs are gated out entirely") {
    val sigs = Dedup.bandedSignatures(degenerate())
    val ids = sigs.select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    // NULL text, empty text, <3-token docs produce ZERO shingles —
    // without the gate they all share the sentinel signature and pair
    // at est_jaccard 1.0 with no content evidence (and at 100 TB pile
    // into one quadratic bucket). They are out of scope for
    // shingle-granularity LSH; exact dedup (q30) owns them.
    assert(ids == Set(1L, 6L), s"gate leaked: $ids")
  }

  test("LSH pairs over a degenerate-heavy corpus: no sentinel-signature pairs") {
    // four degenerate docs + two normal UNRELATED docs -> zero pairs;
    // before the gate the degenerate docs paired mutually at 1.0
    val pairs = Dedup.candidatePairsFrom(degenerate()).collect()
    assert(pairs.isEmpty, s"phantom pairs: ${pairs.mkString(",")}")
  }

  test("fluency scoring: trains and scores on the well-formed subset only") {
    val scored = Fluency.scoredOf(degenerate())
      .collect().map(r => r.getLong(0)).toSet
    assert(scored.contains(1L) && scored.contains(6L))
    assert(!scored.contains(2L) && !scored.contains(3L))
  }

  test("mixture learning survives domains made entirely of degenerate docs") {
    // 'web' has one real doc + the NULL doc; 'cc' is empty+single-char
    // only; 'books' has punctuation + one real doc — the aggregate must
    // produce a row per domain that has ANY scorable doc and never
    // throw on the ones that don't
    val mix = Mixture.mixtureOf(degenerate())
      .collect().map(r => r.getString(0)).toSet
    assert(mix.subsetOf(Set("web", "cc", "books")), s"unexpected domains: $mix")
    assert(mix.contains("web") && mix.contains("books"))
  }

  test("BPE training and apply survive a corpus with degenerate rows") {
    val wc = degenerate()
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val (learned, vocab) = TextAnalysis.bpeTrain(wc.localCheckpoint(), 2)
    assert(learned.size == 2)
    val applied = TextAnalysis.bpeApply(wc.select(col("w")),
      learned.map { case (_, l, r, _) => (l, r) })
    assert(applied.count() == vocab.count())
  }

  test("streaming encode: NULL/token-free text emits NO row (batch parity), " +
      "no throw") {
    val train = Seq((1L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val (merges, symIds) = TextAnalysis.tokenizerArtifact(train, rounds = 2)
    // r15-advice contract: batch q283 has no row for a token-free doc
    // (the word join drops it), so the stream filters the same docs —
    // stream/batch digest parity holds on ANY corpus, and degenerate
    // arrivals still never throw
    val got = TextAnalysis.encodeStream(
      Seq((7L, null.asInstanceOf[String]), (8L, ""), (9L, "alpha"))
        .toDF("doc_id", "text"), merges, symIds)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(got.keySet == Set(9L),
      s"token-free arrivals must be absent, got ${got.keySet}")
    val (t9, h9) = got(9L)
    assert(t9 > 0L && h9 > 0L)
    // the scalable path shares the contract
    val gotT = TextAnalysis.encodeStreamScalable(
      Seq((7L, null.asInstanceOf[String]), (8L, ""), (9L, "alpha"))
        .toDF("doc_id", "text"), merges, symIds)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(gotT == got, s"scalable path diverges: $gotT vs $got")
  }

  test("streaming encode: NULL doc_id rides through with its digest on " +
      "BOTH dispatch paths (r16-advice contract)") {
    val train = Seq((1L, "alpha beta alpha beta")).toDF("doc_id", "text")
    val (merges, symIds) = TextAnalysis.tokenizerArtifact(train, rounds = 2)
    // batch q283 groups a NULL doc_id into a NULL-keyed row; the two
    // stream dispatch branches of the same public API must agree —
    // before the boxed decode the scalable path THREW on this input
    // while the expression path passed it through
    val in = Seq((java.lang.Long.valueOf(3L), "alpha beta"),
        (null.asInstanceOf[java.lang.Long], "beta alpha"))
      .toDF("doc_id", "text")
    def digest(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0))) ->
          (r.getLong(2), r.getLong(4))).toMap
    val expr = digest(TextAnalysis.encodeStream(in, merges, symIds))
    val scal = digest(TextAnalysis.encodeStreamScalable(in, merges, symIds))
    assert(expr.keySet == Set(Some(3L), None),
      s"NULL doc_id must emit a row, got ${expr.keySet}")
    assert(scal == expr, s"scalable path diverges on NULL doc_id: $scal vs $expr")
    assert(expr(None)._1 > 0L && expr(None)._2 > 0L,
      s"NULL-doc_id digest empty: ${expr(None)}")
  }
}
