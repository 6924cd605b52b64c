package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.TextFns._

/** Document-gating filters of the C4 / MassiveText lineage: the cheap,
  * rule-based scrubbing passes every LLM ingest pipeline runs BEFORE
  * the expensive dedup/similarity stages. The reference (affo/ssp) has
  * no corpus surface at all — these extend the engine the way its users
  * would write filter callbacks (reference node.go:57-73 stateless
  * nodes), but as declarative single-scan projections.
  *
  * Scale design: both queries are scan → codegen'd per-row expression
  * chain → presentation sort. No join, no aggregation, no shuffle of
  * corpus data (the ORDER BY is the driver-contract presentation sort;
  * a production gate writes the keep flag back partition-local). The
  * blocklist and the rule thresholds are literals folded into
  * WholeStageCodegen — at 100 TB the cost is exactly one pass over the
  * text bytes, and the filters compose with scan-side column pruning
  * (only doc_id + text are read).
  */
object Filtering {

  /** q111 blocklist — term denylist of the C4 "bad words" form. Terms
    * are matched on the canonical token stream (lowercased alnum runs),
    * not raw substrings, so "dup" does not fire inside "dedup" — the
    * published filters match on word boundaries for exactly this
    * reason. "broken" never occurs in the corpus, pinning the
    * no-match path.
    */
  val Blocklist: Seq[String] = Seq("slow", "dup", "broken")

  // q111 — denylist gate: per-document blocklisted-token occurrence
  // count, distinct offending terms, and the keep decision (zero
  // tolerance, as in C4). One corpus scan; the token array is built
  // once and both measures fold over it inside codegen.
  private def q111(s: SparkSession, d: String): DataFrame = {
    val bl = array(Blocklist.map(lit): _*)
    val toks = tokens(col("text"))
    documents(s, d).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_toks"),
      size(filter(toks, t => array_contains(bl, t))).cast("long").as("bl_hits"),
      size(array_intersect(toks, bl)).cast("long").as("bl_terms"),
      when(size(filter(toks, t => array_contains(bl, t))) === 0, 1L)
        .otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val q111Sql = {
    val blArr = Blocklist.map(t => s"'$t'").mkString("[", ", ", "]")
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |  FROM documents)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |  CAST(len(list_filter(toks, x -> list_contains($blArr, x))) AS BIGINT)
      |    AS bl_hits,
      |  CAST(len(list_intersect(toks, $blArr)) AS BIGINT) AS bl_terms,
      |  CAST(CASE WHEN len(list_filter(toks, x -> list_contains($blArr, x))) = 0
      |    THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM t
      |ORDER BY doc_id""".stripMargin
  }

  /** q113 rule thresholds — the Gopher/MassiveText quality-heuristic
    * set (Rae et al. 2021, §A1.1), bounds scaled to this corpus's
    * 10-99-token documents so every rule fires both ways. All rules
    * evaluate in exact integer arithmetic: the mean-word-length band
    * is stated as 10·Σlen vs bound·n cross-multiplication (tenths), the
    * repetition cap as 10·(n−distinct) ≤ cap·n — no float compare sits
    * on a threshold boundary in either engine.
    */
  val MinWords = 20L
  val MaxWords = 90L
  val MinMeanLenTenths = 42L // mean token length ≥ 4.2 chars
  val MaxMeanLenTenths = 100L // ≤ 10.0 chars
  val MaxDupFracTenths = 6L // duplicate-token fraction ≤ 0.6
  val Stopwords: Seq[String] = Seq("the", "a")

  // q113 — quality-rule gate: word-count band, mean-word-length band,
  // stopword presence (both corpus stopwords required), duplicate-token
  // repetition cap; keep = every rule passes. The per-rule flags are
  // emitted (not just the verdict) because production pipelines track
  // rejection reasons per rule.
  private def q113(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("sum_chars"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        Stopwords.map(w => array_contains(col("toks"), w)).reduce(_ && _).as("__stop"))
      .select(
        col("doc_id"), col("n_words"), col("sum_chars"), col("n_distinct"),
        (col("n_words") >= MinWords && col("n_words") <= MaxWords).cast("long")
          .as("r_words"),
        (col("sum_chars") * 10 >= col("n_words") * MinMeanLenTenths &&
          col("sum_chars") * 10 <= col("n_words") * MaxMeanLenTenths).cast("long")
          .as("r_wordlen"),
        col("__stop").cast("long").as("r_stopwords"),
        ((col("n_words") - col("n_distinct")) * 10 <=
          col("n_words") * MaxDupFracTenths).cast("long").as("r_repetition"))
      .withColumn("keep",
        (col("r_words") === 1 && col("r_wordlen") === 1 &&
          col("r_stopwords") === 1 && col("r_repetition") === 1).cast("long"))
      .orderBy(col("doc_id"))
  }

  private val q113Sql = {
    val stopPred = Stopwords
      .map(w => s"list_contains(toks, '$w')").mkString(" AND ")
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT)
      |      AS sum_chars,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    ($stopPred) AS stop_ok
      |  FROM t)
      |SELECT doc_id, n_words, sum_chars, n_distinct,
      |  CAST(CASE WHEN n_words BETWEEN $MinWords AND $MaxWords
      |    THEN 1 ELSE 0 END AS BIGINT) AS r_words,
      |  CAST(CASE WHEN sum_chars * 10 BETWEEN n_words * $MinMeanLenTenths
      |      AND n_words * $MaxMeanLenTenths
      |    THEN 1 ELSE 0 END AS BIGINT) AS r_wordlen,
      |  CAST(CASE WHEN stop_ok THEN 1 ELSE 0 END AS BIGINT) AS r_stopwords,
      |  CAST(CASE WHEN (n_words - n_distinct) * 10 <= n_words * $MaxDupFracTenths
      |    THEN 1 ELSE 0 END AS BIGINT) AS r_repetition,
      |  CAST(CASE WHEN n_words BETWEEN $MinWords AND $MaxWords
      |      AND sum_chars * 10 BETWEEN n_words * $MinMeanLenTenths
      |        AND n_words * $MaxMeanLenTenths
      |      AND stop_ok
      |      AND (n_words - n_distinct) * 10 <= n_words * $MaxDupFracTenths
      |    THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM m
      |ORDER BY doc_id""".stripMargin
  }

  // q120 — drop-reason attribution: every document mapped to the FIRST
  // curation gate that fires, in pipeline order: benchmark slice →
  // blocklist (q111) → quality rules (q113) → exact-dup
  // non-representative (q30/q31 fingerprint, corpus-wide min-id
  // representative) → contamination (q73) → keep. Production pipelines
  // need exactly this audit ("why did my corpus shrink 40%?") and it
  // is the observability twin of the q55/q90 selection capstones.
  //
  // Scale shape: one corpus scan computes every per-doc gate input;
  // the dup gate shuffles only (fp → min doc_id) 8-byte pairs; the
  // contamination branch reuses q73's broadcast benchmark-array merge
  // pass (single scan, no corpus shuffle); the final left join keys by
  // doc_id. Reason strings are attributed per gate ORDER, so numbers
  // reconcile exactly against each standalone gate query.
  /** Core over (doc_id, text) — fixture-testable (q120 passes the
    * driver table).
    */
  private[graft] def dropReasonsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bl = array(Blocklist.map(lit): _*)
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        hash60(normalize(col("text"))).as("fp"))
      .select(col("doc_id"), col("fp"),
        size(filter(col("toks"), t => array_contains(bl, t))).cast("long").as("bl_hits"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("sum_chars"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        Stopwords.map(w => array_contains(col("toks"), w)).reduce(_ && _).as("stop_ok"))
      .withColumn("fp_min", min(col("doc_id")).over(Window.partitionBy(col("fp"))))
    val contam = Contamination.contaminationOf(docs)
      .select(col("doc_id"), col("contaminated"))
    val rulesOk = col("n_words") >= MinWords && col("n_words") <= MaxWords &&
      col("sum_chars") * 10 >= col("n_words") * MinMeanLenTenths &&
      col("sum_chars") * 10 <= col("n_words") * MaxMeanLenTenths &&
      col("stop_ok") &&
      (col("n_words") - col("n_distinct")) * 10 <= col("n_words") * MaxDupFracTenths
    base.join(contam, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % Contamination.BenchMod === 0, "benchmark")
          .when(col("bl_hits") > 0, "blocklist")
          .when(!rulesOk, "rules")
          .when(col("fp_min") =!= col("doc_id"), "duplicate")
          .when(col("contaminated") === 1, "contaminated")
          .otherwise("keep").as("reason"))
      .orderBy(col("doc_id"))
  }

  private def q120(s: SparkSession, d: String): DataFrame =
    dropReasonsOf(documents(s, d))

  private val q120Sql = {
    val blArr = Blocklist.map(t => s"'$t'").mkString("[", ", ", "]")
    val stopPred = Stopwords.map(w => s"list_contains(toks, '$w')").mkString(" AND ")
    val g = Contamination.GramLen
    val gram = (0 until g).map(j => s"toks[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '$TokenPattern') AS toks,
      |    ${hash60Sql(normalizeSql("text"))} AS fp
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, fp,
      |    len(list_filter(toks, x -> list_contains($blArr, x))) AS bl_hits,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0) AS BIGINT)
      |      AS sum_chars,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    ($stopPred) AS stop_ok,
      |    min(doc_id) OVER (PARTITION BY fp) AS fp_min
      |  FROM t),
      |grams AS (
      |  SELECT doc_id, list_sort(list_distinct(list_transform(
      |    range(greatest(len(toks) - ${g - 1}, 0)),
      |    i -> ${hash60Sql(gram)}))) AS gs
      |  FROM t),
      |bench AS (
      |  SELECT list_sort(list_distinct(flatten(list(gs)))) AS bg
      |  FROM grams WHERE doc_id % ${Contamination.BenchMod} = 0),
      |contam AS (
      |  SELECT gr.doc_id,
      |    CASE WHEN len(gr.gs) > 0
      |        AND len(list_intersect(gr.gs, b.bg)) * 2 >= len(gr.gs)
      |      THEN 1 ELSE 0 END AS contaminated
      |  FROM grams gr, bench b
      |  WHERE gr.doc_id % ${Contamination.BenchMod} <> 0)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % ${Contamination.BenchMod} = 0 THEN 'benchmark'
      |    WHEN d.bl_hits > 0 THEN 'blocklist'
      |    WHEN NOT (d.n_words BETWEEN $MinWords AND $MaxWords
      |        AND d.sum_chars * 10 BETWEEN d.n_words * $MinMeanLenTenths
      |          AND d.n_words * $MaxMeanLenTenths
      |        AND d.stop_ok
      |        AND (d.n_words - d.n_distinct) * 10 <= d.n_words * $MaxDupFracTenths)
      |      THEN 'rules'
      |    WHEN d.fp_min <> d.doc_id THEN 'duplicate'
      |    WHEN c.contaminated = 1 THEN 'contaminated'
      |    ELSE 'keep' END AS reason
      |FROM m d LEFT JOIN contam c USING (doc_id)
      |ORDER BY doc_id""".stripMargin
  }

  // q172 — quality-score calibration curve: does the CHEAP heuristic
  // score (q52's ttr·len_ok) predict the verdict of the FULL Gopher
  // rule gate (q113)? Documents rank into score deciles
  // (rankDistributed — no corpus-wide sort window) and each decile
  // reports its rule-gate pass rate in 2^20 fixed point. A monotone
  // curve certifies the cheap score as a pre-filter; a flat one says
  // it's noise — the reliability-diagram audit run before replacing an
  // expensive gate with a cheap proxy. Ordering on the score doubles
  // is deterministic: each is one IEEE division (ttr), identical bits
  // in both engines; ties break by doc_id.
  private def q172(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val base = documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("sum_chars"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        Stopwords.map(w => array_contains(col("toks"), w)).reduce(_ && _)
          .cast("long").as("stop_ok"))
      .select(col("doc_id"), col("n_words"), col("sum_chars"),
        col("n_distinct"), col("stop_ok"),
        ((col("n_distinct").cast("double") / greatest(col("n_words"), lit(1L))) *
          when(col("n_words") >= 20 && col("n_words") <= 1000, 1.0)
            .otherwise(0.0)).as("quality"),
        ((col("n_words") >= MinWords && col("n_words") <= MaxWords) &&
          (col("sum_chars") * 10 >= col("n_words") * MinMeanLenTenths &&
            col("sum_chars") * 10 <= col("n_words") * MaxMeanLenTenths) &&
          col("stop_ok") === 1 &&
          ((col("n_words") - col("n_distinct")) * 10 <=
            col("n_words") * MaxDupFracTenths)).cast("long").as("keep"))
    // the corpus count rides on the ranked rows as a column (r18 fused
    // operator) — no totals cross-join
    val ranked = Sampling.rankDistributedWithCounts(
      base.select(col("doc_id"), col("quality"), col("keep")),
      Seq.empty, Seq(col("quality"), col("doc_id")), "n_docs")
    ranked
      .withColumn("decile", expr("(rk - 1) * 10 DIV n_docs"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_keep"))
      .withColumn("keep_rate_fp", expr("n_keep * 1048576 DIV n_docs"))
      .orderBy(col("decile"))
  }

  private val q172Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val stopPred = Stopwords.map(w => s"list_contains(toks, '$w')")
      .mkString(" AND ")
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0)
      |      AS BIGINT) AS sum_chars,
      |    len(list_distinct(toks)) AS n_distinct,
      |    CASE WHEN $stopPred THEN 1 ELSE 0 END AS stop_ok
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |b AS (
      |  SELECT doc_id,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality,
      |    CASE WHEN n_words BETWEEN $MinWords AND $MaxWords
      |      AND sum_chars * 10 >= n_words * $MinMeanLenTenths
      |      AND sum_chars * 10 <= n_words * $MaxMeanLenTenths
      |      AND stop_ok = 1
      |      AND (n_words - n_distinct) * 10 <= n_words * $MaxDupFracTenths
      |      THEN 1 ELSE 0 END AS keep
      |  FROM t),
      |r AS (
      |  SELECT keep, row_number() OVER (ORDER BY quality, doc_id) AS rk,
      |    count(*) OVER () AS n_docs
      |  FROM b)
      |SELECT (rk - 1) * 10 // n_docs AS decile, count(*) AS n_docs,
      |  CAST(sum(keep) AS BIGINT) AS n_keep,
      |  CAST(sum(keep) * 1048576 // count(*) AS BIGINT) AS keep_rate_fp
      |FROM r GROUP BY 1 ORDER BY decile""".stripMargin
  }

  // q176 — distribution-drift monitor: the quality-score decile
  // distribution of one ingest half against the other (halves proxied
  // by doc_id parity; production compares batch N to batch N−1), with
  // the total-variation distance in 2^20 fixed point as the drift
  // alarm. TVD = ½·Σ|share_A − share_B| over GLOBAL decile buckets
  // (boundaries from the combined corpus, so both halves are measured
  // on the same ruler — the PSI/KS-class check a training pipeline
  // runs before letting a new crawl batch in; TVD instead of PSI keeps
  // every operand an exact integer, no cross-engine log). Ranks via
  // rankDistributed; everything after is 10-row arithmetic.
  /** (doc_id, quality) — q176's quality scorer over any frame with
    * (doc_id, text), factored out so the streaming drift twin scores
    * arriving documents with the identical expression.
    */
  private[graft] def qualityScored(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"))
      .select(col("doc_id"),
        ((col("n_distinct").cast("double") / greatest(col("n_words"), lit(1L))) *
          when(col("n_words") >= 20 && col("n_words") <= 1000, 1.0)
            .otherwise(0.0)).as("quality"))
  }

  private def q176(s: SparkSession, d: String): DataFrame = {
    val base = qualityScored(documents(s, d))
    val ranked = Sampling.rankDistributedWithCounts(base, Seq.empty,
      Seq(col("quality"), col("doc_id")), "n_docs")
    val cells = ranked
      .withColumn("decile", expr("(rk - 1) * 10 DIV n_docs"))
      .groupBy(col("decile"))
      .agg(sum(when(pmod(col("doc_id"), lit(2)) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(pmod(col("doc_id"), lit(2)) === 1, 1L).otherwise(0L)).as("n_b"))
    val w = Window.partitionBy(lit(1)) // 10 decile rows
    cells
      .withColumn("tot_a", sum(col("n_a")).over(w))
      .withColumn("tot_b", sum(col("n_b")).over(w))
      .withColumn("share_a_fp", expr("n_a * 1048576 DIV tot_a"))
      .withColumn("share_b_fp", expr("n_b * 1048576 DIV tot_b"))
      .withColumn("dev_fp", abs(col("share_a_fp") - col("share_b_fp")))
      .withColumn("tvd_fp", expr("CAST(sum(dev_fp) OVER " +
        "(PARTITION BY 1) DIV 2 AS BIGINT)"))
      .select(col("decile"), col("n_a"), col("n_b"),
        col("share_a_fp"), col("share_b_fp"), col("dev_fp"), col("tvd_fp"))
      .orderBy(col("decile"))
  }

  private val q176Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS n_words, len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |b AS (
      |  SELECT doc_id,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM t),
      |r AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY quality, doc_id) AS rk,
      |    count(*) OVER () AS n_docs
      |  FROM b),
      |c AS (
      |  SELECT (rk - 1) * 10 // n_docs AS decile,
      |    sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
      |    sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_b
      |  FROM r GROUP BY 1),
      |s AS (
      |  SELECT decile, n_a, n_b,
      |    n_a * 1048576 // sum(n_a) OVER () AS share_a_fp,
      |    n_b * 1048576 // sum(n_b) OVER () AS share_b_fp
      |  FROM c),
      |f AS (
      |  SELECT decile, n_a, n_b, share_a_fp, share_b_fp,
      |    abs(share_a_fp - share_b_fp) AS dev_fp
      |  FROM s)
      |SELECT decile, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
      |  CAST(share_a_fp AS BIGINT) AS share_a_fp,
      |  CAST(share_b_fp AS BIGINT) AS share_b_fp,
      |  CAST(dev_fp AS BIGINT) AS dev_fp,
      |  CAST(sum(dev_fp) OVER () // 2 AS BIGINT) AS tvd_fp
      |FROM f ORDER BY decile""".stripMargin
  }

  // q215 — split-conformal coverage gate: calibrate the quality
  // threshold on the even-doc_id half so that, under exchangeability,
  // at least 90% of unseen documents score above it — τ is the k-th
  // SMALLEST calibration quality with k = ⌈0.1·(n_cal+1)⌉ (exact
  // integer: (n_cal+1+9) DIV 10) — then MEASURE the realized coverage
  // on the held-out odd half. This is the distribution-free way to
  // turn an uncalibrated heuristic score (q52) into a gate with a
  // guarantee, and the coverage check is the audit that the
  // exchangeability assumption held. τ is an ELEMENT of the data (no
  // aggregate arithmetic), so both engines pick the bit-identical
  // double; every other output is integer.
  //
  // Scale shape: one rank pass over the calibration half
  // (rankDistributed — no single-partition sort), a 1-row τ broadcast
  // into the test-half scan, a 1-row report.
  private def q215(s: SparkSession, d: String): DataFrame = {
    val scored = qualityScored(documents(s, d))
    val cal = scored.filter(pmod(col("doc_id"), lit(2)) === 0)
    val test = scored.filter(pmod(col("doc_id"), lit(2)) === 1)
    // n_cal rides on the ranked rows as a column (r18 fused operator) —
    // no totals cross-join, and no second pass over the scoring
    // subtree for one number
    val ranked = Sampling.rankDistributedWithCounts(cal, Seq.empty,
      Seq(col("quality"), col("doc_id")), "n_cal")
    val tau = ranked
      .filter(col("rk") === expr("(n_cal + 10) DIV 10"))
      .select(col("n_cal"), col("rk").as("k"), col("quality").as("tau"))
    test.crossJoin(broadcast(tau))
      .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
        max(col("tau")).as("tau"),
        count(lit(1)).as("n_test"),
        sum(when(col("quality") >= col("tau"), 1L).otherwise(0L)).as("n_covered"))
      .withColumn("coverage_fp",
        expr("CAST(n_covered * 1048576 DIV n_test AS BIGINT)"))
  }

  private val q215Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS n_words, len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |sc AS (
      |  SELECT doc_id,
      |    (CAST(n_distinct AS DOUBLE) / greatest(n_words, 1)) *
      |      (CASE WHEN n_words BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM t),
      |cal AS (SELECT * FROM sc WHERE doc_id % 2 = 0),
      |r AS (SELECT quality,
      |    row_number() OVER (ORDER BY quality, doc_id) AS rk,
      |    count(*) OVER () AS n_cal
      |  FROM cal),
      |tau AS (
      |  SELECT n_cal, rk AS k, quality AS tau FROM r
      |  WHERE rk = (n_cal + 10) // 10)
      |SELECT CAST(tau.n_cal AS BIGINT) AS n_cal, CAST(tau.k AS BIGINT) AS k,
      |  tau.tau,
      |  count(*) AS n_test,
      |  CAST(sum(CASE WHEN sc.quality >= tau.tau THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_covered,
      |  CAST(sum(CASE WHEN sc.quality >= tau.tau THEN 1 ELSE 0 END) * 1048576
      |    // count(*) AS BIGINT) AS coverage_fp
      |FROM sc, tau WHERE sc.doc_id % 2 = 1
      |GROUP BY 1, 2, 3""".stripMargin
  }

  // q228 — round-11 gate-stack capstone: one scan of the corpus
  // through FOUR independent admission gates — the length window
  // (q52), the lexical-diversity test (q204's rater B), the
  // entropy-floor repetition gate (q226, ≥ 2.0 bits/token), and the
  // conformally calibrated quality threshold (q215's τ, fitted on the
  // even-doc half, applied to everyone) — reported as the
  // per-gate/pass-all funnel every curation run reads before
  // committing a corpus release. The gates deliberately overlap in
  // intent but not mechanism, so the pass-all count is the defensible
  // one and the per-gate deltas say which gate does the work.
  //
  // Scale shape: the token-count explode (q226's shape) and the
  // calibration rank are the only shuffles; τ is a 1-row broadcast;
  // the report is one row.
  private def q228(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val base = documents(s, d).select(col("doc_id"),
      size(toks).cast("long").as("nw"),
      size(array_distinct(toks)).cast("long").as("nd"))
    // entropy bits (q226 arithmetic)
    val cnt = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val n = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n_toks"))
    val ent = cnt.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("n_toks"),
        expr("c * (length(bin(n_toks DIV c)) - 1)").as("b"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_toks")).as("n_toks"), sum(col("b")).as("h_bits"))
      .select(col("doc_id"),
        (expr("h_bits * 256 DIV greatest(n_toks, 1)") >=
          TextAnalysis.BitsPerTokGateX256).as("g_ent"))
    // conformal τ (q215 arithmetic, calibrated on even doc_ids)
    val scored = qualityScored(documents(s, d))
    val cal = scored.filter(pmod(col("doc_id"), lit(2)) === 0)
    val ranked = Sampling.rankDistributedWithCounts(cal, Seq.empty,
      Seq(col("quality"), col("doc_id")), "n_cal")
    val tau = ranked
      .filter(col("rk") === expr("(n_cal + 10) DIV 10"))
      .select(col("quality").as("tau"))
    base
      .join(scored, Seq("doc_id"))
      .join(ent, Seq("doc_id"))
      .crossJoin(broadcast(tau))
      .select(
        (col("nw") >= 20 && col("nw") <= 1000).as("g_len"),
        (col("nd") * 2 >= col("nw")).as("g_div"),
        col("g_ent"),
        (col("quality") >= col("tau")).as("g_conf"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("g_len"), 1L).otherwise(0L)).as("n_len"),
        sum(when(col("g_div"), 1L).otherwise(0L)).as("n_div"),
        sum(when(col("g_ent"), 1L).otherwise(0L)).as("n_ent"),
        sum(when(col("g_conf"), 1L).otherwise(0L)).as("n_conf"),
        sum(when(col("g_len") && col("g_div") && col("g_ent") && col("g_conf"),
          1L).otherwise(0L)).as("n_all"))
      .withColumn("all_share_fp",
        expr("CAST(n_all * 1048576 DIV n_docs AS BIGINT)"))
  }

  private val q228Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS nw, len(list_distinct(toks)) AS nd
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |w AS (
      |  SELECT doc_id, unnest(toks) AS tok
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t1),
      |cnt AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
      |nn AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks
      |  FROM cnt GROUP BY doc_id),
      |ent AS (
      |  SELECT cnt.doc_id,
      |    CAST(sum(c * (length(printf('%b', n_toks // c)) - 1)) AS BIGINT)
      |      * 256 // greatest(max(n_toks), 1)
      |      >= ${TextAnalysis.BitsPerTokGateX256} AS g_ent
      |  FROM cnt JOIN nn USING (doc_id)
      |  GROUP BY cnt.doc_id),
      |sc AS (
      |  SELECT doc_id,
      |    (CAST(nd AS DOUBLE) / greatest(nw, 1)) *
      |      (CASE WHEN nw BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality, nw, nd
      |  FROM t),
      |cal AS (SELECT * FROM sc WHERE doc_id % 2 = 0),
      |r AS (SELECT quality,
      |    row_number() OVER (ORDER BY quality, doc_id) AS rk,
      |    count(*) OVER () AS n_cal
      |  FROM cal),
      |tau AS (SELECT quality AS tau FROM r WHERE rk = (n_cal + 10) // 10),
      |g AS (
      |  SELECT (sc.nw >= 20 AND sc.nw <= 1000) AS g_len,
      |    (sc.nd * 2 >= sc.nw) AS g_div,
      |    ent.g_ent,
      |    (sc.quality >= tau.tau) AS g_conf
      |  FROM sc JOIN ent USING (doc_id), tau)
      |SELECT count(*) AS n_docs,
      |  CAST(sum(CASE WHEN g_len THEN 1 ELSE 0 END) AS BIGINT) AS n_len,
      |  CAST(sum(CASE WHEN g_div THEN 1 ELSE 0 END) AS BIGINT) AS n_div,
      |  CAST(sum(CASE WHEN g_ent THEN 1 ELSE 0 END) AS BIGINT) AS n_ent,
      |  CAST(sum(CASE WHEN g_conf THEN 1 ELSE 0 END) AS BIGINT) AS n_conf,
      |  CAST(sum(CASE WHEN g_len AND g_div AND g_ent AND g_conf
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_all,
      |  CAST(sum(CASE WHEN g_len AND g_div AND g_ent AND g_conf
      |    THEN 1 ELSE 0 END) * 1048576 // count(*) AS BIGINT) AS all_share_fp
      |FROM g""".stripMargin
  }

  // ---- q260: isotonic calibration (least-squares monotone fit) ----------

  /** Calibration grid: the cheap score is bucketed to ≤ CalibBins + 1
    * distinct values before fitting, so the fit state is
    * DATA-INDEPENDENT in size (production calibrators bin for exactly
    * this reason) and the m² pairwise-slope hull test below is
    * constant-cost at any corpus scale.
    */
  val CalibBins = 1024L

  /** 2^80 as a decimal literal: the slope-key scale. Two distinct
    * slopes (dS/dN, both ≤ 1, dN ≤ #docs) differ by ≥ 1/dN² > 2^-80
    * for any corpus under 2^40 documents, so floor(dS·2^80/dN) is an
    * order-isomorphic INTEGER key for exact slope comparisons — no
    * float ever enters the fit.
    */
  val SlopeScale = "1208925819614629174706176"

  /** Exact floor(num·2^80 / den) on nonnegative integer-valued columns,
    * staged through DECIMAL(38,0) (the HUGEINT-headroom rule): the
    * product tops out at 2^40·2^80 = 2^120 < 10^38, and subtracting
    * the remainder first makes the decimal division exact.
    */
  private def slopeKey(num: Column, den: Column): Column = {
    val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val p = num.cast(d38) * lit(SlopeScale).cast(d38)
    ((p - p % den.cast(d38)) / den.cast(d38)).cast(d38)
  }

  /** Least-squares isotonic (monotone non-decreasing) fit of s/n over
    * blocks (x, n, s), one declarative shot: the fitted curve is the
    * left derivative of the GREATEST CONVEX MINORANT of the cumulative
    * sum diagram (N_i, S_i) (Barlow et al. 1972 — the geometry behind
    * pool-adjacent-violators), and a CSD point is a hull vertex iff
    * max(incoming slope) ≤ min(outgoing slope) over ALL pairs — an m²
    * self-join with exact integer slope keys, with no iteration and no
    * convergence question (a round-based parallel PAV needs O(m)
    * rounds on adversarial "zipper" inputs; this needs one pass).
    * Returns (x, n, s, yhat_fp) per input block, yhat in 2^20 fixed
    * point; fitted values are the unique isotonic-L2 minimizer, so any
    * correct implementation (e.g. DuckDB replaying the same geometry)
    * matches bit-for-bit.
    */
  private[graft] def isotonicFit(blocks: DataFrame): DataFrame = {
    val w = Window.orderBy(col("x"))
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // CSD points P_i = (N_i, S_i), plus the origin P_0 — grid-bounded
    // (≤ CalibBins + 2 rows), so the single-partition windows and the
    // m² pair join below are constant-cost regardless of corpus size
    val pts = blocks
      .select(col("x"), col("n"), col("s"),
        row_number().over(w).as("i"),
        sum(col("n")).over(wc).as("cn"),
        sum(col("s")).over(wc).as("cs"))
      .localCheckpoint()
    val csd = pts.select(col("i"), col("cn"), col("cs"))
      .unionAll(pts.sparkSession.range(1)
        .select(lit(0).as("i"), lit(0L).as("cn"), lit(0L).as("cs")))
    val pairs = csd.as("a").join(csd.as("b"), col("a.i") < col("b.i"))
      .select(col("a.i").as("i"), col("b.i").as("k"),
        slopeKey(col("b.cs") - col("a.cs"), col("b.cn") - col("a.cn"))
          .as("key"))
      .localCheckpoint()
    val bmax = pairs.groupBy(col("k").as("t")).agg(max(col("key")).as("bmax"))
    val amin = pairs.groupBy(col("i").as("t")).agg(min(col("key")).as("amin"))
    // hull vertex ⟺ steepest incoming ≤ shallowest outgoing; the two
    // endpoints (no incoming / no outgoing side) are always vertices
    val verts = csd
      .join(bmax, col("i") === col("t"), "left").drop("t")
      .join(amin, col("i") === col("t"), "left").drop("t")
      .where(coalesce(col("bmax") <= col("amin"), lit(true)))
      .select(col("i").as("vi"), col("cn").as("vn"), col("cs").as("vs"))
    val wv = Window.orderBy(col("vi"))
    val segs = verts
      .select(col("vi"), col("vn"), col("vs"),
        lead(col("vi"), 1).over(wv).as("vi2"),
        lead(col("vn"), 1).over(wv).as("vn2"),
        lead(col("vs"), 1).over(wv).as("vs2"))
      .where(col("vi2").isNotNull)
    // every block index t falls in exactly one hull segment (vi, vi2];
    // its fitted value is that segment's slope
    pts.join(broadcast(segs),
        col("i") > col("vi") && col("i") <= col("vi2"))
      .select(col("x"), col("n"), col("s"),
        expr("CAST(CAST(vs2 - vs AS DECIMAL(38,0)) * 1048576 DIV (vn2 - vn) AS BIGINT)")
          .as("yhat_fp"))
  }

  // q260 — ISOTONIC calibration: fit the best monotone non-decreasing
  // map from q172's cheap quality score to its expensive gate outcome.
  // q172 only bins the score into deciles and reports raw rates — a
  // reliability DIAGRAM; the isotonic fit (Ayer et al. 1955; Zadrozny
  // & Elkan 2002; what Spark MLlib's IsotonicRegression computes) is
  // the least-squares MONOTONE curve — the thing you can actually
  // threshold to replace the expensive gate. Exact integer arithmetic
  // throughout: scores quantized to a 1024-bin grid, slope tests on
  // scaled-integer keys, fitted means emitted in 2^20 fixed point.
  //
  // Scale shape: the corpus-sized work is ONE scan into the per-bin
  // block aggregate (map-side combinable groupBy); the fit then runs
  // on grid-bounded state (≤ 1026 CSD points → ≤ ~526k slope pairs),
  // constant at any corpus size — the same grid-bounded argument as
  // the q-digest compression and the IBLT cell table.
  private def q260(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val base = documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (a, x) => a + length(x)).as("sum_chars"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        Stopwords.map(w => array_contains(col("toks"), w)).reduce(_ && _)
          .cast("long").as("stop_ok"))
      .select(
        expr(s"""CASE WHEN n_words BETWEEN 20 AND 1000
               |  THEN (n_distinct * 1048576 DIV n_words) DIV $CalibBins
               |  ELSE 0 END""".stripMargin).as("x"),
        ((col("n_words") >= MinWords && col("n_words") <= MaxWords) &&
          (col("sum_chars") * 10 >= col("n_words") * MinMeanLenTenths &&
            col("sum_chars") * 10 <= col("n_words") * MaxMeanLenTenths) &&
          col("stop_ok") === 1 &&
          ((col("n_words") - col("n_distinct")) * 10 <=
            col("n_words") * MaxDupFracTenths)).cast("long").as("y"))
    val blocks = base.groupBy(col("x"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    isotonicFit(blocks)
      .select(col("x").as("x_bin"), col("n").as("n_docs"),
        col("s").as("n_pos"), col("yhat_fp"))
      .orderBy(col("x_bin"))
  }

  private val q260Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val stopPred = Stopwords.map(w => s"list_contains(toks, '$w')")
      .mkString(" AND ")
    s"""WITH t AS (
      |  SELECT doc_id, len(toks) AS n_words,
      |    CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0)
      |      AS BIGINT) AS sum_chars,
      |    len(list_distinct(toks)) AS n_distinct,
      |    CASE WHEN $stopPred THEN 1 ELSE 0 END AS stop_ok
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |xy AS (
      |  SELECT CASE WHEN n_words BETWEEN 20 AND 1000
      |      THEN (n_distinct * 1048576 // n_words) // $CalibBins
      |      ELSE 0 END AS x,
      |    CASE WHEN n_words BETWEEN $MinWords AND $MaxWords
      |      AND sum_chars * 10 >= n_words * $MinMeanLenTenths
      |      AND sum_chars * 10 <= n_words * $MaxMeanLenTenths
      |      AND stop_ok = 1
      |      AND (n_words - n_distinct) * 10 <= n_words * $MaxDupFracTenths
      |      THEN 1 ELSE 0 END AS y
      |  FROM t),
      |blocks AS MATERIALIZED (
      |  SELECT x, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS s
      |  FROM xy GROUP BY x),
      |pts AS MATERIALIZED (
      |  SELECT x, n, s, row_number() OVER (ORDER BY x) AS i,
      |    sum(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cn,
      |    sum(s) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cs
      |  FROM blocks),
      |csd AS MATERIALIZED (
      |  SELECT i, CAST(cn AS BIGINT) AS cn, CAST(cs AS BIGINT) AS cs FROM pts
      |  UNION ALL SELECT 0, 0, 0),
      |pairs AS MATERIALIZED (
      |  SELECT a.i AS i, b.i AS k,
      |    CAST(b.cs - a.cs AS HUGEINT) * $SlopeScale::HUGEINT
      |      // CAST(b.cn - a.cn AS HUGEINT) AS key
      |  FROM csd a JOIN csd b ON a.i < b.i),
      |bm AS (SELECT k AS t, max(key) AS bmax FROM pairs GROUP BY 1),
      |am AS (SELECT i AS t, min(key) AS amin FROM pairs GROUP BY 1),
      |verts AS MATERIALIZED (
      |  SELECT c.i AS vi, c.cn AS vn, c.cs AS vs
      |  FROM csd c
      |  LEFT JOIN bm ON bm.t = c.i
      |  LEFT JOIN am ON am.t = c.i
      |  WHERE coalesce(bmax <= amin, true)),
      |segs AS MATERIALIZED (
      |  SELECT vi, vn, vs,
      |    lead(vi) OVER (ORDER BY vi) AS vi2,
      |    lead(vn) OVER (ORDER BY vi) AS vn2,
      |    lead(vs) OVER (ORDER BY vi) AS vs2
      |  FROM verts)
      |SELECT p.x AS x_bin, p.n AS n_docs, p.s AS n_pos,
      |  CAST(CAST(g.vs2 - g.vs AS HUGEINT) * 1048576 // (g.vn2 - g.vn)
      |    AS BIGINT) AS yhat_fp
      |FROM pts p JOIN segs g ON p.i > g.vi AND p.i <= g.vi2
      |ORDER BY x_bin""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q111_blocklist_filter", q111, Some(q111Sql)),
    Q("q113_gopher_rules", q113, Some(q113Sql)),
    Q("q120_drop_reasons", q120, Some(q120Sql)),
    Q("q172_score_calibration", q172, Some(q172Sql)),
    Q("q176_drift_monitor", q176, Some(q176Sql)),
    Q("q215_conformal_gate", q215, Some(q215Sql)),
    Q("q228_gate_stack", q228, Some(q228Sql)),
    Q("q260_isotonic_calibration", q260, Some(q260Sql)),
  )
}
