package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** DoReMi-style domain mixture-weight learning (Xie et al. 2023,
  * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
  * Pretraining"): learn per-domain sampling weights by running
  * multiplicative-weights updates (Arora-Hazan-Kale 2012, the Hedge
  * family DoReMi instantiates) over per-domain EXCESS LOSS observed on
  * a sequence of minibatch steps, then report the per-step-averaged
  * weights — the number DoReMi actually ships to the production run.
  *
  * The proxy/reference loss pair is the q122 fluency gate re-used as
  * published CCNet machinery: per-doc excess loss = how far the doc's
  * hashed-bigram conditional-probability score falls BELOW the
  * reference keep threshold (`greatest(0, KeepMinFpMean - fp_mean)`,
  * fixed point) — domains whose documents under-perform the reference
  * model accumulate loss and get UP-weighted, exactly DoReMi's
  * "upweight the domains the proxy finds hard" direction. Steps are a
  * deterministic hash partition of the corpus (`doc_id % Steps`), so
  * the whole schedule is reproducible and oracle-checkable.
  *
  * Update rule, exact in integer fixed point (everything non-negative,
  * so Spark's truncating `div` and DuckDB's flooring `//` agree):
  *
  *   f_t,d   = S + Eta * L_t,d              (MWU factor, scale S)
  *   c_t,d   = c_{t-1},d * f_t,d div S      (unnormalized weight)
  *   alpha_t,d = c_t,d * S div sum_d'(c_t,d')   (normalized, scale S)
  *   avg_alpha = (sum_t alpha_t,d) div Steps    (the DoReMi output)
  *
  * Distinct from q115/q131 (DSIR: a RATIO of unconditional feature
  * distributions, no dynamics) and q98/q100 (budget mixing under FIXED
  * per-source shares): this LEARNS the shares from a loss signal.
  *
  * Scale shape: one corpus pass for the fluency scores (the q122
  * plan: two bounded-by-schema broadcast model tables), one thin
  * doc_id-keyed join to attach `source`, then ONE map-side-combinable
  * hash aggregate collapses the corpus to a ≤|domains|-row frame —
  * every MWU round after that is pure column arithmetic on that frame
  * (no per-round corpus scans, no driver loop, no joins except the
  * 1-row norm broadcast). At 100 TB the cost is the two corpus scans;
  * the learning itself is free.
  */
object Mixture {

  /** MWU steps (deterministic minibatches = doc_id mod Steps). */
  val Steps = 8

  /** MWU learning rate: factor = S + Eta * loss_fp. With deficits
    * bounded by the keep threshold (~18k fp) this keeps each factor
    * under ~1.28*S, so 8 chained rounds stay far inside Long range.
    */
  val Eta = 16L

  private val S = Fluency.FpScale

  private def q278(s: SparkSession, d: String): DataFrame =
    mixtureOf(documents(s, d))

  /** The q278 plan over any (doc_id, lang, source, text) frame —
    * public for fixture specs (planted fluent/gibberish domains).
    */
  def mixtureOf(docs: DataFrame): DataFrame = {
    val perDoc = Fluency.scoredOf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"),
        pmod(col("doc_id"), lit(Steps.toLong)).as("step"),
        greatest(lit(0L), lit(Fluency.KeepMinFpMean) - col("fp_mean"))
          .as("deficit"))
    // corpus -> |domains| rows in one combinable aggregate: per-step
    // mean deficits as columns (a step with no docs in a domain reads
    // as zero loss — the domain simply isn't updated that round)
    val lCols = (0 until Steps).map(t => expr(
      s"""coalesce(sum(CASE WHEN step = $t THEN deficit END), 0L)
         | div greatest(coalesce(sum(CASE WHEN step = $t THEN 1L END), 0L), 1L)"""
        .stripMargin.replace("\n", " ")).as(s"l$t"))
    val aggs = count(lit(1)).as("n_docs") +:
      expr("sum(deficit) div count(1)").as("mean_deficit_fp") +: lCols
    // bounded action: <= |domains| rows — pin it so the norm aggregate
    // below doesn't re-run the corpus scans
    val base = perDoc.groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint()
    val withC = (0 until Steps).foldLeft(base) { (df, t) =>
      val f = s"(${S}L + ${Eta}L * l$t)"
      df.withColumn(s"c$t",
        if (t == 0) expr(f) else expr(s"c${t - 1} * $f div ${S}L"))
    }
    val norms = withC.agg(
      sum(col("c0")).as("n0"),
      (1 until Steps).map(t => sum(col(s"c$t")).as(s"n$t")): _*)
    withC.crossJoin(broadcast(norms))
      .select(
        col("source") +: col("n_docs") +: col("mean_deficit_fp") +:
          (0 until Steps).map(t => expr(s"c$t * ${S}L div n$t").as(s"a$t")): _*)
      .select(col("source"), col("n_docs"), col("mean_deficit_fp"),
        col(s"a${Steps - 1}").as("final_alpha_fp"),
        expr((0 until Steps).map(t => s"a$t")
          .mkString("(", " + ", s") div ${Steps}L")).as("avg_alpha_fp"))
      .orderBy(col("source"))
  }

  /** Seed for the resample hash — content-independent, so a document's
    * keep verdict never changes when unrelated documents arrive.
    */
  val ResampleSeed = "mx1"

  private def q280(s: SparkSession, d: String): DataFrame =
    resampleOf(documents(s, d))

  /** Per-domain keep probability (scale S) from a learned weight frame
    * (source, n_docs, avg_alpha_fp): target-share over current-share,
    * normalized so the most UP-weighted domain keeps everything and the
    * rest downsample proportionally — DoReMi stage 2 as deterministic
    * Bernoulli-by-hash thinning (no domain is oversampled; repetition
    * policy is q105's job).
    *
    * The ratio is alpha * N_total div n_d — N/n_d is O(#domains)
    * regardless of corpus size, so fixed-point precision survives a
    * 10^12-doc corpus (alpha * S div n_d would truncate to zero).
    * BOTH multiplies stage through DECIMAL(38,0): alpha * N_total can
    * pass 2^63 past ~10^13 docs, and under domain skew (one rare hard
    * domain) the ratio itself can reach ~alpha * N/n_d ~ 10^13, so the
    * un-staged ratio * S would wrap negative exactly for the max-ratio
    * domain — the one the normalization promises to keep whole.
    */
  def keepProbsOf(weights: DataFrame): DataFrame = {
    val tot = weights.agg(sum(col("n_docs")).as("nt"))
    val r = weights.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        expr("CAST(avg_alpha_fp AS DECIMAL(38,0)) * nt div n_docs").as("ratio"))
    val m = r.agg(max(col("ratio")).as("rmax"))
    r.crossJoin(broadcast(m))
      .select(col("source"),
        expr(s"CAST(ratio AS DECIMAL(38,0)) * ${S}L div rmax").as("p_keep_fp"))
  }

  /** The keep verdict column: portable 60-bit hash of the seeded
    * doc_id against the domain's keep probability. hash % S is in
    * [0, S), so p_keep_fp = S keeps every document — the max-ratio
    * domain survives intact by construction.
    */
  private[queries] def keptCol: Column =
    (pmod(graft.functions.TextFns.hash60(
      concat(lit(ResampleSeed), col("doc_id").cast("string"))), lit(S))
      < col("p_keep_fp")).cast("long")

  /** q280 — apply the q278 mixture: learn the weights, thin each domain
    * to its learned share, report the realized mix. One extra corpus
    * pass over q278 (thin projection + D-row broadcast join + one
    * combinable aggregate); no text shuffles.
    *
    * A domain ABSENT from the weight frame (every document under 2
    * tokens at learning time, or newly arrived) defaults to p = S:
    * kept whole and VISIBLE in the report, never silently dropped —
    * the join is left, not inner.
    */
  def resampleOf(docs: DataFrame): DataFrame = {
    // D rows; pin so the per-doc scan below doesn't re-run the whole
    // mixture plan once per consumer
    val p = keepProbsOf(mixtureOf(docs)).localCheckpoint()
    val agg = docs.select(col("source"), col("doc_id"), col("n_chars"))
      .join(broadcast(p), Seq("source"), "left")
      .withColumn("p_keep_fp", coalesce(col("p_keep_fp"), lit(S)))
      .withColumn("kept", keptCol)
      .groupBy(col("source"))
      .agg(max(col("p_keep_fp")).as("p_keep_fp"),
        count(lit(1)).as("n_docs_in"),
        sum(col("kept")).as("n_kept"),
        sum(col("kept") * col("n_chars")).as("kept_chars"))
      // D rows; pin so the kept-total below reuses the aggregate
      // instead of re-running the corpus scan
      .localCheckpoint()
    val tot = agg.agg(sum(col("n_kept")).as("tk"))
    agg.crossJoin(broadcast(tot))
      .select(col("source"), col("p_keep_fp"), col("n_docs_in"),
        col("n_kept"), col("kept_chars"),
        // staged through DECIMAL(38,0) like keepProbsOf: n_kept * S
        // wraps Long once a domain passes ~8.8e12 kept docs — the
        // 10^13-doc scale the ratio math already defends
        expr(s"CAST(CAST(n_kept AS DECIMAL(38,0)) * ${S}L" +
          " div greatest(tk, 1L) AS BIGINT)").as("kept_share_fp"))
      .orderBy(col("source"))
  }

  /** Streaming form of the resample — the production shape: weights
    * learned offline on a static corpus, arrivals thinned online. The
    * keep-probability frame broadcasts as a D-row static side of a
    * stream-static join; the verdict is one hash per arrival — no
    * state, no shuffle, append mode. Emits (doc_id, source, p_keep_fp,
    * kept) so a sink can route or drop. Arrivals from a domain the
    * weight frame has never seen default to p = S (kept, emitted) —
    * an inner join would make them vanish with neither verdict.
    */
  def resampleStream(stream: DataFrame, keepProbs: DataFrame): DataFrame =
    stream.join(broadcast(keepProbs), Seq("source"), "left")
      .withColumn("p_keep_fp", coalesce(col("p_keep_fp"), lit(S)))
      .withColumn("kept", keptCol)
      .select(col("doc_id"), col("source"), col("p_keep_fp"), col("kept"))

  /** The per-doc keep verdict, DuckDB dialect (NULL p = default keep). */
  private[queries] lazy val keptSql =
    s"""CASE WHEN ${graft.functions.TextFns.hash60Sql(
      s"'$ResampleSeed' || CAST(doc_id AS VARCHAR)")} % $S
       | < coalesce(p_keep_fp, $S)
       | THEN 1 ELSE 0 END""".stripMargin.replace("\n", " ")

  /** DuckDB CTE list producing `pk(source, p_keep_fp)` — the whole
    * q278 + keep-probability derivation, shared with q280 and the
    * q282 capstone.
    */
  private[queries] lazy val keepProbCtesSql =
    s"""$mixCtesSql,
      |tot AS (SELECT sum(n_docs) AS nt FROM mix),
      |ratios AS MATERIALIZED (
      |  SELECT source, CAST(avg_alpha_fp AS HUGEINT) * nt // n_docs AS ratio
      |  FROM mix CROSS JOIN tot),
      |pk AS (
      |  SELECT source, ratio * $S // (SELECT max(ratio) FROM ratios)
      |    AS p_keep_fp
      |  FROM ratios)""".stripMargin

  private lazy val q280Sql = {
    s"""WITH $keepProbCtesSql,
      |tagged AS (
      |  SELECT d.source, coalesce(p_keep_fp, $S) AS p_keep_fp, d.n_chars,
      |    $keptSql AS kept
      |  FROM documents d LEFT JOIN pk USING (source)),
      |agg AS (
      |  SELECT source, max(p_keep_fp) AS p_keep_fp, count(*) AS n_docs_in,
      |    sum(kept) AS n_kept, sum(kept * n_chars) AS kept_chars
      |  FROM tagged GROUP BY source),
      |tk AS (SELECT sum(n_kept) AS tk FROM agg)
      |SELECT source, CAST(p_keep_fp AS BIGINT) AS p_keep_fp,
      |  CAST(n_docs_in AS BIGINT) AS n_docs_in,
      |  CAST(n_kept AS BIGINT) AS n_kept,
      |  CAST(kept_chars AS BIGINT) AS kept_chars,
      |  CAST(CAST(n_kept AS HUGEINT) * $S // greatest(tk, 1) AS BIGINT)
      |    AS kept_share_fp
      |FROM agg CROSS JOIN tk
      |ORDER BY source""".stripMargin
  }

  /** DuckDB CTE list producing `mix(source, n_docs, mean_deficit_fp,
    * final_alpha_fp, avg_alpha_fp)` — the whole q278 computation,
    * shared with the q280 resample oracle.
    */
  private[queries] val mixCtesSql = {
    val lCols = (0 until Steps).map(t =>
      s"""coalesce(sum(CASE WHEN step = $t THEN deficit END), 0)
         | // greatest(coalesce(sum(CASE WHEN step = $t THEN 1 END), 0), 1) AS l$t"""
        .stripMargin.replace("\n", " ")).mkString(",\n    ")
    val cumCtes = (0 until Steps).map { t =>
      val f = s"($S + $Eta * l$t)"
      // the last cum CTE is read by BOTH norms and alphas — without
      // MATERIALIZED DuckDB re-evaluates the whole corpus-scan chain
      // per reference (the q279 timeout class; see BASELINE.md)
      val mat = if (t == Steps - 1) " MATERIALIZED" else ""
      if (t == 0) s"cum0 AS (SELECT *, $f AS c0 FROM base)"
      else s"cum$t AS$mat (SELECT *, c${t - 1} * $f // $S AS c$t FROM cum${t - 1})"
    }.mkString(",\n")
    val nCols = (0 until Steps).map(t => s"sum(c$t) AS n$t").mkString(", ")
    val aCols = (0 until Steps).map(t => s"c$t * $S // n$t AS a$t")
      .mkString(",\n    ")
    s"""${Fluency.scoreCteSql},
      |pd AS (
      |  SELECT d.source, s.doc_id % $Steps AS step,
      |    greatest(0, ${Fluency.KeepMinFpMean} - fp_sum // n_bigrams) AS deficit
      |  FROM sc s JOIN documents d USING (doc_id)),
      |base AS (
      |  SELECT source, count(*) AS n_docs,
      |    sum(deficit) // count(*) AS mean_deficit_fp,
      |    $lCols
      |  FROM pd GROUP BY source),
      |$cumCtes,
      |norms AS (SELECT $nCols FROM cum${Steps - 1}),
      |alphas AS (
      |  SELECT source, n_docs, mean_deficit_fp,
      |    $aCols
      |  FROM cum${Steps - 1} CROSS JOIN norms),
      |mix AS MATERIALIZED (
      |  SELECT source, n_docs, mean_deficit_fp,
      |    a${Steps - 1} AS final_alpha_fp,
      |    (${(0 until Steps).map(t => s"a$t").mkString(" + ")}) // $Steps
      |      AS avg_alpha_fp
      |  FROM alphas)""".stripMargin
  }

  private val q278Sql =
    s"""WITH $mixCtesSql
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(mean_deficit_fp AS BIGINT) AS mean_deficit_fp,
      |  CAST(final_alpha_fp AS BIGINT) AS final_alpha_fp,
      |  CAST(avg_alpha_fp AS BIGINT) AS avg_alpha_fp
      |FROM mix
      |ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q278_domain_mixture", q278, Some(q278Sql)),
    Q("q280_mixture_resample", q280, Some(q280Sql)),
  )
}
