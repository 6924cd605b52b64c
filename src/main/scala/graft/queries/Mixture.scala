package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private val q278Sql = {
    val lCols = (0 until Steps).map(t =>
      s"""coalesce(sum(CASE WHEN step = $t THEN deficit END), 0)
         | // greatest(coalesce(sum(CASE WHEN step = $t THEN 1 END), 0), 1) AS l$t"""
        .stripMargin.replace("\n", " ")).mkString(",\n    ")
    val cumCtes = (0 until Steps).map { t =>
      val f = s"($S + $Eta * l$t)"
      if (t == 0) s"cum0 AS (SELECT *, $f AS c0 FROM base)"
      else s"cum$t AS (SELECT *, c${t - 1} * $f // $S AS c$t FROM cum${t - 1})"
    }.mkString(",\n")
    val nCols = (0 until Steps).map(t => s"sum(c$t) AS n$t").mkString(", ")
    val aCols = (0 until Steps).map(t => s"c$t * $S // n$t AS a$t")
      .mkString(",\n    ")
    s"""WITH ${Fluency.scoreCteSql},
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
      |  FROM cum${Steps - 1} CROSS JOIN norms)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(mean_deficit_fp AS BIGINT) AS mean_deficit_fp,
      |  CAST(a${Steps - 1} AS BIGINT) AS final_alpha_fp,
      |  CAST((${(0 until Steps).map(t => s"a$t").mkString(" + ")}) // $Steps
      |    AS BIGINT) AS avg_alpha_fp
      |FROM alphas
      |ORDER BY source""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q278_domain_mixture", q278, Some(q278Sql)),
  )
}
