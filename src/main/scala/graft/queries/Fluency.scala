package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** CCNet-style language-model fluency gate: score every document by a
  * hashed-bigram conditional-probability model TRAINED ON A REFERENCE
  * SLICE of the corpus (CCNet trains KenLM on Wikipedia and buckets
  * Common Crawl by perplexity; here the reference slice is the `en`
  * partition and the model is a hashed bigram table so the whole
  * pipeline stays in exact integer arithmetic — no float log-prob sits
  * on a comparison boundary in either engine).
  *
  * Distinct from q115 (DSIR): DSIR weights documents by a RATIO of two
  * unconditional feature distributions (target vs raw); this is a
  * CONDITIONAL model — each bigram is scored by P(w2 | w1) estimated
  * as bucketed-bigram-count over bucketed-context-count with add-one
  * smoothing, the actual LM-fluency proxy of the CCNet gate.
  *
  * Scale shape: the model is two aggregates BOUNDED BY SCHEMA (≤
  * `Buckets` rows each — the hashing trick caps them regardless of
  * corpus size), so both legitimately broadcast into the scoring join;
  * the corpus makes exactly two passes (one to train, one to score)
  * and the only data-sized shuffle is the per-doc score aggregation,
  * which combines map-side.
  */
object Fluency {

  /** Feature-hash bucket count for both the bigram and the context
    * table (the model is ≤ 2·Buckets longs — fits any executor).
    */
  val Buckets = 1024

  /** Fixed-point scale for the smoothed conditional probability. */
  val FpScale = 1048576L // 2^20

  /** Keep threshold on the per-doc mean fixed-point conditional
    * probability, sized so the gate fires both ways at every driver SF
    * (fp_mean spans ~12.7k-28.2k across sf0.001-0.1).
    */
  val KeepMinFpMean = 18000L

  private def indices(n: Column): Column =
    when(n > 0, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))

  /** (doc_id, lang, b1, b2) hashed bigram rows: b1 buckets the context
    * token, b2 the (w1, w2) pair. Token array materialized behind the
    * doc_id exchange before the Generate (the q73 lesson).
    */
  private def bigramsOf(docs: DataFrame): DataFrame =
    docs
      // per-token context buckets (th) hash ONCE per token, BEFORE the
      // doc_id exchange materializes them — post-explode they are array
      // lookups, not per-bigram md5 evaluations (the q73 lesson applied
      // to expressions, not just the tokenizer)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .withColumn("th", transform(col("toks"), t => pmod(hash60(t), lit(Buckets))))
      .repartition(col("doc_id"))
      .select(col("doc_id"), col("lang"), col("toks"), col("th"),
        explode(indices(size(col("toks")) - 1)).as("i"))
      .select(col("doc_id"), col("lang"),
        element_at(col("th"), (col("i") + 1).cast("int")).as("b1"),
        pmod(hash60(concat_ws(" ",
          element_at(col("toks"), (col("i") + 1).cast("int")),
          element_at(col("toks"), (col("i") + 2).cast("int")))),
          lit(Buckets)).as("b2"))

  // q122 — hashed-bigram LM fluency score + keep gate. fp per bigram =
  // (C2[b2]+1) * 2^20 div (C1[b1]+Buckets); doc score = truncated mean
  // over its bigrams. Integer end to end, so Spark's truncating `div`
  // and DuckDB's flooring `//` agree (everything non-negative).
  private def q122(s: SparkSession, d: String): DataFrame =
    fluencyOf(documents(s, d))

  /** The q122 score over any (doc_id, lang, text) frame — public for
    * fixture specs.
    */
  def fluencyOf(docs: DataFrame): DataFrame =
    scoredOf(docs)
      .withColumn("keep",
        when(col("fp_mean") >= KeepMinFpMean, 1L).otherwise(0L))
      .orderBy(col("doc_id"))

  /** Unordered per-doc fluency scores (doc_id, n_bigrams, fp_mean) —
    * the q122 core without the gate column or the presentation sort,
    * for downstream consumers (q278 domain mixture) that aggregate the
    * scores rather than emit them.
    */
  def scoredOf(docs: DataFrame): DataFrame = {
    val bi = bigramsOf(docs)
    val ref = bi.filter(col("lang") === "en")
    val c2 = ref.groupBy(col("b2")).agg(count(lit(1)).as("c2"))
    val c1 = ref.groupBy(col("b1")).agg(count(lit(1)).as("c1"))
    bi.join(broadcast(c2), Seq("b2"), "left")
      .join(broadcast(c1), Seq("b1"), "left")
      .select(col("doc_id"),
        expr(s"((coalesce(c2, 0L) + 1L) * $FpScale) div (coalesce(c1, 0L) + $Buckets)")
          .as("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("fp")).as("fp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("fp_sum div n_bigrams").as("fp_mean"))
  }

  /** DuckDB CTE list producing `sc(doc_id, n_bigrams, fp_sum)` — the
    * per-doc fluency score core, shared by the q122 and q278 oracles.
    */
  private[queries] val scoreCteSql = {
    val h1 = hash60Sql("toks[i+1]")
    val h2 = hash60Sql("toks[i+1] || ' ' || toks[i+2]")
    s"""t AS (SELECT doc_id, lang,
      |        regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |      FROM documents),
      |bi AS (SELECT doc_id, lang, $h1 % $Buckets AS b1, $h2 % $Buckets AS b2
      |       FROM (SELECT doc_id, lang, toks, unnest(range(len(toks) - 1)) AS i
      |             FROM t)),
      |c2 AS (SELECT b2, count(*) AS c FROM bi WHERE lang = 'en' GROUP BY b2),
      |c1 AS (SELECT b1, count(*) AS c FROM bi WHERE lang = 'en' GROUP BY b1),
      |sc AS (SELECT doc_id, count(*) AS n_bigrams,
      |         SUM((coalesce(c2.c, 0) + 1) * $FpScale
      |             // (coalesce(c1.c, 0) + $Buckets)) AS fp_sum
      |       FROM bi LEFT JOIN c2 USING (b2) LEFT JOIN c1 USING (b1)
      |       GROUP BY doc_id)""".stripMargin
  }

  private val q122Sql = {
    s"""WITH $scoreCteSql
      |SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
      |  CAST(fp_sum // n_bigrams AS BIGINT) AS fp_mean,
      |  CAST(CASE WHEN fp_sum // n_bigrams >= $KeepMinFpMean
      |    THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM sc
      |ORDER BY doc_id""".stripMargin
  }

  /** The trained model as ONE row of two bounded maps (bucket →
    * count): ≤ Buckets entries each, the q73 benchmark-array /
    * q115 model-map broadcast pattern.
    */
  private def modelOf(staticCorpus: DataFrame): DataFrame = {
    val ref = bigramsOf(staticCorpus).filter(col("lang") === "en")
    val m2 = ref.groupBy(col("b2")).agg(count(lit(1)).as("c"))
      .agg(map_from_arrays(collect_list(col("b2")), collect_list(col("c"))).as("m2"))
    val m1 = ref.groupBy(col("b1")).agg(count(lit(1)).as("c"))
      .agg(map_from_arrays(collect_list(col("b1")), collect_list(col("c"))).as("m1"))
    m2.crossJoin(m1)
  }

  /** Streaming form of q122 — the CCNet deployment shape: fit the
    * bigram model ONCE on a static reference corpus, then stream
    * candidates through the gate. The model broadcasts as a 1-row pair
    * of maps and the per-doc score folds over the bucket array inside
    * codegen — no explode, no streaming aggregation, no state; runs in
    * append mode at stateless-filter cost. Documents with fewer than 2
    * tokens have no bigrams and are dropped, matching batch q122
    * (which never emits a row for them).
    */
  def fluencyStream(stream: DataFrame, staticCorpus: DataFrame): DataFrame = {
    def h60(e: String) = s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"
    val bs = expr(
      s"""transform(sequence(0, size(toks) - 2),
         |  i -> struct(
         |    pmod(${h60("toks[i]")}, ${Buckets}L) AS b1,
         |    pmod(${h60("concat(toks[i], ' ', toks[i+1])")}, ${Buckets}L) AS b2))
         |""".stripMargin)
    stream
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .withColumn("bs", bs)
      .crossJoin(broadcast(modelOf(staticCorpus)))
      .select(col("doc_id"), size(col("bs")).cast("long").as("n_bigrams"),
        expr(s"""aggregate(bs, 0L, (acc, x) ->
          |  acc + ((coalesce(m2[x.b2], 0L) + 1L) * ${FpScale}L)
          |    div (coalesce(m1[x.b1], 0L) + ${Buckets}L))""".stripMargin)
          .as("fp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("fp_sum div n_bigrams").as("fp_mean"))
      .withColumn("keep",
        when(col("fp_mean") >= KeepMinFpMean, 1L).otherwise(0L))
  }

  val all: Seq[Q] = Seq(
    Q("q122_lm_fluency", q122, Some(q122Sql)),
  )
}
