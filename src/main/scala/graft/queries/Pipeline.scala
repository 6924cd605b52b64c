package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** q55 — the capstone: a complete training-data selection pipeline as
  * ONE declarative plan, verified end-to-end against the oracle:
  *
  *   1. quality gate  — type-token ratio and length window (q52 logic);
  *   2. dedup gate    — MinHash-LSH candidate pairs → connected
  *                      components → keep only each cluster's min-id
  *                      representative (q32/q35 logic);
  *   3. deterministic sample — portable hash Bernoulli 80% (q43 logic);
  *
  * emitting the selected corpus with its features. Every stage is the
  * scalable form (hash-grouped dedup, banded LSH, no cross joins), so
  * the same plan is the 100 TB pipeline.
  */
object Pipeline {

  private def q55(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val scored = documents(s, d)
      .withColumn("toks", toks)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("toks"))).cast("double") / greatest(col("n_toks"), lit(1L)))
      .withColumn("keep_quality",
        col("ttr") > 0.5 && col("n_toks") >= 20 && col("n_toks") <= 1000)
      .withColumn("keep_sample", pmod(hash60(col("text")), lit(100L)) < 80)
    // dup drop-list: non-representative members of LSH clusters
    val dupDrop = graft.ops.ConnectedComponents
      .minLabel(Dedup.candidatePairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("drop_id"))
    scored
      .join(dupDrop, scored("doc_id") === dupDrop("drop_id"), "left_anti")
      .filter(col("keep_quality") && col("keep_sample"))
      .select(col("doc_id"), col("lang"), col("n_toks"),
        col("ttr"))
      .orderBy(col("doc_id"))
  }

  private val q55Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH RECURSIVE ${Dedup.pairsCteSql},
      |undirected(a, b) AS (
      |  SELECT doc_a, doc_b FROM pairs UNION SELECT doc_b, doc_a FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |drops AS (
      |  SELECT a AS drop_id FROM (
      |    SELECT a, min(least(a, b)) AS comp FROM reach GROUP BY a) t
      |  WHERE a <> comp),
      |scored AS (
      |  SELECT doc_id, lang, text, len($toks) AS n_toks,
      |    CAST(len(list_distinct($toks)) AS DOUBLE)
      |      / greatest(len($toks), 1) AS ttr
      |  FROM documents)
      |SELECT doc_id, lang, n_toks, ttr
      |FROM scored
      |WHERE ttr > 0.5 AND n_toks BETWEEN 20 AND 1000
      |  AND ${hash60Sql("text")} % 100 < 80
      |  AND doc_id NOT IN (SELECT drop_id FROM drops)
      |ORDER BY doc_id""".stripMargin
  }

  /** q90 — the round-8 capstone: the NEW curation operators composed
    * into one oracle-verified pipeline:
    *
    *   1. winnow-dup pruning — shared-substring pairs (q86) → connected
    *      components → drop every non-representative cluster member;
    *   2. contamination gate — drop documents containing the benchmark
    *      phrase, found by the positional phrase search (q85);
    *   3. split assignment — seeded-hash 80/10/10 buckets (q89) over
    *      the survivors, reported per (lang, split).
    *
    * Every stage keeps its standalone scale shape (fingerprint-only
    * shuffles, pointer-jumping CC, postings-pruned phrase scan, tiny
    * final aggregate); the drop lists join in as left-antis on doc_id.
    */
  private def q90(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val dupDrop = graft.ops.ConnectedComponents
      .minLabel(Dedup.substringNearDupPairs(docs)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("doc_id"))
    val contaminated = Retrieval.phraseSearch(docs, Seq("hash", "join"))
      .select(col("doc_id"))
    val bucket = pmod(
      hash60(concat(lit(Sampling.SplitSeed), col("doc_id").cast("string"))), lit(100L))
    docs
      .join(dupDrop, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("lang"),
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").as("split"),
        tokenCount(col("text")).as("n_toks"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("lang"), col("split"))
  }

  private val q90Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val hits =
      s"len(list_filter(range(len(toks) - 1), i -> toks[i+1] = 'hash' AND toks[i+2] = 'join'))"
    s"""WITH RECURSIVE ${Dedup.winnowPairsCteSql},
      |wedges AS (
      |  SELECT doc_a, doc_b FROM wpairs WHERE n_shared >= ${Dedup.SubstrMinShared}),
      |wund(a, b) AS (
      |  SELECT doc_a, doc_b FROM wedges UNION SELECT doc_b, doc_a FROM wedges),
      |wreach(a, b) AS (
      |  SELECT a, b FROM wund
      |  UNION
      |  SELECT r.a, u.b FROM wreach r JOIN wund u ON r.b = u.a),
      |wdrops AS (
      |  SELECT a AS drop_id FROM (
      |    SELECT a, min(least(a, b)) AS comp FROM wreach GROUP BY a) t
      |  WHERE a <> comp),
      |contaminated AS (
      |  SELECT doc_id FROM (SELECT doc_id, $toks AS toks FROM documents) t
      |  WHERE $hits > 0)
      |SELECT lang,
      |  CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val'
      |    ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens
      |FROM (
      |  SELECT doc_id, lang,
      |    ${hash60Sql(s"'${Sampling.SplitSeed}' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket,
      |    len($toks) AS n_toks
      |  FROM documents) d
      |WHERE doc_id NOT IN (SELECT drop_id FROM wdrops)
      |  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
      |GROUP BY 1, 2
      |ORDER BY lang, split""".stripMargin
  }

  /** q100 — the round-9 capstone: the data-MIXING pipeline composed
    * from the round's new operators, as one oracle-verified plan:
    *
    *   1. keep-best dedup — LSH candidate pairs → connected components
    *      → drop every cluster member except the QUALITY-argmax
    *      representative (q93's keep decision, vs q55's min-id rep);
    *   2. token-budget mix — the per-source quality-greedy budget cut
    *      (q98's distributed-prefix form) over the dedup SURVIVORS,
    *      emitting the final training mix with cumulative token
    *      positions.
    *
    * Recomputing the budget over survivors is what makes this a
    * composition rather than a union: dropping a duplicate frees
    * budget for the next-best document of the same source.
    */
  private def q100(s: SparkSession, d: String): DataFrame = {
    val scored = Sampling.scoredDocs(s, d)
    val comp = graft.ops.ConnectedComponents
      .minLabel(Dedup.candidatePairs(s, d)
        .select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val kept = comp.join(scored.select(col("doc_id"), col("quality")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(max_by(col("doc_id"),
        struct(col("quality"), (-col("doc_id")).as("nid"))).as("kept"))
    val losers = comp.join(kept, "cluster_id")
      .filter(col("doc_id") =!= col("kept"))
      .select(col("doc_id"))
    Sampling.tokenBudgetOver(
      scored.join(losers, Seq("doc_id"), "left_anti"), Sampling.TokenBudget)
  }

  private val q100Sql =
    s"""WITH RECURSIVE ${Dedup.pairsCteSql},
      |undirected(a, b) AS (
      |  SELECT doc_a, doc_b FROM pairs UNION SELECT doc_b, doc_a FROM pairs
      |  UNION SELECT doc_a, doc_a FROM pairs UNION SELECT doc_b, doc_b FROM pairs),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
      |qual AS (SELECT doc_id, source, len(toks) AS n_toks,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) *
      |      (CASE WHEN len(toks) >= 20 AND len(toks) <= 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM (SELECT doc_id, source,
      |      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |    FROM documents) t),
      |m AS (SELECT c.doc_id,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |      ORDER BY q.quality DESC, c.doc_id) AS rn
      |  FROM comp c JOIN qual q USING (doc_id)),
      |surv AS (SELECT * FROM qual
      |  WHERE doc_id NOT IN (SELECT doc_id FROM m WHERE rn > 1)),
      |w AS (SELECT doc_id, source, n_toks,
      |    sum(n_toks) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS cum_toks
      |  FROM surv)
      |SELECT source, doc_id, CAST(n_toks AS BIGINT) AS n_toks,
      |  CAST(cum_toks AS BIGINT) AS cum_toks
      |FROM w
      |WHERE cum_toks - n_toks < ${Sampling.TokenBudget}
      |ORDER BY source, doc_id""".stripMargin

  /** q110 — the loader-order capstone: q105's repetition schedule
    * composed with q107's stride interleaver into the ONE sequence a
    * training loader actually streams. Every materialized copy
    * (doc_id, rep_idx) from the repetition schedule gets its own
    * per-source hash-shuffled rank (so a doc's repeats scatter across
    * the source's stream instead of clustering), virtual time
    * k/n_copies, and a global position — sources finish together at
    * vt = 1 even though small sources run at >1 epoch. Same
    * bit-reproducibility contract as its parts: integer hash draws,
    * one IEEE division, rankDistributed global positions.
    */
  private def q110(s: SparkSession, d: String): DataFrame = {
    val copies = Sampling.repetitionCopies(s, d)
      .withColumn("draw", hash60(concat(lit("lo"), col("doc_id").cast("string"),
        lit("_"), col("rep_idx").cast("string"))))
    val n = copies.groupBy(col("source")).agg(count(lit(1)).as("n_copies"))
    val ranked = Sampling.rankDistributed(copies, Seq("source"),
        Seq(col("draw"), col("doc_id"), col("rep_idx")))
      .withColumnRenamed("rk", "k")
      .join(broadcast(n), Seq("source"))
      .withColumn("vt", col("k").cast("double") / col("n_copies"))
    Sampling.rankDistributed(ranked, Seq.empty,
        Seq(col("vt"), col("source"), col("doc_id"), col("rep_idx")))
      .select(col("rk").as("pos"), col("source"), col("doc_id"), col("rep_idx"),
        col("k"), col("vt"))
      .orderBy(col("pos"))
  }

  private val q110Sql =
    s"""WITH ${Sampling.repetitionCteSql},
      |drawn AS (SELECT source, doc_id, rep_idx,
      |    ${hash60Sql("'lo' || CAST(doc_id AS VARCHAR) || '_' || CAST(rep_idx AS VARCHAR)")} AS draw
      |  FROM rep),
      |n AS (SELECT source, count(*) AS n_copies FROM rep GROUP BY source),
      |r AS (SELECT source, doc_id, rep_idx,
      |    row_number() OVER (PARTITION BY source ORDER BY draw, doc_id, rep_idx) AS k,
      |    n_copies
      |  FROM drawn JOIN n USING (source)),
      |v AS (SELECT source, doc_id, rep_idx, k,
      |    CAST(k AS DOUBLE)/n_copies AS vt FROM r)
      |SELECT row_number() OVER (ORDER BY vt, source, doc_id, rep_idx) AS pos,
      |  source, doc_id, CAST(rep_idx AS BIGINT) AS rep_idx,
      |  CAST(k AS BIGINT) AS k, vt
      |FROM v ORDER BY pos""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q55_training_pipeline", q55, Some(q55Sql)),
    Q("q90_curation_pipeline", q90, Some(q90Sql)),
    Q("q100_mixing_pipeline", q100, Some(q100Sql)),
    Q("q110_loader_order", q110, Some(q110Sql)),
  )
}
