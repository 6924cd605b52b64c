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

  val all: Seq[Q] = Seq(Q("q55_training_pipeline", q55, Some(q55Sql)))
}
