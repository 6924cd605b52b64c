package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Corpus-structure operators over the `documents` table: boilerplate
  * n-gram mining (the template-detection stage of a web-corpus
  * pipeline) and fixed-size token chunking with overlap (the
  * context-window packing stage in front of tokenization). The
  * reference (affo/ssp) has no corpus operators — its data model stops
  * at per-record callbacks; these are the beyond-reference
  * LLM-pipeline components (SURVEY §2.4).
  *
  * Scale shape: everything is one corpus scan; the only data-sized
  * shuffles are (a) the doc_id repartition that materializes the token
  * arrays behind an exchange (the q73 lesson — a Generate whose child
  * inlines the tokenizer regex re-evaluates it per OUTPUT row) and
  * (b) q81's (gram, doc_id) partial-distinct aggregation, which
  * combines map-side so the exchange carries per-partition distinct
  * pairs, not per-token rows.
  */
object Corpus {

  /** Word n-gram order for boilerplate mining. */
  val GramLen = 3

  /** A gram in at least this many distinct documents is "boilerplate" —
    * shared template text, not content. (On real web corpora this is a
    * per-domain threshold; the synthetic corpus has no domains.)
    */
  val BoilerplateMinDf = 5

  /** Chunk size / stride in tokens; stride < size ⇒ overlapping chunks
    * (the standard packing for long-document training samples).
    */
  val ChunkSize = 32
  val ChunkStride = 24

  /** 0..n-1 index array, empty when n <= 0 (Spark's sequence() counts
    * DOWN for a negative upper bound, so guard explicitly).
    */
  private def indices(n: Column): Column =
    when(n > 0, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))

  /** (doc_id, toks) with the token array MATERIALIZED behind an
    * exchange, so the downstream Generates consume an attribute: a
    * Generate whose child projection still holds `tokens(text)` gets
    * the regex collapsed into its per-output-row evaluation (measured
    * 17 s vs 1 s at sf0.1 on q73).
    */
  private def toksDfOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))

  private def toksDf(s: SparkSession, d: String): DataFrame =
    toksDfOf(documents(s, d))

  /** One row per (doc_id, gram-string) occurrence. The explode carries
    * only the cheap index array; the gram concat runs once per output
    * row against the materialized token attribute. All narrow
    * deterministic ops after the repartition, so the same plan runs
    * over a streaming frame (used by the streaming CMS).
    */
  private[graft] def docGramsOf(docsDf: DataFrame): DataFrame =
    toksDfOf(docsDf)
      .select(col("doc_id"), col("toks"),
        explode(indices(size(col("toks")) - (GramLen - 1))).as("i"))
      .select(col("doc_id"),
        concat_ws(" ",
          (0 until GramLen).map(j => element_at(col("toks"), col("i") + j + 1)): _*).as("gram"))

  private[queries] def docGrams(s: SparkSession, d: String): DataFrame =
    docGramsOf(documents(s, d))

  // q81 — boilerplate n-gram mining: token 3-grams by document
  // frequency, kept when they appear in >= BoilerplateMinDf distinct
  // documents. count(DISTINCT doc_id) plans as a two-phase aggregate
  // whose first phase dedups (gram, doc_id) map-side, so the shuffle
  // carries per-partition distinct pairs — the only layout that
  // survives 100 TB of text (per-token rows never reach the wire).
  private def q81(s: SparkSession, d: String): DataFrame =
    docGrams(s, d)
      .groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= BoilerplateMinDf)
      .orderBy(col("df").desc, col("gram"))

  private val q81Sql = {
    val gram = (0 until GramLen).map(j => s"toks[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH g AS (
      |  SELECT doc_id, unnest(list_transform(
      |    range(greatest(len(toks) - ${GramLen - 1}, 0)), i -> $gram)) AS gram
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |        FROM documents) t)
      |SELECT gram, count(DISTINCT doc_id) AS df
      |FROM g
      |GROUP BY gram
      |HAVING count(DISTINCT doc_id) >= $BoilerplateMinDf
      |ORDER BY df DESC, gram""".stripMargin
  }

  // q82 — overlapping token chunking: each document becomes
  // 1 + max(0, ceil((n - size) / stride)) chunks of `ChunkSize` tokens
  // at `ChunkStride` offsets (so consecutive chunks share
  // size - stride tokens). Emits the chunk fingerprint rather than the
  // text — downstream dedup operates on hashes. Single scan, zero
  // data-sized shuffle beyond the token materialization; the chunk
  // count formula stays in non-negative integer arithmetic so Spark's
  // truncating `div` and DuckDB's flooring `//` agree.
  private def q82(s: SparkSession, d: String): DataFrame =
    toksDf(s, d)
      .withColumn("nck",
        expr(s"greatest(0L, size(toks) - $ChunkSize + ${ChunkStride - 1})" +
          s" div $ChunkStride") + 1)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("nck") - 1)).as("k"))
      .select(col("doc_id"), col("k").as("chunk_id"),
        slice(col("toks"), (col("k") * ChunkStride + 1).cast("int"), lit(ChunkSize)).as("ck"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("ck")).cast("long").as("n_toks"),
        hash60(concat_ws(" ", col("ck"))).as("chunk_hash"))
      .orderBy(col("doc_id"), col("chunk_id"))

  private val q82Sql = {
    val sliceExpr = s"list_slice(toks, k*$ChunkStride+1, k*$ChunkStride+$ChunkSize)"
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |           FROM documents),
      |c AS (SELECT doc_id, toks, unnest(range(
      |        greatest(0, len(toks) - $ChunkSize + ${ChunkStride - 1}) // $ChunkStride + 1)) AS k
      |      FROM t)
      |SELECT doc_id, k AS chunk_id,
      |  CAST(len($sliceExpr) AS BIGINT) AS n_toks,
      |  ${hash60Sql(s"array_to_string($sliceExpr, ' ')")} AS chunk_hash
      |FROM c
      |ORDER BY doc_id, chunk_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q81_boilerplate_ngrams", q81, Some(q81Sql)),
    Q("q82_token_chunking", q82, Some(q82Sql)),
  )
}
