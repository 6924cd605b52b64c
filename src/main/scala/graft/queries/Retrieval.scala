package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Positional inverted index + phrase search — the retrieval primitive
  * of a contamination / benchmark-leak scanner (find every document
  * containing an exact phrase), built the way a search engine shards
  * it, not by rescanning the corpus per query.
  *
  * Scale design:
  *  - the index row is (term, doc_id, positions) — grouped by
  *    (term, doc_id), NOT by term alone, so a stopword's postings are
  *    millions of bounded rows instead of one unbounded collect_list
  *    (the reducer-OOM failure mode of the naive inverted index);
  *  - a phrase query touches only its own terms' postings: the filter
  *    on `term` sits below the grouping, so Catalyst prunes the
  *    explode output before any shuffle — at scale, with the index
  *    materialized term-bucketed, this is an index seek, and the
  *    per-query shuffle is O(postings of the query terms), never
  *    O(corpus);
  *  - adjacency is position arithmetic: a k-term phrase matches at p
  *    iff p+i ∈ positions(term_i) for all i, i.e. the intersection of
  *    the offset-rebased position arrays ∩_i (positions_i − i) — one
  *    codegen'd array_intersect fold per candidate doc, no
  *    re-tokenization of text at query time.
  *
  * ssp has no text/retrieval surface (SURVEY.md §2.2) — beyond-
  * reference, LLM-pipeline category (exact-phrase benchmark
  * contamination sweeps at corpus scale).
  */
object Retrieval {

  /** Positional postings over a (doc_id, text, ...) frame: one row per
    * (term, doc_id) with the sorted token positions of that term in
    * that document.
    */
  def positionalPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("positions"))

  /** Documents containing the exact token phrase, with occurrence
    * counts. ONE pass over the postings for a k-term phrase: the
    * postings build runs once, pruned to the phrase's terms before the
    * grouping shuffle, then a broadcast (term, offset) join rebases
    * each term's positions and a single groupBy(doc_id) intersects the
    * offset-rebased arrays — a doc matches at p iff every term's
    * rebased array contains p. A doc missing any offset is dropped by
    * the count gate (the inner-join semantics of the old k-way form,
    * without the k corpus scans).
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val idx = positionalPostings(docs).filter(col("term").isin(phrase.distinct: _*))
    // a term repeated in the phrase matches once per offset it holds
    val offsets = phrase.zipWithIndex.toDF("term", "i")
    val rebased = idx.join(broadcast(offsets), "term")
      .select(col("doc_id"), col("i"),
        transform(col("positions"), p => p - col("i")).as("ps"))
    rebased.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__nterms"),
        array_sort(collect_list(struct(col("i"), col("ps")))).as("__arrs"))
      .filter(col("__nterms") === phrase.length) // every offset present
      .select(col("doc_id"),
        size(aggregate(slice(col("__arrs"), 2, phrase.length - 1),
          col("__arrs").getItem(0).getField("ps"),
          (acc, x) => array_intersect(acc, x.getField("ps"))))
          .cast("long").as("n_matches"))
      .filter(col("n_matches") > 0)
      .orderBy(col("doc_id"))
  }

  // q85 — exact-phrase sweep for "hash join" over the corpus: the
  // benchmark-contamination query shape. Oracle: direct adjacent-token
  // count per document (same semantics, scan form).
  private def q85(s: SparkSession, d: String): DataFrame =
    phraseSearch(documents(s, d), Seq("hash", "join"))

  private val q85Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val hits = s"len(list_filter(range(len(toks) - 1), i -> toks[i+1] = 'hash' AND toks[i+2] = 'join'))"
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents)
      |SELECT doc_id, CAST($hits AS BIGINT) AS n_matches
      |FROM t
      |WHERE $hits > 0
      |ORDER BY doc_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q85_phrase_search", q85, Some(q85Sql)),
  )
}
