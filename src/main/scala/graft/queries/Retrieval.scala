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
    * counts: join the phrase terms' postings on doc_id, intersect the
    * rebased position arrays.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val idx = positionalPostings(docs)
    val rebased = phrase.zipWithIndex.map { case (t, i) =>
      idx.filter(col("term") === t)
        .select(col("doc_id"),
          transform(col("positions"), p => p - i).as(s"__p$i"))
    }
    // inner join: a doc missing any term cannot match the phrase; the
    // joined frame is bounded by the rarest term's posting count
    val joined = rebased.reduce((a, b) => a.join(b, "doc_id"))
    val inter = (1 until phrase.length).foldLeft(col("__p0")) {
      case (acc, i) => array_intersect(acc, col(s"__p$i"))
    }
    joined.select(col("doc_id"), size(inter).cast("long").as("n_matches"))
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
