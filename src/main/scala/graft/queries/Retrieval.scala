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

  /** BM25 query terms / result size for q106. */
  private val Bm25Terms = Seq("hash", "join", "sort")
  private val Bm25TopK = 15

  // q106 — BM25 ranked retrieval over the token-frequency index: the
  // other half of a search surface (q85 is the boolean/phrase path,
  // this is the scored path). Standard BM25 tf saturation with
  // k1 = 1.2, b = 0.75 and document-length normalization; the idf
  // dampening is sqrt((N - df + 0.5)/(df + 0.5)) rather than ln(·) —
  // sqrt, divide, multiply and add are IEEE-correctly-rounded in every
  // engine, so the scores are bit-reproducible in the DuckDB oracle,
  // where ln differs in the last ulp between libms. (Monotone in the
  // same odds ratio; swap ln in where cross-engine bit-equality is not
  // required.) The cross-term sum is a FIXED left-associated
  // three-operand expression over per-term conditional aggregates (at
  // most one non-null contribution per term per doc), not a float
  // sum() whose accumulation order the engine chooses.
  //
  // Scale shape: one corpus tokenize; the term filter sits below the
  // grouping shuffle, so per-token rows are pruned map-side to the
  // query's own postings (the q85 index-seek property); df and the
  // (N, Σdl) stats are a |terms|-row and a 1-row broadcast; the final
  // top-k is TakeOrderedAndProject — per-partition heaps, no global
  // sort.
  private def q106(s: SparkSession, d: String): DataFrame = {
    val lens = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"), col("toks"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val postings = lens
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = postings
      .join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        sqrt((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) +
            lit(0.75) * col("dl") / (col("sum_dl").cast("double") / col("n_docs")))))
    contrib.groupBy(col("doc_id"))
      .agg(
        max(when(col("term") === "hash", col("contrib"))).as("c_hash"),
        max(when(col("term") === "join", col("contrib"))).as("c_join"),
        max(when(col("term") === "sort", col("contrib"))).as("c_sort"),
        count(lit(1)).as("n_terms"))
      .withColumn("score",
        coalesce(col("c_hash"), lit(0.0)) + coalesce(col("c_join"), lit(0.0)) +
          coalesce(col("c_sort"), lit(0.0)))
      .select(col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(Bm25TopK)
  }

  private val q106Sql =
    s"""WITH t AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      |l AS (SELECT doc_id, len(toks) AS dl, toks FROM t),
      |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM l),
      |p AS (SELECT doc_id, dl, unnest(toks) AS term FROM l),
      |pf AS (SELECT doc_id, dl, term, count(*) AS tf FROM p
      |  WHERE term IN ('hash','join','sort') GROUP BY doc_id, dl, term),
      |dfreq AS (SELECT term, count(*) AS df FROM pf GROUP BY term),
      |c AS (SELECT doc_id, pf.term AS term,
      |    sqrt((n_docs - df + 0.5::DOUBLE) / (df + 0.5::DOUBLE)) * (tf * 2.2::DOUBLE)
      |      / (tf + 1.2::DOUBLE * (0.25::DOUBLE +
      |        0.75::DOUBLE * dl / (CAST(sum_dl AS DOUBLE) / n_docs))) AS contrib
      |  FROM pf JOIN dfreq USING (term), st)
      |SELECT doc_id, count(*) AS n_terms,
      |  coalesce(max(CASE WHEN term='hash' THEN contrib END), 0.0::DOUBLE)
      |  + coalesce(max(CASE WHEN term='join' THEN contrib END), 0.0::DOUBLE)
      |  + coalesce(max(CASE WHEN term='sort' THEN contrib END), 0.0::DOUBLE) AS score
      |FROM c GROUP BY doc_id
      |ORDER BY score DESC, doc_id LIMIT $Bm25TopK""".stripMargin

  // q156 — reciprocal-rank fusion, the standard hybrid-retrieval
  // combiner (Cormack/Clarke/Buettcher's RRF): fuse a LEXICAL ranking
  // (total tf of the query terms) with a SEMANTIC ranking (cosine to a
  // query embedding) by summing 1/(60 + rank) over the lists each
  // candidate appears in. Scores are 2^20-fixed-point integer
  // (2^20 DIV (60 + rank)), so fusion arithmetic is bit-equal across
  // engines.
  //
  // Scale shape: each list is produced by orderBy+limit — Spark plans
  // TakeOrderedAndProject (per-partition bounded heaps, no global
  // sort) — and rank assignment runs AFTER the cut, as a window over a
  // candidate frame bounded by the constant RrfCand (the
  // single-partition window is over ≤50 rows by construction). The
  // fusion join is a full outer over two ≤50-row frames. The corpus is
  // touched once per modality; nothing unbounded ever sits in one
  // partition.
  private val RrfK = 60L
  private val RrfScale = 1048576L // 2^20
  private val RrfCand = 50
  private val RrfTopN = 15

  private def q156(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(s)
    // lexical: total query-term tf per doc; doc 0 is the query doc and
    // is excluded from both lists
    val lex = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(Bm25Terms: _*) && col("doc_id") =!= 0)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("doc_id")).limit(RrfCand)
      .withColumn("lex_rk",
        row_number().over(Window.orderBy(col("tf").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id").as("id"), col("lex_rk"))
    // semantic: cosine to the embedding of vec_id 0 (the query vector)
    val e = embeddings(s, d)
    val qv = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val sem = e.filter(col("vec_id") =!= 0).crossJoin(broadcast(qv))
      .withColumn("cos", expr("cosine_sim(qvec, embedding)"))
      .select(col("vec_id"), col("cos"))
      .orderBy(col("cos").desc, col("vec_id")).limit(RrfCand)
      .withColumn("sem_rk",
        row_number().over(Window.orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .select(col("vec_id").as("id"), col("sem_rk"))
    lex.join(sem, Seq("id"), "full_outer")
      .withColumn("rrf_fp", // from the RAW nullable ranks
        coalesce(expr(s"$RrfScale DIV ($RrfK + lex_rk)"), lit(0L)) +
          coalesce(expr(s"$RrfScale DIV ($RrfK + sem_rk)"), lit(0L)))
      .select(col("id"), coalesce(col("lex_rk"), lit(0L)).as("lex_rk"),
        coalesce(col("sem_rk"), lit(0L)).as("sem_rk"), col("rrf_fp"))
      .orderBy(col("rrf_fp").desc, col("id")).limit(RrfTopN)
  }

  private val q156Sql = {
    val terms = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
      |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
      |  FROM documents),
      |lex0 AS (
      |  SELECT doc_id, count(*) AS tf FROM toks
      |  WHERE term IN ($terms) AND doc_id <> 0 GROUP BY doc_id),
      |lex AS (
      |  SELECT doc_id AS id, row_number() OVER (ORDER BY tf DESC, doc_id) AS lex_rk
      |  FROM lex0 QUALIFY lex_rk <= $RrfCand),
      |qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      |sem0 AS (
      |  SELECT vec_id, ${Similarity.cosSql("qvec", "embedding")} AS cos
      |  FROM embeddings, qv WHERE vec_id <> 0),
      |sem AS (
      |  SELECT vec_id AS id, row_number() OVER (ORDER BY cos DESC, vec_id) AS sem_rk
      |  FROM sem0 QUALIFY sem_rk <= $RrfCand),
      |f AS (
      |  SELECT coalesce(lex.id, sem.id) AS id,
      |    coalesce(lex.lex_rk, 0) AS lex_rk, coalesce(sem.sem_rk, 0) AS sem_rk,
      |    CAST(coalesce($RrfScale // ($RrfK + lex.lex_rk), 0)
      |       + coalesce($RrfScale // ($RrfK + sem.sem_rk), 0) AS BIGINT) AS rrf_fp
      |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
      |SELECT id, lex_rk, sem_rk, rrf_fp FROM f
      |ORDER BY rrf_fp DESC, id LIMIT $RrfTopN""".stripMargin
  }

  // q229 — Fagin's Threshold Algorithm (TA) over two sorted score
  // indexes, with the certified early-stop depth as the headline
  // output: serve top-k by a COMBINED score (here two curation
  // signals: raw length s1 = n_chars, lexical richness
  // s2 = 1024·|distinct tokens| + |tokens|) while reading only a
  // prefix of each single-signal index. TA's invariant: after reading
  // depth d of both lists, no unseen item can beat
  // T(d) = s1[d] + s2[d], so once the k-th best SEEN combined score
  // reaches T(d), the top-k is proven final. The query computes that
  // minimal certified depth d* exactly and emits it beside the top-k
  // — at every testdata scale d* ≈ 17 while the corpus is 500–5000
  // docs, the measured "index prefix read instead of full scan".
  //
  // Scale shape: ONE corpus scan builds (s1, s2); both global ranks
  // come from [[Sampling.rankDistributed]] (range exchange + carry —
  // no single-partition window over the corpus); everything after the
  // `minr <= cap` gate is arithmetic over frames bounded by the
  // CONSTANT [[TaDepthCap]] (≤ 2·cap candidate rows, ≤ cap threshold
  // rows, ≤ 2·cap² audit rows) — the by-design bounded BNLJ of the
  // q44/q75 pattern. The serving top-k itself is
  // TakeOrderedAndProject over the scores frame, so boundary ties at
  // comb == T(d*) resolve identically in both engines (TA would
  // return AN optimal top-k; the global cut pins WHICH one under the
  // (comb desc, doc_id) order).
  private val TaK = 10
  private val TaDepthCap = 256

  /** Core: top-k by combined score plus the certified TA stop depth,
    * over a (doc_id, s1, s2) two-signal score frame. Fixture-testable.
    */
  private[graft] def taTopkOf(scored: DataFrame, k: Int, depthCap: Int): DataFrame = {
    val scores = scored
      .withColumn("comb", col("s1") + col("s2"))
      .localCheckpoint(false) // consumed by two rank passes + the top-k
    val r1 = Sampling.rankDistributed(scores, Seq.empty,
        Seq(col("s1").desc, col("doc_id")))
      .select(col("doc_id"), col("s1").as("s1d"), col("rk").as("r1"))
    val r2 = Sampling.rankDistributed(scores, Seq.empty,
        Seq(col("s2").desc, col("doc_id")))
      .select(col("doc_id"), col("s2").as("s2d"), col("rk").as("r2"))
    val thr = r1.filter(col("r1") <= depthCap).select(col("r1").as("d"), col("s1d"))
      .join(r2.filter(col("r2") <= depthCap).select(col("r2").as("d"), col("s2d")), "d")
      .select(col("d"), (col("s1d") + col("s2d")).as("t"))
    val cand = scores.select(col("doc_id"), col("comb"))
      .join(r1.select(col("doc_id"), col("r1")), "doc_id")
      .join(r2.select(col("doc_id"), col("r2")), "doc_id")
      .withColumn("minr", least(col("r1"), col("r2")))
      .filter(col("minr") <= depthCap)
    import org.apache.spark.sql.expressions.Window
    val kframe = cand.join(broadcast(thr), col("minr") <= col("d"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("d")).orderBy(col("comb").desc, col("doc_id"))))
      .filter(col("rn") === k && col("comb") >= col("t"))
    val stop = kframe.orderBy(col("d")).limit(1)
      .select(col("d").as("stop_depth"), col("t").as("threshold_at_stop"))
    scores.select(col("doc_id"), col("s1"), col("s2"), col("comb").as("comb_score"))
      .orderBy(col("comb_score").desc, col("doc_id")).limit(k)
      .crossJoin(broadcast(stop))
      .orderBy(col("comb_score").desc, col("doc_id"))
  }

  private def q229(s: SparkSession, d: String): DataFrame =
    taTopkOf(
      documents(s, d).select(col("doc_id"),
        col("n_chars").as("s1"),
        (size(array_distinct(tokens(col("text")))).cast("long") * 1024L +
          size(tokens(col("text"))).cast("long")).as("s2")),
      TaK, TaDepthCap)

  private val q229Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH sc AS (
      |  SELECT doc_id, CAST(n_chars AS BIGINT) AS s1,
      |    CAST(len(list_distinct($toks)) * 1024 + len($toks) AS BIGINT) AS s2,
      |    CAST(n_chars + len(list_distinct($toks)) * 1024 + len($toks) AS BIGINT) AS comb
      |  FROM documents),
      |r1 AS (SELECT doc_id, s1,
      |    row_number() OVER (ORDER BY s1 DESC, doc_id) AS r1 FROM sc),
      |r2 AS (SELECT doc_id, s2,
      |    row_number() OVER (ORDER BY s2 DESC, doc_id) AS r2 FROM sc),
      |thr AS (
      |  SELECT r1.r1 AS d, r1.s1 + r2.s2 AS t
      |  FROM r1 JOIN r2 ON r1.r1 = r2.r2 WHERE r1.r1 <= $TaDepthCap),
      |cand AS (
      |  SELECT sc.doc_id, sc.comb, least(r1.r1, r2.r2) AS minr
      |  FROM sc JOIN r1 USING (doc_id) JOIN r2 USING (doc_id)
      |  WHERE least(r1.r1, r2.r2) <= $TaDepthCap),
      |kb AS (
      |  SELECT d, t, comb,
      |    row_number() OVER (PARTITION BY d ORDER BY comb DESC, doc_id) AS rn
      |  FROM thr JOIN cand ON cand.minr <= thr.d),
      |stop AS (
      |  SELECT CAST(d AS BIGINT) AS stop_depth, t AS threshold_at_stop
      |  FROM kb WHERE rn = $TaK AND comb >= t ORDER BY d LIMIT 1),
      |topk AS (
      |  SELECT doc_id, s1, s2, comb AS comb_score FROM sc
      |  ORDER BY comb DESC, doc_id LIMIT $TaK)
      |SELECT doc_id, s1, s2, comb_score, stop_depth, threshold_at_stop
      |FROM topk, stop ORDER BY comb_score DESC, doc_id""".stripMargin
  }

  /** q246 regex pattern: 'stream' then 'window' within 40 chars. */
  val RegexPattern = "stream.{0,40}window"

  /** The pattern's required literal factors, as character trigrams —
    * what a trigram-index planner (Google Code Search / Zoekt style)
    * extracts from the regex: every match must contain BOTH literals,
    * hence all of their trigrams.
    */
  val RequiredTrigrams: Seq[String] =
    (("stream".sliding(3) ++ "window".sliding(3)).toSeq.distinct)

  // q246 — trigram-indexed regex search: run the regex
  // 'stream.{0,40}window' over the corpus WITHOUT a full regex scan.
  // The planner extracts the regex's required literal factors
  // ('stream', 'window'), takes their character trigrams, seeks the
  // trigram posting index for docs containing ALL of them, and applies
  // the real regex only to that candidate set — the published
  // architecture of Google Code Search / Zoekt / Hound. The report is
  // the per-source funnel (docs → trigram candidates → true matches):
  // candidate exactness is proven by the oracle recomputing the same
  // trigram-containment prefilter, and losslessness by n_matched
  // coming from regex-over-candidates in Spark vs regex-over-EVERYTHING
  // in DuckDB — any candidate-set miss would show as a count mismatch.
  //
  // Scale shape: at 100 TB the (trigram, doc_id) index is materialized
  // once, bucketed by trigram; a query touches only its ~8 trigrams'
  // postings (index seek, O(postings) not O(corpus)). Here the index
  // build filters to the required trigrams BELOW the distinct, so the
  // shuffle carries only matching postings; the regex runs on the
  // candidate semi-join output only. No full-corpus regex pass.
  private def q246(s: SparkSession, d: String): DataFrame = {
    val need = RequiredTrigrams
    val docs = documents(s, d)
      .select(col("doc_id"), col("source"), lower(col("text")).as("t"))
    // posting seek: explode char trigrams, keep only the query's
    // trigrams, dedup — (trigram, doc_id) rows for 8 trigrams.
    val postings = docs
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, greatest(length(t) - 2, 1)), k -> substring(t, k, 3))"))
        .as("g"))
      .filter(col("g").isin(need: _*))
      .distinct()
    val candidates = postings.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("ng"))
      .filter(col("ng") === need.size)
      .select(col("doc_id"))
    val cand = docs.join(candidates, Seq("doc_id"), "left_semi")
      .withColumn("m", col("t").rlike(RegexPattern))
    docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .join(cand.groupBy(col("source"))
          .agg(count(lit(1)).as("n_candidates"),
            sum(when(col("m"), 1L).otherwise(0L)).as("n_matched")),
        Seq("source"), "left_outer")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"))
      .orderBy(col("source"))
  }

  private val q246Sql = {
    val candPred = RequiredTrigrams
      .map(g => s"contains(lower(text), '$g')").mkString(" AND ")
    s"""WITH d AS (
      |  SELECT doc_id, source, lower(text) AS t,
      |    ($candPred) AS is_cand
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN is_cand THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_candidates,
      |  CAST(sum(CASE WHEN regexp_matches(t, '$RegexPattern')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
      |FROM d GROUP BY source
      |ORDER BY source""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q85_phrase_search", q85, Some(q85Sql)),
    Q("q106_bm25", q106, Some(q106Sql)),
    Q("q156_rrf_fusion", q156, Some(q156Sql)),
    Q("q229_ta_topk", q229, Some(q229Sql)),
    Q("q246_trigram_regex", q246, Some(q246Sql)),
  )
}
