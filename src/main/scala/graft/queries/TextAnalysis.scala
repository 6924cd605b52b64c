package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.functions.GraftFunctions
import graft.functions.TextFns._

/** Text-analysis operators over the `documents` table: token statistics,
  * language ID, quality scoring, and content fingerprinting — the
  * per-document feature extraction stage of a training-data pipeline.
  * Everything is a single scan with codegen'd expressions (no UDFs, no
  * shuffle except final aggregations), so throughput is IO-bound at
  * 100 TB.
  *
  * Determinism: ratios are emitted as raw doubles (identical int inputs
  * → identical IEEE division results in both engines); no rounding.
  */
object TextAnalysis {

  // q50 — token statistics per document: whitespace-token and
  // regex-token counts, char counts, average token length, distinct
  // ratio (type-token ratio).
  private def q50(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_measured"),
        tokenCount(col("text")).as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
        (size(col("toks")).cast("double") / greatest(length(col("text")), lit(1))).as("token_density"),
        (aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).cast("double") /
          greatest(size(col("toks")), lit(1))).as("avg_token_len"))
      .orderBy(col("doc_id"))

  private val q50Sql =
    """SELECT doc_id,
      |  length(text) AS n_chars_measured,
      |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
      |  len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS n_distinct,
      |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE)
      |    / greatest(length(text), 1) AS token_density,
      |  CAST(list_reduce(list_prepend(0, list_transform(
      |      regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t))),
      |      (acc, x) -> acc + x) AS DOUBLE)
      |    / greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1) AS avg_token_len
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // q51 — language identification by stopword-marker scoring: argmax
  // over per-language marker hit counts, deterministic tie-break by
  // score then language code; 'und' when nothing matches.
  private def q51(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val scored = documents(s, d)
      .withColumn("toks", toks)
      .select(col("doc_id") +: col("lang").as("lang_label") +:
        LangMarkers.map { case (code, words) =>
          markerHits(col("toks"), words).as(s"score_$code")
        }: _*)
    // argmax via greatest + chained when: deterministic order en,es,de,fr
    val maxScore = greatest(LangMarkers.map { case (c, _) => col(s"score_$c") }: _*)
    val pred = LangMarkers.foldRight(lit("und")) { case ((c, _), els) =>
      when(col(s"score_$c") === maxScore && maxScore > 0, lit(c)).otherwise(els)
    }
    scored
      .withColumn("lang_pred", pred)
      .select((Seq(col("doc_id"), col("lang_label"), col("lang_pred")) ++
        LangMarkers.map { case (c, _) => col(s"score_$c") }): _*)
      .orderBy(col("doc_id"))
  }

  private val q51Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val scores = LangMarkers.map { case (c, words) =>
      s"${markerHitsSql(toks, words)} AS score_$c"
    }.mkString(",\n      |  ")
    val maxExpr = LangMarkers.map { case (c, _) => s"score_$c" }.mkString("greatest(", ", ", ")")
    val pred = LangMarkers.foldRight("'und'") { case ((c, _), els) =>
      s"CASE WHEN score_$c = $maxExpr AND $maxExpr > 0 THEN '$c' ELSE $els END"
    }
    s"""SELECT doc_id, lang_label, $pred AS lang_pred,
      |  ${LangMarkers.map { case (c, _) => s"score_$c" }.mkString(", ")}
      |FROM (
      |  SELECT doc_id, lang AS lang_label,
      |  $scores
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin
  }

  // q52 — quality scoring: stopword ratio, type-token ratio, length and
  // repetition features combined into a single filterable score.
  private def q52(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    documents(s, d)
      .withColumn("toks", toks)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("sw_hits", markerHits(col("toks"), Stopwords))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .select(
        col("doc_id"),
        col("n_toks"),
        (col("sw_hits").cast("double") / greatest(col("n_toks"), lit(1L))).as("stopword_ratio"),
        (col("n_distinct").cast("double") / greatest(col("n_toks"), lit(1L))).as("ttr"),
        when(col("n_toks") >= 20 && col("n_toks") <= 1000, 1.0).otherwise(0.0).as("len_ok"),
        ((col("n_distinct").cast("double") / greatest(col("n_toks"), lit(1L))) *
          when(col("n_toks") >= 20 && col("n_toks") <= 1000, 1.0).otherwise(0.0)).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val q52Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val sw = markerHitsSql("toks", Stopwords)
    s"""SELECT doc_id, n_toks,
      |  CAST(sw_hits AS DOUBLE) / greatest(n_toks, 1) AS stopword_ratio,
      |  CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1) AS ttr,
      |  CASE WHEN n_toks BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END AS len_ok,
      |  (CAST(n_distinct AS DOUBLE) / greatest(n_toks, 1)) *
      |    (CASE WHEN n_toks BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END) AS quality
      |FROM (
      |  SELECT doc_id, len(toks) AS n_toks, $sw AS sw_hits,
      |    len(list_distinct(toks)) AS n_distinct
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t1) t2
      |ORDER BY doc_id""".stripMargin
  }

  // q53 — content fingerprinting: portable 60-bit hash of the
  // normalized text (md5-derived, identical in both engines) plus the
  // group size per fingerprint — the first stage of exact dedup.
  private def q53(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"), hash60(normalize(col("text"))).as("fingerprint"))
      .withColumn("n_same", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))))
      .orderBy(col("doc_id"))

  private val q53Sql =
    s"""SELECT doc_id, fingerprint,
      |  count(*) OVER (PARTITION BY fingerprint) AS n_same
      |FROM (SELECT doc_id,
      |  ${hash60Sql(normalizeSql("text"))} AS fingerprint
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  // q54 — Rabin–Karp rolling-hash fingerprints: polynomial hash of
  // every 16-byte window of the normalized text, O(1) per shift in the
  // codegen'd RollingHashes expression; summary stats per doc. The
  // oracle evaluates the direct Horner formula per window (O(n·w)) —
  // identical values, so the rolling optimization is itself verified.
  private def q54(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    documents(s, d)
      .select(col("doc_id"), normalize(col("text")).as("norm"))
      .select(col("doc_id"), expr("rolling_hashes(norm, 16)").as("rh"))
      .select(
        col("doc_id"),
        size(col("rh")).cast("long").as("n_windows"),
        array_min(col("rh")).as("min_fp"),
        array_max(col("rh")).as("max_fp"),
        size(array_distinct(col("rh"))).cast("long").as("distinct_fps"))
      .orderBy(col("doc_id"))
  }

  private val q54Sql = {
    val norm = normalizeSql("text")
    s"""SELECT doc_id, len(rh) AS n_windows, list_min(rh) AS min_fp,
      |  list_max(rh) AS max_fp, len(list_distinct(rh)) AS distinct_fps
      |FROM (
      |  SELECT doc_id,
      |    ${graft.functions.TextFns.rollingHashesSql("norm", 16)} AS rh
      |  FROM (SELECT doc_id, $norm AS norm FROM documents) t1) t2
      |ORDER BY doc_id""".stripMargin
  }

  // q75 — TF-IDF keyword extraction: each document's top-3 terms by
  // term-frequency × inverse-document-frequency. The IDF is the LINEAR
  // form N/df (not log-damped): score = (tf·N)/df computes as an exact
  // integer product followed by ONE IEEE division — bit-identical
  // across engines, where ln() would be at the mercy of libm ulp
  // differences. Ranking goes through the ordinary row_number window,
  // which the RankFilterToTopK optimizer rule rewrites into the
  // bounded-heap TopK operator at plan time — this query is the
  // end-to-end demonstration that the rewrite holds under the oracle.
  private def q75(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("word"))
    val words = documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("word"))
      .filter(col("word") =!= "")
    val tf = words.groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("word"))
      .crossJoin(broadcast(n))
      .withColumn("score", (col("tf") * col("n_docs")).cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("word"), col("tf"), col("df"), col("score"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private val q75Sql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
      |  FROM documents),
      |tf AS (SELECT doc_id, word, count(*) AS tf FROM words WHERE word <> ''
      |       GROUP BY doc_id, word),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
      |n AS (SELECT count(*) AS n_docs FROM documents)
      |SELECT doc_id, rk, word, tf, df, score FROM (
      |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
      |    CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE) / df.df DESC, tf.word) AS rk
      |  FROM tf JOIN df USING (word), n) t
      |WHERE rk <= 3
      |ORDER BY doc_id, rk""".stripMargin

  // q77 — repetition-based quality filter (the Gopher/MassiveText-style
  // heuristics): per-document duplicate-2-gram and duplicate-3-gram
  // fractions plus the top-word mass fraction, combined into a keep
  // flag. A document whose text loops ("spam spam spam ...") has few
  // distinct n-grams relative to total and one dominant token — all
  // three counts fall out of ONE pass of the codegen `repetition_stats`
  // expression (functions/ArrayExpressions.scala), so the filter is a
  // single scan, no shuffle, IO-bound at 100 TB. The interpreted HOF
  // formulation (transform + concat_ws + array_distinct ×2 + a nested
  // per-distinct-token filter scan) survives only as the DuckDB oracle:
  // the counts are exact integers either way (distinct joined-string
  // n-grams == distinct token-id tuples — tokens cannot contain the
  // separator), so the ratio divisions see identical inputs. Ratios are
  // one IEEE division each (identical in both engines, no rounding).
  private def q77(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val n = size(col("toks"))
    def frac(distinct: Column, total: Column): Column =
      when(total > 0, lit(1.0) - distinct.cast("double") / total)
        .otherwise(lit(0.0))
    documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("st", expr("repetition_stats(toks)"))
      .withColumn("dup_2gram_frac", frac(element_at(col("st"), 1), n - 1))
      .withColumn("dup_3gram_frac", frac(element_at(col("st"), 2), n - 2))
      .withColumn("top_word_frac",
        when(n > 0, element_at(col("st"), 3).cast("double") / n)
          .otherwise(lit(0.0)))
      .select(
        col("doc_id"),
        n.cast("long").as("n_toks"),
        col("dup_2gram_frac"), col("dup_3gram_frac"), col("top_word_frac"),
        when(col("dup_2gram_frac") <= 0.2 && col("dup_3gram_frac") <= 0.18 &&
          col("top_word_frac") <= 0.3, 1L).otherwise(0L).as("keep"))
      .orderBy(col("doc_id"))
  }

  private val q77Sql =
    """WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, toks,
      |    list_transform(range(greatest(len(toks) - 1, 0)),
      |      i -> toks[i+1] || ' ' || toks[i+2]) AS g2,
      |    list_transform(range(greatest(len(toks) - 2, 0)),
      |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]) AS g3
      |  FROM t),
      |f AS (
      |  SELECT doc_id, len(toks) AS n_toks,
      |    CASE WHEN len(g2) > 0
      |      THEN 1 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
      |      ELSE 0 END AS dup_2gram_frac,
      |    CASE WHEN len(g3) > 0
      |      THEN 1 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
      |      ELSE 0 END AS dup_3gram_frac,
      |    CASE WHEN len(toks) > 0
      |      THEN CAST(list_max(list_transform(list_distinct(toks),
      |        w -> len(list_filter(toks, t -> t = w)))) AS DOUBLE) / len(toks)
      |      ELSE 0 END AS top_word_frac
      |  FROM g)
      |SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks,
      |  dup_2gram_frac, dup_3gram_frac, top_word_frac,
      |  CAST(CASE WHEN dup_2gram_frac <= 0.2 AND dup_3gram_frac <= 0.18
      |    AND top_word_frac <= 0.3 THEN 1 ELSE 0 END AS BIGINT) AS keep
      |FROM f
      |ORDER BY doc_id""".stripMargin

  // q91 — tokenizer-style counting: whitespace tokens AND a BPE-ish
  // GPT-2-style pre-tokenizer regex (contraction suffixes, letter runs,
  // digit runs, punctuation runs, space runs — lookahead-free so RE2
  // and Java regex tokenize identically, leftmost-first alternation in
  // both). The ratio of the two is the "tokens per word" statistic a
  // token-budgeted pipeline reports. Pure per-row regex work: one scan,
  // no shuffle except the final presentation sort.
  private val BpePattern = "'(s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

  private def q91(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0)))
        .cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0)))
        .cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  private val q91Sql = {
    val bpeSql = BpePattern.replace("'", "''")
    s"""SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(lower(text), '$bpeSql')) AS BIGINT) AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  }

  /** Feature-hashing ("hashing trick") vector width. Tiny here so the
    * oracle stays readable; the plan shape is width-independent (the
    * per-doc vector is (doc_id, bucket, cnt) rows, never a wide array).
    */
  val FhBuckets = 16

  // q96 — feature-hashed document vectors + centroid cosine: each doc
  // becomes a FhBuckets-dim token-count vector (bucket = token hash
  // mod width, the Weinberger et al. hashing trick), scored by cosine
  // against the corpus centroid — the cheap embedding-free outlier /
  // on-distribution signal (a doc whose hashed profile diverges from
  // the corpus scores low).
  //
  // Scale shape: one corpus scan to (doc_id, bucket, cnt) — a partial
  // aggregate, per-token rows never shuffle; the global vector is a
  // FhBuckets-row aggregate built in-plan and broadcast back (no
  // driver collect); dot/norm are exact integer sums, the only double
  // op is the final one-shot division — bit-identical cross-engine.
  // (Exact integer norms overflow ~2^63 around exabyte token counts;
  // at that point the centroid side switches to double accumulators —
  // the per-doc side stays exact.)
  private def q96(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val tb = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(
        call_function("ngram_hash60", col("toks"), lit(1), lit(0L))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(FhBuckets.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val g = tb.groupBy(col("bucket")).agg(sum(col("cnt")).as("gcnt"))
    val gg = g.agg(sum(col("gcnt") * col("gcnt")).as("gg"))
    tb.join(broadcast(g), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt") * col("gcnt")).as("dot"),
        sum(col("cnt") * col("cnt")).as("vv"))
      .crossJoin(broadcast(gg))
      .select(col("doc_id"), col("dot"), col("vv"),
        (col("dot").cast("double") /
          (sqrt(col("vv").cast("double")) * sqrt(col("gg").cast("double"))))
          .as("cos_centroid"))
      .orderBy(col("doc_id"))
  }

  private val q96Sql =
    s"""WITH t AS (SELECT doc_id,
      |    regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
      |h AS (SELECT doc_id,
      |    unnest(list_transform(toks, tk -> ${hash60Sql("tk")} % $FhBuckets)) AS bucket
      |  FROM t),
      |tb AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
      |  FROM h GROUP BY 1, 2),
      |g AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS gcnt FROM tb GROUP BY bucket),
      |gg AS (SELECT CAST(sum(gcnt * gcnt) AS BIGINT) AS gg FROM g),
      |p AS (SELECT doc_id, CAST(sum(cnt * gcnt) AS BIGINT) AS dot,
      |    CAST(sum(cnt * cnt) AS BIGINT) AS vv
      |  FROM tb JOIN g USING (bucket) GROUP BY doc_id)
      |SELECT doc_id, dot, vv,
      |  CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(vv AS DOUBLE)) * sqrt(CAST(gg AS DOUBLE))) AS cos_centroid
      |FROM p, gg
      |ORDER BY doc_id""".stripMargin

  // q99 — token novelty attribution: for each document, how much of
  // its distinct vocabulary appears HERE first (global first occurrence
  // by doc_id order)? The cheap "is this doc adding anything"
  // curation signal — near-zero novelty late in a crawl means the doc
  // is assembled from already-seen vocabulary.
  //
  // Scale shape: per-doc array_distinct collapses token rows map-side;
  // the (token, doc) distinct and the per-token min(doc_id) are
  // partial aggregates (vocab-sized exchanges, never per-token rows);
  // the join back to per-doc counts is keyed by doc_id. Raw token
  // strings shuffle here for oracle exactness — the production knob is
  // swapping them for ngram_hash60 1-grams (8-byte keys), which leaves
  // the plan shape unchanged.
  private def q99(s: SparkSession, d: String): DataFrame = {
    val dt = documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tk"))
    val nd = dt.groupBy(col("doc_id")).agg(count(lit(1)).as("n_distinct"))
    val nf = dt.groupBy(col("tk")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_first"))
    nd.join(nf, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_distinct"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        (coalesce(col("n_first"), lit(0L)).cast("double") / col("n_distinct"))
          .as("novelty"))
      .orderBy(col("doc_id"))
  }

  private val q99Sql =
    s"""WITH dt AS (SELECT DISTINCT doc_id, tk FROM (
      |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk
      |    FROM documents)),
      |nd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct
      |  FROM dt GROUP BY doc_id),
      |nf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_first FROM (
      |    SELECT tk, min(doc_id) AS doc_id FROM dt GROUP BY tk)
      |  GROUP BY doc_id)
      |SELECT nd.doc_id, nd.n_distinct,
      |  coalesce(nf.n_first, 0) AS n_first,
      |  CAST(coalesce(nf.n_first, 0) AS DOUBLE) / nd.n_distinct AS novelty
      |FROM nd LEFT JOIN nf USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Vocabulary size for q109 — below the corpus's distinct-token
    * count so the OOV path actually exercises.
    */
  private val VocabV = 24

  // q109 — vocabulary induction + id encoding: build the top-V
  // vocabulary by global frequency (count desc, token asc — fully
  // deterministic at the cut boundary), assign ids by rank, and encode
  // every document as its id sequence with OOV → -1 — the
  // tokenizer-fitting step that turns a curated corpus into model
  // input. The sequence is emitted as a CSV string so the value is
  // portable across engines' array renderings.
  //
  // Scale shape: the frequency table aggregates distributively
  // (map-side partials) and is vocab-sized before the rank window ever
  // runs — the single-partition window touches |distinct tokens| rows,
  // not the corpus; the vocab then broadcasts into the encode join.
  // Per-doc sequence assembly is collect_list bounded by document
  // length, grouped on doc_id.
  private def q109(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = documents(s, d)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val vocab = tok.groupBy(col("term")).agg(count(lit(1)).as("n"))
      .withColumn("id",
        row_number().over(Window.orderBy(col("n").desc, col("term"))) - 1)
      .filter(col("id") < VocabV)
      .select(col("term"), col("id"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .withColumn("id", coalesce(col("id"), lit(-1)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(when(col("id") === -1, 1L).otherwise(0L)).as("n_oov"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string")), ",").as("ids_csv"))
      .orderBy(col("doc_id"))
  }

  private val q109Sql =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(toks) AS term,
      |    unnest(range(len(toks))) AS pos
      |  FROM (SELECT doc_id,
      |      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |    FROM documents) t),
      |vocab AS (
      |  SELECT term, id FROM (
      |    SELECT term,
      |      row_number() OVER (ORDER BY count(*) DESC, term) - 1 AS id
      |    FROM tok GROUP BY term) v
      |  WHERE id < $VocabV)
      |SELECT doc_id, count(*) AS n_toks,
      |  CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  string_agg(CAST(coalesce(id, -1) AS VARCHAR), ',' ORDER BY pos) AS ids_csv
      |FROM tok LEFT JOIN vocab USING (term)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // q116 — per-source corpus profile: the data-quality dashboard every
  // ingest pipeline materializes before/after each processing stage
  // (doc counts, token totals and extremes, language spread, unique
  // normalized fingerprints, byte volume). One corpus scan into a
  // |sources|-group aggregate: the two COUNT(DISTINCT)s plan as
  // Expand(×2) + partial aggregates, so the shuffle carries
  // per-partition distinct (source, lang/fp) rows, never documents —
  // at 100 TB the wire sees O(sources × langs + sources × unique-fp
  // per partition) rows.
  private def q116(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("source"), col("lang"), col("n_chars"),
        tokenCount(col("text")).as("n_toks"),
        hash60(normalize(col("text"))).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("total_toks"),
        min(col("n_toks")).as("min_toks"),
        max(col("n_toks")).as("max_toks"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("fp")).as("n_unique"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy(col("source"))

  private val q116Sql =
    s"""SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_toks) AS BIGINT) AS total_toks,
      |  CAST(min(n_toks) AS BIGINT) AS min_toks,
      |  CAST(max(n_toks) AS BIGINT) AS max_toks,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT fp) AS n_unique,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM (
      |  SELECT source, lang, n_chars,
      |    len(regexp_extract_all(lower(text), '$TokenPattern')) AS n_toks,
      |    ${hash60Sql(normalizeSql("text"))} AS fp
      |  FROM documents) t
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // q178 — trending terms: the words whose FREQUENCY RANK moves most
  // between two corpus halves (doc_id parity as the batch proxy —
  // production compares crawl N to crawl N−1). Where q176 alarms on
  // the aggregate score distribution, this names the individual
  // movers — the vocabulary-shift report reviewed when a drift alarm
  // fires. Ranks per half via rankDistributed (vocab-sized frames,
  // range exchange + carry, no global sort window), inner-joined on
  // the word (present-in-both contract stated by the oracle), top 20
  // by |rank shift| via TakeOrderedAndProject. Rank 1 = most frequent;
  // ties break by word, so every rank is deterministic.
  private val TrendTopN = 20

  private def q178(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(pmod(col("doc_id"), lit(2)).as("half"),
        explode(tokens(col("text"))).as("word"))
      .groupBy(col("half"), col("word")).agg(count(lit(1)).as("n"))
    val ranked = Sampling.rankDistributed(counts, Seq("half"),
      Seq(col("n").desc, col("word")))
    val a = ranked.filter(col("half") === 0)
      .select(col("word"), col("n").as("n_a"), col("rk").as("rk_a"))
    val b = ranked.filter(col("half") === 1)
      .select(col("word"), col("n").as("n_b"), col("rk").as("rk_b"))
    a.join(b, Seq("word"))
      .withColumn("shift", abs(col("rk_a") - col("rk_b")))
      .orderBy(col("shift").desc, col("word"))
      .limit(TrendTopN)
      .select(col("word"), col("n_a"), col("rk_a"), col("n_b"), col("rk_b"),
        col("shift"))
  }

  private val q178Sql =
    s"""WITH t AS (
      |  SELECT doc_id % 2 AS half,
      |    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
      |  FROM documents),
      |c AS (SELECT half, word, count(*) AS n FROM t GROUP BY half, word),
      |r AS (
      |  SELECT half, word, n,
      |    row_number() OVER (PARTITION BY half ORDER BY n DESC, word) AS rk
      |  FROM c)
      |SELECT a.word AS word, a.n AS n_a, a.rk AS rk_a,
      |  b.n AS n_b, b.rk AS rk_b, abs(a.rk - b.rk) AS shift
      |FROM (SELECT * FROM r WHERE half = 0) a
      |JOIN (SELECT * FROM r WHERE half = 1) b ON a.word = b.word
      |ORDER BY shift DESC, word LIMIT $TrendTopN""".stripMargin

  // q181 — term-frequency spectrum (count-of-counts by log2 bucket):
  // how many vocabulary terms occur [2^k, 2^{k+1}) times, with each
  // bucket's share of total token mass in 2^20 fixed point — the
  // Good-Turing / vocabulary-truncation planning view (how much mass
  // do hapaxes carry? where does the head end?). The log2 bucket is
  // computed as length(bin(c)) − 1 — pure integer bit-length in BOTH
  // engines (DuckDB printf('%b')), never floor(log2(double)), whose
  // rounding near powers of two is not cross-engine portable.
  //
  // Scale shape: one explode scan into a vocab-sized count aggregate
  // (map-side combined), then a ~20-row bucket aggregate; the mass
  // share goes through DECIMAL(38,0)/HUGEINT so 100 TB token totals
  // (≫ 2^63 after the 2^20 scale-up) cannot overflow. The window runs
  // over the bucket frame only.
  private def q181(s: SparkSession, d: String): DataFrame = {
    val counts = documents(s, d)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(lit(1))
    counts
      .select(expr("CAST(length(bin(c)) - 1 AS BIGINT)").as("bucket"), col("c"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_terms"), sum(col("c")).as("n_occ"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))
      .withColumn("tot", sum(col("n_occ")).over(w))
      .withColumn("mass_fp",
        expr("CAST(CAST(n_occ AS DECIMAL(38,0)) * 1048576 DIV tot AS BIGINT)"))
      .drop("tot")
      .orderBy(col("bucket"))
  }

  private val q181Sql =
    s"""WITH c AS (
      |  SELECT term, count(*) AS c FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '$TokenPattern')) AS term
      |    FROM documents) t
      |  GROUP BY term),
      |b AS (
      |  SELECT CAST(length(printf('%b', c)) - 1 AS BIGINT) AS bucket,
      |    count(*) AS n_terms, CAST(sum(c) AS BIGINT) AS n_occ,
      |    CAST(min(c) AS BIGINT) AS min_c, CAST(max(c) AS BIGINT) AS max_c
      |  FROM c GROUP BY 1)
      |SELECT bucket, n_terms, n_occ, min_c, max_c,
      |  CAST(CAST(n_occ AS HUGEINT) * 1048576 // sum(n_occ) OVER () AS BIGINT)
      |    AS mass_fp
      |FROM b ORDER BY bucket""".stripMargin

  // q182 — vocabulary growth curve (Heaps-law audit): new distinct
  // terms contributed by each doubling block of the ingest order
  // (docs at positions [2^k, 2^{k+1})), with the cumulative vocabulary
  // after each block — the curve that decides whether a tokenizer's
  // vocab budget saturates or the corpus keeps minting terms (a
  // flattening curve at 100 TB means more data buys no new coverage).
  // First-seen attribution is the q99 machinery (min doc over distinct
  // (doc, term) pairs — vocab-sized shuffles, never per-token rows);
  // ingest positions come from rankDistributed (range exchange +
  // carry, no single-partition sort); block boundaries are emitted as
  // the observed min/max positions so the output is self-describing.
  // The cumulative sum runs over the ~log2(N)-row block frame only.
  private def q182(s: SparkSession, d: String): DataFrame = {
    val docsPos = Sampling.rankDistributed(
      documents(s, d).select(col("doc_id")), Seq.empty, Seq(col("doc_id")))
      .select(col("doc_id"), col("rk").as("pos"))
    val firstSeen = documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tk"))
      .groupBy(col("tk")).agg(min(col("doc_id")).as("doc_id"))
    val newTerms = firstSeen.join(docsPos, Seq("doc_id"))
      .select(expr("CAST(length(bin(pos)) - 1 AS BIGINT)").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_terms"))
    val docsB = docsPos
      .select(expr("CAST(length(bin(pos)) - 1 AS BIGINT)").as("bucket"), col("pos"))
      .groupBy(col("bucket"))
      .agg(min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"),
        count(lit(1)).as("n_docs"))
    val wCum = Window.partitionBy(lit(1)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docsB.join(newTerms, Seq("bucket"), "left")
      .withColumn("new_terms", coalesce(col("new_terms"), lit(0L)))
      .withColumn("cum_vocab", sum(col("new_terms")).over(wCum))
      .select(col("bucket"), col("first_pos"), col("last_pos"), col("n_docs"),
        col("new_terms"), col("cum_vocab"))
      .orderBy(col("bucket"))
  }

  private val q182Sql =
    s"""WITH dp AS (
      |  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS pos
      |  FROM documents),
      |dt AS (SELECT DISTINCT doc_id, tk FROM (
      |    SELECT doc_id,
      |      unnest(regexp_extract_all(lower(text), '$TokenPattern')) AS tk
      |    FROM documents)),
      |fs AS (SELECT tk, min(doc_id) AS doc_id FROM dt GROUP BY tk),
      |nt AS (
      |  SELECT CAST(length(printf('%b', pos)) - 1 AS BIGINT) AS bucket,
      |    count(*) AS new_terms
      |  FROM fs JOIN dp USING (doc_id) GROUP BY 1),
      |db AS (
      |  SELECT CAST(length(printf('%b', pos)) - 1 AS BIGINT) AS bucket,
      |    CAST(min(pos) AS BIGINT) AS first_pos,
      |    CAST(max(pos) AS BIGINT) AS last_pos, count(*) AS n_docs
      |  FROM dp GROUP BY 1)
      |SELECT bucket, first_pos, last_pos, n_docs,
      |  coalesce(new_terms, 0) AS new_terms,
      |  CAST(sum(coalesce(new_terms, 0)) OVER (ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_vocab
      |FROM db LEFT JOIN nt USING (bucket) ORDER BY bucket""".stripMargin

  // q226 — entropy-floor repetitiveness gate (the exact-arithmetic
  // stand-in for Gopher's compression-ratio filter): per document, the
  // quantized Shannon bound Σ_w c_w·⌊log2(n/c_w)⌋ bits — computed
  // with the bit-length trick (⌊log2(n DIV c)⌋ = bitlen(n DIV c) − 1,
  // no float logs) — and bits-per-token in 2^8 fixed point. A doc
  // whose unigram stream compresses below BitsPerTokGate bits/token
  // is template/repetition soup a real compressor would flag too;
  // unlike q77's max-run statistic this integrates ALL the
  // redundancy. Deterministic, identical in both engines.
  //
  // Scale shape: explode to (doc, token) counts (the q50 shape), one
  // per-doc aggregate; output is corpus-sized rows of 4 scalars.
  val BitsPerTokGateX256 = 512L // 2.0 bits/token in 2^8 fixed point

  private def q226(s: SparkSession, d: String): DataFrame = {
    val cnt = documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    val n = cnt.groupBy(col("doc_id")).agg(sum(col("c")).as("n_toks"))
    cnt.join(n, Seq("doc_id"))
      .select(col("doc_id"), col("n_toks"),
        expr("c * (length(bin(n_toks DIV c)) - 1)").as("b"))
      .groupBy(col("doc_id"))
      .agg(max(col("n_toks")).as("n_toks"), sum(col("b")).as("h_bits"))
      .select(col("doc_id"), col("n_toks"), col("h_bits"),
        expr("CAST(h_bits * 256 DIV greatest(n_toks, 1) AS BIGINT)")
          .as("bpt_fp256"))
      .withColumn("flagged", col("bpt_fp256") < BitsPerTokGateX256)
      .orderBy(col("doc_id"))
  }

  private val q226Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH w AS (
      |  SELECT doc_id, unnest(toks) AS tok
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t0),
      |cnt AS (SELECT doc_id, tok, count(*) AS c FROM w GROUP BY 1, 2),
      |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_toks
      |  FROM cnt GROUP BY doc_id),
      |h AS (
      |  SELECT cnt.doc_id, n.n_toks,
      |    CAST(sum(c * (length(printf('%b', n_toks // c)) - 1)) AS BIGINT)
      |      AS h_bits
      |  FROM cnt JOIN n USING (doc_id)
      |  GROUP BY 1, 2)
      |SELECT doc_id, n_toks, h_bits,
      |  CAST(h_bits * 256 // greatest(n_toks, 1) AS BIGINT) AS bpt_fp256,
      |  h_bits * 256 // greatest(n_toks, 1) < $BitsPerTokGateX256 AS flagged
      |FROM h
      |ORDER BY doc_id""".stripMargin
  }

  // q236 — greedy max-coverage data selection: pick [[GcPicks]]
  // documents maximizing marginal NEW 3-gram-shingle coverage — the
  // submodular facility-location/set-cover greedy that diversity-
  // driven subset selection (and every "cover the distribution with a
  // small eval set" task) runs, with the classic (1 − 1/e) guarantee.
  // Complements q87: k-center covers EMBEDDING space by distance,
  // this covers LEXICAL space by exact set union. Ties break by
  // doc_id, so the pick sequence is fully deterministic.
  //
  // Scale shape: the per-round argmax is orderBy+limit(1)
  // (TakeOrderedAndProject — per-partition heaps) over the
  // materialized shingle-set frame; the covered set is bounded by
  // k × max-shingles-per-doc (k constant, per-doc shingles bounded by
  // doc length), so the array_except literal stays broadcast-sized at
  // ANY corpus size — the q87/q41 bounded-driver-loop class. One
  // corpus scan; k bounded jobs.
  // q238 — TextTiling-style topic segmentation (Hearst): slide a
  // [[TtBlock]]-token block over each document, score every internal
  // block boundary by the cosine² between the adjacent blocks'
  // term-count vectors, and cut where similarity dips below
  // [[TtGate]] — the content-aware chunker a RAG/packing pipeline
  // uses instead of q82's fixed-size splits (cut where the TOPIC
  // changes, not where the token counter happens to roll over).
  // cosine² keeps the arithmetic exact: dot²·2^20 DIV (‖a‖²·‖b‖²) is
  // pure integer (counts ≤ block size, no sqrt), so both engines
  // agree bit-for-bit, and cos² is monotone in cos on [0,1] so the
  // gate is the same decision. Documents shorter than two complete
  // blocks have no internal boundary and are excluded (they are one
  // segment by definition).
  //
  // Scale shape: everything is per-document relational algebra — one
  // tokenize, a (doc, block, term) count aggregate, an adjacent-block
  // equi-join on (doc, term), two bounded aggregates. No windows over
  // the corpus, no driver loop; the join keys carry the doc_id so
  // parallelism is corpus-wide.
  val TtBlock = 20
  val TtGate = 131072L // cos² < 2^17/2^20 = 1/8  (cos < 0.354)

  /** Core: per-doc segmentation stats over a (doc_id, toks) frame.
    * Fixture-testable.
    */
  private[graft] def textTilingOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "term")))
    val nb = toks.groupBy(col("doc_id")).agg(expr(s"count(1) div $TtBlock").as("nb"))
    val c = toks.join(nb, "doc_id")
      .filter(col("pos") < col("nb") * TtBlock)
      .groupBy(col("doc_id"), expr(s"pos div $TtBlock").as("blk"), col("term"))
      .agg(count(lit(1)).as("c"))
    val nrm = c.groupBy(col("doc_id"), col("blk")).agg(sum(col("c") * col("c")).as("n2"))
    val dot = c.as("a").join(c.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.term") === col("b.term") &&
          col("b.blk") === col("a.blk") + 1)
      .groupBy(col("a.doc_id").as("doc_id"), col("a.blk").as("b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"))
    val bnd = nrm.as("x").join(nrm.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("y.blk") === col("x.blk") + 1)
      .select(col("x.doc_id").as("doc_id"), col("x.blk").as("b"),
        col("x.n2").as("na2"), col("y.n2").as("nb2"))
      .join(dot, Seq("doc_id", "b"), "left")
      .withColumn("cos2_fp",
        expr("coalesce(dot, 0L) * coalesce(dot, 0L) * 1048576 DIV (na2 * nb2)"))
    bnd.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bounds"),
        sum(when(col("cos2_fp") < TtGate, 1L).otherwise(0L)).as("n_cuts"),
        min(col("cos2_fp")).as("min_cos2_fp"))
      .select(col("doc_id"), (col("n_bounds") + 1L).as("n_blocks"),
        col("n_cuts"), (col("n_cuts") + 1L).as("n_segments"), col("min_cos2_fp"))
      .orderBy(col("doc_id"))
  }

  private def q238(s: SparkSession, d: String): DataFrame =
    textTilingOf(documents(s, d).select(col("doc_id"), tokens(col("text")).as("toks")))

  private val q238Sql =
    s"""WITH t AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, unnest(toks) AS term,
      |    generate_subscripts(toks, 1) - 1 AS pos
      |  FROM t),
      |n AS (SELECT doc_id, count(*) // $TtBlock AS nb FROM p GROUP BY doc_id),
      |c AS (
      |  SELECT p.doc_id, pos // $TtBlock AS blk, term, count(*) AS c
      |  FROM p JOIN n ON p.doc_id = n.doc_id
      |  WHERE pos < nb * $TtBlock GROUP BY 1, 2, 3),
      |nrm AS (SELECT doc_id, blk, sum(c * c) AS n2 FROM c GROUP BY 1, 2),
      |dot AS (
      |  SELECT a.doc_id, a.blk AS b, sum(a.c * bb.c) AS dot
      |  FROM c a JOIN c bb ON a.doc_id = bb.doc_id AND bb.blk = a.blk + 1
      |    AND a.term = bb.term
      |  GROUP BY 1, 2),
      |bnd AS (
      |  SELECT x.doc_id, x.blk AS b,
      |    CAST(coalesce(dot.dot, 0) * coalesce(dot.dot, 0) * 1048576
      |      // (x.n2 * y.n2) AS BIGINT) AS cos2_fp
      |  FROM nrm x JOIN nrm y ON x.doc_id = y.doc_id AND y.blk = x.blk + 1
      |  LEFT JOIN dot ON dot.doc_id = x.doc_id AND dot.b = x.blk)
      |SELECT doc_id, count(*) + 1 AS n_blocks,
      |  CAST(sum(CASE WHEN cos2_fp < $TtGate THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
      |  CAST(sum(CASE WHEN cos2_fp < $TtGate THEN 1 ELSE 0 END) + 1 AS BIGINT)
      |    AS n_segments,
      |  CAST(min(cos2_fp) AS BIGINT) AS min_cos2_fp
      |FROM bnd GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val GcPicks = 5

  /** Core: greedy max-coverage picks over a (doc_id, sh) shingle-set
    * frame. Fixture-testable.
    */
  private[graft] def greedyCoverageOf(sh0: DataFrame, k: Int): DataFrame = {
    val s = sh0.sparkSession
    import s.implicits._
    val mat = sh0.localCheckpoint(false) // k rounds re-read the shingle sets
    var covered = Array.empty[Long]
    var picked = List.empty[Long]
    var total = 0L
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    for (r <- 1 to k) {
      val base = if (picked.isEmpty) mat else mat.filter(!col("doc_id").isin(picked: _*))
      val top = base
        .select(col("doc_id"), array_except(col("sh"), typedlit(covered)).as("nw"))
        .withColumn("m", size(col("nw")).cast("long"))
        .orderBy(col("m").desc, col("doc_id"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val doc = top(0).getLong(0)
        val nw = top(0).getSeq[Long](1)
        total += nw.size
        out += ((r.toLong, doc, nw.size.toLong, total))
        covered = covered ++ nw
        picked ::= doc
      }
    }
    out.result().toDF("pick_rank", "doc_id", "marginal_new", "covered_total")
  }

  private def q236(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    greedyCoverageOf(
      documents(s, d).select(col("doc_id"),
        array_distinct(call_function("ngram_hash60",
          tokens(col("text")), lit(3), lit(0L))).as("sh")),
      GcPicks)
  }

  private val q236Sql = {
    val shingle = hash60Sql("toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]")
    val head =
      s"""t AS MATERIALIZED (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
        |  FROM documents),
        |sh AS MATERIALIZED (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(greatest(len(toks) - 2, 0)), i -> $shingle)) AS s
        |  FROM t),
        |sx AS MATERIALIZED (SELECT doc_id, unnest(s) AS x FROM sh),
        |c0 AS (SELECT CAST(NULL AS BIGINT) AS x WHERE FALSE)""".stripMargin
    val rounds = (1 to GcPicks).flatMap { r =>
      val excl = (1 until r).map(i => s"sh.doc_id != (SELECT doc_id FROM p$i)")
        .mkString(" AND ") match { case "" => "TRUE"; case e => e }
      Seq(
        s"""p$r AS MATERIALIZED (
          |  SELECT sh.doc_id, len(sh.s) - coalesce(j.n, 0) AS m
          |  FROM sh LEFT JOIN (
          |    SELECT sx.doc_id, count(*) AS n FROM sx JOIN c${r - 1} c ON sx.x = c.x
          |    GROUP BY sx.doc_id) j ON sh.doc_id = j.doc_id
          |  WHERE $excl
          |  ORDER BY m DESC, sh.doc_id LIMIT 1)""".stripMargin,
        s"""c$r AS MATERIALIZED (
          |  SELECT x FROM c${r - 1}
          |  UNION
          |  SELECT x FROM sx WHERE doc_id = (SELECT doc_id FROM p$r))""".stripMargin)
    }
    val sel = (1 to GcPicks).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS pick_rank, (SELECT doc_id FROM p$r) AS doc_id,
        |  CAST((SELECT m FROM p$r) AS BIGINT) AS marginal_new,
        |  CAST((SELECT count(*) FROM c$r) AS BIGINT) AS covered_total""".stripMargin
    }.mkString("\nUNION ALL\n")
    "WITH " + (head +: rounds).mkString(",\n") + "\n" + sel + "\nORDER BY pick_rank"
  }

  /** q256: repeated-span ladder lengths (chars) and the stride rule. */
  val SpanRungs: Seq[Int] = Seq(8, 16, 32, 64, 128)

  // q256 — repeated-span ladder (memorization-span audit): for each
  // span length L in a geometric ladder, which documents contain a
  // character span of length L that occurs at least twice IN-DOC?
  // Verbatim internal repetition at long spans is the strongest
  // memorization-risk signal a curation pass screens for — q77 counts
  // fixed 2/3-token duplicate fractions; this measures how LONG the
  // repeats get. Sampling is stride-aligned (grams start every L/4
  // chars — the q86 winnowing discipline), so each rung costs ~n/stride
  // rows and the whole ladder sums to ≈ n_chars rows per doc, linear in
  // corpus bytes; a repeat is only counted when two aligned grams
  // collide, which both engines compute identically (same md5 grams),
  // making the audit exact BY DEFINITION of its sampled semantics.
  // Reported per rung: eligible docs, docs with a repeat, the 2^20
  // fixed-point share, repeated-gram count, hottest gram multiplicity.
  //
  // Scale shape: ONE corpus scan for all five rungs — the rung ladder
  // explodes map-side (5 rows/doc) before the position explode, so the
  // whole ladder is a single pass over corpus bytes (a per-rung scan
  // would pay the 100 TB read five times), then one
  // (rung, doc, gram)-keyed aggregate over 8-byte hashes, one
  // (rung, doc)-keyed rollup, one 5-row reduction — nothing quadratic
  // in doc length, ever. Local tradeoff, measured: the fused form runs
  // ~0.5-1 s slower at sf0.1 than five independent rung pipelines
  // (one large shuffle vs five overlapping small ones), but scans the
  // corpus once instead of five times — the term that dominates when
  // the input is 100 TB of parquet rather than a page-cached 58 MB.
  private def q256(s: SparkSession, d: String): DataFrame = {
    documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"),
        explode(array(SpanRungs.map(l => lit(l.toLong)): _*)).as("l"))
      .filter(col("len") >= col("l"))
      .withColumn("stride", greatest(expr("l div 4"), lit(1L)))
      .select(col("doc_id"), col("l"), col("text"),
        explode(sequence(lit(1L), col("len") - col("l") + 1L, col("stride")))
          .as("i"))
      .select(col("doc_id"), col("l"),
        hash60(expr("substring(text, cast(i as int), cast(l as int))")).as("h"))
      .groupBy(col("l"), col("doc_id"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("l"), col("doc_id"))
      .agg(max(col("c")).as("maxc"),
        sum(when(col("c") >= 2, 1L).otherwise(0L)).as("nrep"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_docs_eligible"),
        sum(when(col("nrep") > 0, 1L).otherwise(0L)).as("n_docs_repeat"),
        sum(col("nrep")).as("n_repeat_grams"),
        max(col("maxc")).as("max_occurrences"))
      .select(col("l").as("span_len"), col("n_docs_eligible"),
        col("n_docs_repeat"),
        expr("CAST(n_docs_repeat * 1048576 DIV n_docs_eligible AS BIGINT)")
          .as("repeat_share_fp"),
        col("n_repeat_grams"), col("max_occurrences"))
      .orderBy(col("span_len"))
  }

  private val q256Sql = {
    def rung(l: Int): String = {
      val stride = math.max(l / 4, 1)
      val h = hash60Sql(s"substr(text, CAST(i AS INT), $l)")
      s"""(WITH g AS (
        |  SELECT doc_id, $h AS h
        |  FROM (
        |    SELECT doc_id, text,
        |      unnest(list_transform(range((len - $l) // $stride + 1),
        |        j -> 1 + j * $stride)) AS i
        |    FROM (SELECT doc_id, text, length(text) AS len FROM documents)
        |    WHERE len >= $l)),
        |c AS (SELECT doc_id, h, count(*) AS c FROM g GROUP BY 1, 2),
        |p AS (SELECT doc_id, max(c) AS maxc,
        |    sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS nrep
        |  FROM c GROUP BY 1)
        |SELECT $l AS span_len, count(*) AS n_docs_eligible,
        |  CAST(sum(CASE WHEN nrep > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_repeat,
        |  CAST(sum(CASE WHEN nrep > 0 THEN 1 ELSE 0 END) * 1048576
        |    // count(*) AS BIGINT) AS repeat_share_fp,
        |  CAST(sum(nrep) AS BIGINT) AS n_repeat_grams,
        |  CAST(max(maxc) AS BIGINT) AS max_occurrences
        |FROM p)""".stripMargin
    }
    SpanRungs.map(rung).mkString("SELECT * FROM (\n", "\nUNION ALL ",
      ")\nORDER BY span_len")
  }

  /** q257: BPE merge rounds learned from the corpus. */
  val BpeRounds = 6

  // q257 — BPE tokenizer TRAINING (merge-rule learning): learn the
  // first [[BpeRounds]] byte-pair-encoding merges from the corpus —
  // the step q91 (tokenize with a FIXED rule set) and q109 (encode
  // against a FIXED vocab) both presuppose and nothing in the registry
  // produced. Classic BPE (Sennrich et al.): words split to
  // characters + a </w> terminator; each round counts adjacent symbol
  // pairs weighted by word frequency, merges the most frequent pair
  // (ties: lexicographically smallest), and rewrites the symbol
  // sequences greedily left-to-right (leftmost non-overlapping —
  // exactly what `replace` does in both engines, so "s s s" under
  // merge (s,s) becomes "ss s" identically). Output: the learned merge
  // table (rank, left, right, weighted pair count) — the artifact a
  // tokenizer trainer ships.
  //
  // Scale shape: ONE corpus-sized pass (the word count); every merge
  // round then runs on the word-FREQUENCY table — vocab-sized, the
  // published way to train BPE at corpus scale (real corpora: ~1e6-1e7
  // distinct words, a frame, never the 100 TB text). Per round: one
  // vocab-sized pair explode + grouped sum, one 1-row driver collect
  // (the q41/q87/q236 bounded-loop class: BpeRounds rows total reach
  // the driver), one vocab-sized rewrite projection.
  /** Core: learn `rounds` BPE merges from a (w, cnt) word-frequency
    * frame. Returns the learned merge list and the final
    * (w, cnt, syms) vocabulary state (syms = the word's symbol
    * sequence under all learned merges). Fixture-testable.
    */
  private[graft] def bpeTrain(wordCounts: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    var vocab = wordCounts
      .select(col("w"), col("cnt"),
        concat(regexp_replace(col("w"), "(.)", "$1 "), lit("</w>")).as("syms"))
      .localCheckpoint() // vocab-sized; cuts the per-round lineage
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    for (k <- 1 to rounds) {
      val best = vocab
        .select(col("cnt"), expr(
          """explode(transform(sequence(0, size(split(syms, ' ')) - 2),
            |  i -> struct(split(syms, ' ')[i] AS l,
            |              split(syms, ' ')[i+1] AS r)))""".stripMargin).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r, c) = (best.getString(0), best.getString(1), best.getLong(2))
      learned += ((k.toLong, l, r, c))
      vocab = vocab.select(col("w"), col("cnt"),
        expr(mergeFoldSql(l, r)).as("syms"))
        .localCheckpoint()
    }
    (learned.result(), vocab)
  }

  /** Greedy leftmost non-overlapping rewrite of ONE merge (l, r) over a
    * space-joined symbol string, as a token FOLD — a space-padded string
    * replace looks equivalent but eats the separator it matched, so
    * consecutive repeats mis-merge ("a a a a" must become "aa aa",
    * replace gives "aa a a"; pinned by BpeMergesSpec). The fold merges x
    * into the accumulator's last token exactly when that token is l and
    * x is r; a token just created by a merge is lr != l, so it never
    * re-merges — the same advance-past-the-match rule as a
    * left-to-right scan. Shared by training's per-round rewrite and the
    * decoupled apply/encode pass (q283).
    */
  private def mergeFoldSqlOn(inner: String, l: String, r: String): String =
    s"""aggregate(split($inner, ' '), '', (acc, x) ->
       |  CASE WHEN acc = '' THEN x
       |       WHEN acc = '$l' AND x = '$r' THEN '$l$r'
       |       WHEN endswith(acc, ' $l') AND x = '$r'
       |         THEN left(acc, length(acc) - ${l.length}) || '$l$r'
       |       ELSE acc || ' ' || x END)""".stripMargin

  private def mergeFoldSql(l: String, r: String): String =
    mergeFoldSqlOn("syms", l, r)

  /** The Sennrich APPLY loop, decoupled from training: encode a
    * distinct-word frame (column `w`; other columns pass through) under
    * a SHIPPED rank-ordered merge table — the artifact a production
    * tokenizer distributes as merges.txt. Each merge is one greedy
    * leftmost rewrite ([[mergeFoldSql]]); all |merges| folds compose
    * into a SINGLE vocab-sized projection (no shuffles, no
    * materialization between rounds — bounded rounds, one pass), so at
    * 100 TB the encode cost is the word-frequency frame, never the
    * corpus. Property-tested against a sequential per-word BPE encoder
    * in BpeApplySpec, and pinned equal to training's own final vocab
    * state when given training's merges.
    */
  private[graft] def bpeApply(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    if (merges.size <= ExprFoldMaxMerges) bpeApplyExpr(words, merges)
    else bpeApplyTable(words, merges)

  /** The expression-fold apply: one composed Catalyst projection, fully
    * codegen'd — the fastest path at training-scale merge counts, but
    * the expression tree grows one nested fold per merge, so it cannot
    * plan/compile at production merge counts (see [[bpeApplyTable]]).
    */
  private[graft] def bpeApplyExpr(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val init = words.withColumn("syms",
      concat(regexp_replace(col("w"), "(.)", "$1 "), lit("</w>")))
    merges.foldLeft(init) { case (df, (l, r)) =>
      df.withColumn("syms", expr(mergeFoldSql(l, r)))
    }
  }

  /** Merge-count ceiling for the expression-fold apply. Above it,
    * [[bpeApply]] switches to the data-driven [[bpeApplyTable]]: the
    * fold composes one nested `aggregate` per merge, and past a few
    * dozen ranks analysis/codegen time grows superlinearly in tree
    * depth (measured in BASELINE.md round 16) long before Janino's
    * 64 KB method limit formally breaks it.
    */
  private[graft] val ExprFoldMaxMerges = 16

  /** JVM single-word Sennrich APPLY under a rank map — the data-driven
    * twin of [[mergeFoldSql]]'s fold, used when the merge table is too
    * large to compose as an expression. Semantics: identical to looping
    * EVERY merge in rank order with one greedy leftmost
    * non-overlapping pass each (BpeApplySpec's sequential reference).
    * Each iteration finds the smallest PRESENT rank strictly above the
    * last applied one and runs that single pass; skipped ranks are
    * exactly the no-op passes of the full loop, and a pair created by
    * a merge only ever fires if its rank lies ahead of the loop
    * cursor. Cost: O(|word| · merges-applied) with O(1) rank lookups —
    * independent of |merges|, so an 8k-64k production table costs the
    * same as a toy one.
    */
  private[graft] def encodeWordSyms(word: String,
      ranks: java.util.HashMap[String, Array[Int]],
      pairs: Array[(String, String)]): Array[String] = {
    var syms = new scala.collection.mutable.ArrayBuffer[String](word.length + 1)
    var c = 0
    while (c < word.length) { syms += word.charAt(c).toString; c += 1 }
    syms += "</w>"
    var last = -1
    var done = false
    while (!done) {
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        // a pair may occur at SEVERAL ranks (duplicate merges — legal,
        // and a later duplicate fires on adjacencies an intermediate
        // merge created); rs is ascending, take its first rank > last
        val rs = ranks.get(syms(i) + " " + syms(i + 1))
        if (rs != null) {
          var p = 0
          while (p < rs.length && rs(p) <= last) p += 1
          if (p < rs.length && rs(p) < best) best = rs(p)
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (l, rr) = pairs(best)
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == rr) {
            out += l + rr; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out
        last = best
      }
    }
    syms.toArray
  }

  /** Data-driven APPLY — same contract as [[bpeApplyExpr]] (column `w`
    * in, `syms` appended, other columns ride through) but the merge
    * table ships as DATA: one broadcast rank array consumed by a typed
    * mapPartitions encoder, so plan size and codegen are independent
    * of |merges| and a production merges.txt (8k-64k ranks) runs where
    * the composed expression tree cannot plan, codegen, or compile.
    * Still one vocab-sized projection — no shuffle, no
    * materialization — so the 100 TB encode cost remains the
    * word-frequency frame. Pinned equal to [[bpeApplyExpr]] and to the
    * sequential Sennrich loop in BpeApplySpec; 256-merge scale case in
    * BpeScaleSpec.
    */
  /** pair "l r" -> ascending ranks of its occurrences in the table
    * (space-safe: symbols are [a-z0-9]+ fragments or `</w>`, never
    * containing a space). Built once per partition from the broadcast
    * array — O(|merges|), cheaper than shipping a serialized map.
    */
  private[graft] def bpeRankMap(pairs: Array[(String, String)])
      : java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var k = 0
    while (k < pairs.length) {
      m.computeIfAbsent(pairs(k)._1 + " " + pairs(k)._2,
        _ => new scala.collection.mutable.ArrayBuffer[Int](1)) += k
      k += 1
    }
    val out = new java.util.HashMap[String, Array[Int]](m.size * 2)
    m.forEach((key, v) => out.put(key, v.toArray))
    out
  }

  private[graft] def bpeApplyTable(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val sess = words.sparkSession
    val bc = sess.sparkContext.broadcast(merges.toArray)
    val schema = org.apache.spark.sql.types.StructType(
      words.schema.fields :+ org.apache.spark.sql.types.StructField(
        "syms", org.apache.spark.sql.types.StringType, nullable = true))
    val wIdx = words.schema.fieldIndex("w")
    words.mapPartitions { it =>
      val pairs = bc.value
      val ranks = bpeRankMap(pairs)
      it.map { row =>
        // NULL word -> NULL syms, as the expression fold's
        // regexp_replace(NULL) yields (parity pinned in BpeApplySpec)
        val syms =
          if (row.isNullAt(wIdx)) null
          else encodeWordSyms(row.getString(wIdx), ranks, pairs).mkString(" ")
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ syms)
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Core: learned-merge table alone (q257's surface). */
  private[graft] def bpeMergesOf(wordCounts: DataFrame, rounds: Int): DataFrame = {
    val s = wordCounts.sparkSession
    import s.implicits._
    bpeTrain(wordCounts, rounds)._1
      .toDF("merge_rank", "sym_left", "sym_right", "pair_count")
      .orderBy(col("merge_rank"))
  }

  private def q257(s: SparkSession, d: String): DataFrame =
    bpeMergesOf(
      documents(s, d)
        .select(explode(tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt")),
      BpeRounds)

  // q258 — tokenizer fertility evaluation: apply q257's LEARNED merges
  // back to the corpus and report, per language, the standard
  // tokenizer-quality metrics — fertility (BPE tokens per word; the
  // headline number every tokenizer eval quotes, and the one that
  // decides training cost per document) and chars-per-token — in 2^20
  // fixed point. Training is global (one tokenizer for the corpus, as
  // shipped); evaluation slices per lang, exposing which languages the
  // learned vocabulary under-serves — the fairness audit multilingual
  // pipelines run before committing to a tokenizer.
  //
  // Scale shape: one corpus scan into the (lang, word) count frame
  // (vocab × langs rows); training runs on the global word-frequency
  // frame (vocab-sized, q257's rounds); evaluation is a vocab-sized
  // join — sum(cnt × |syms|) — so corpus text is never touched again.
  private def q258(s: SparkSession, d: String): DataFrame = {
    val wcLang = documents(s, d)
      .select(col("lang"), explode(tokens(col("text"))).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // one corpus scan feeds both training and eval
    val wcGlobal = wcLang.groupBy(col("w"))
      .agg(sum(col("cnt")).as("cnt"))
    val vocab = bpeTrain(wcGlobal, BpeRounds)._2
      .select(col("w"),
        size(split(col("syms"), " ")).cast("long").as("nsym"))
    wcLang.join(vocab, "w")
      .groupBy(col("lang"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(length(col("w")) * col("cnt")).as("n_chars"),
        sum(col("nsym") * col("cnt")).as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"),
        col("n_bpe_tokens"),
        expr("CAST(n_bpe_tokens * 1048576 DIV n_words AS BIGINT)")
          .as("fertility_fp"),
        expr("CAST(n_chars * 1048576 DIV n_bpe_tokens AS BIGINT)")
          .as("chars_per_token_fp"))
      .orderBy(col("lang"))
  }

  /** DuckDB CTE list: the q257 training chain CARRYING the word through
    * each rewrite (w0 .. w{BpeRounds}), so the final per-word symbol
    * state joins back to corpus tables — shared by the q258 fertility
    * oracle and the q283 encode oracle. Every CTE MATERIALIZED (the
    * q236 rule: chained multiply-referenced CTEs re-evaluate
    * exponentially when inlined).
    */
  /** The shared w0 CTE: corpus word frequencies with the initial
    * char-split symbol state — the root of both the training chain and
    * the q286 shipped-table oracle.
    */
  private val bpeW0Sql =
    """w0 AS MATERIALIZED (
      |  SELECT w, count(*) AS cnt,
      |    regexp_replace(w, '(.)', '\1 ', 'g') || '</w>' AS syms
      |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |        FROM documents)
      |  GROUP BY w)""".stripMargin

  private lazy val bpeWordChainSql: String = {
    val w0 = bpeW0Sql
    def round(k: Int): Seq[String] = Seq(
      s"""p$k AS MATERIALIZED (
        |  SELECT l, r FROM (
        |    SELECT a[i] AS l, a[i+1] AS r, sum(cnt) AS c FROM (
        |      SELECT cnt, a, unnest(range(1, len(a))) AS i
        |      FROM (SELECT cnt, string_split(syms, ' ') AS a FROM w${k - 1}))
        |    GROUP BY 1, 2)
        |  ORDER BY c DESC, l, r LIMIT 1)""".stripMargin,
      s"""w$k AS MATERIALIZED (
        |  SELECT w, cnt, list_reduce(string_split(syms, ' '), (acc, x) ->
        |    CASE WHEN acc = l AND x = r THEN l || r
        |         WHEN ends_with(acc, ' ' || l) AND x = r
        |           THEN left(acc, len(acc) - len(l)) || l || r
        |         ELSE acc || ' ' || x END) AS syms
        |  FROM w${k - 1}, p$k)""".stripMargin)
    (w0 +: (1 to BpeRounds).flatMap(round)).mkString(",\n")
  }

  private lazy val q258Sql = {
    s"""WITH wl AS MATERIALIZED (
      |  SELECT lang, w, count(*) AS cnt
      |  FROM (SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      |        FROM documents)
      |  GROUP BY 1, 2),
      |$bpeWordChainSql,
      |enc AS (SELECT w, len(string_split(syms, ' ')) AS nsym
      |        FROM w$BpeRounds)
      |SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
      |  CAST(sum(len(w) * cnt) AS BIGINT) AS n_chars,
      |  CAST(sum(nsym * cnt) AS BIGINT) AS n_bpe_tokens,
      |  CAST(sum(nsym * cnt) * 1048576 // sum(cnt) AS BIGINT)
      |    AS fertility_fp,
      |  CAST(sum(len(w) * cnt) * 1048576 // sum(nsym * cnt) AS BIGINT)
      |    AS chars_per_token_fp
      |FROM wl JOIN enc USING (w)
      |GROUP BY lang
      |ORDER BY lang""".stripMargin
  }

  // q283 — BPE APPLY/ENCODE: tokenize the corpus under q257's learned
  // merges and EMIT the tokenized corpus — the step every downstream
  // token count presupposes (q91 proxies with a fixed regex
  // pre-tokenizer; q257 trains merges; q258 evaluates fertility under
  // them; nothing previously emitted token ids per document). Token ids
  // are assigned deterministically over the final symbol inventory
  // (lexicographic rank — chars + </w> + the merged symbols, a frame
  // bounded by |alphabet| + BpeRounds, never corpus- or vocab-sized).
  // Per document the output digests the FULL ordered token-id sequence
  // into a fold hash (h -> (h*8191 + id) mod 2^31-1, overflow-free in
  // ANSI Spark and DuckDB alike), so the oracle compare pins the exact
  // per-doc sequence both engines would ship to a trainer — order
  // included — without dumping corpus-sized token rows into the diff.
  //
  // Scale shape: ONE corpus scan builds the word-frequency frame
  // (training input), ONE corpus scan re-reads text for per-doc word
  // positions (inherent: emission must touch every document); encoding
  // itself is [[bpeApply]] — a single vocab-sized projection under the
  // shipped merges, joined back to the positions on the word key (a
  // shuffle keyed on w: vocab-sized build, never broadcast at 100 TB),
  // then one doc_id-keyed aggregate assembles sequences. The symbol
  // table broadcasts (≤ |alphabet| + rounds rows). Docs with zero
  // [a-z0-9] tokens have no sequence and are absent in both engines.
  private def q283(s: SparkSession, d: String): DataFrame =
    bpeDocStats(s, d).orderBy(col("doc_id"))

  /** q283's core, unordered: per-doc BPE token stats + the ordered
    * token-id sequence digest. Shared by q283 and the q285 pack/loader
    * capstone (which re-keys it by source and never needs the order).
    */
  private[queries] def bpeDocStats(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // corpus scan #1: word frequencies; pinned — feeds training (which
    // re-checkpoints its own state) and the decoupled apply pass
    val wc = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val merges = bpeTrain(wc, BpeRounds)._1.map { case (_, l, r, _) => (l, r) }
    // the decoupled Sennrich apply: vocab-sized, one projection; pinned
    // (two consumers: symbol inventory + the per-doc join)
    val enc = bpeApply(wc.select(col("w")), merges).localCheckpoint()
    docDigest(docs, enc)
  }

  /** The per-doc token-id digest over an encoded (w, syms) vocab frame
    * — q283's tail, shared with the q286 shipped-table encode. One
    * corpus scan (per-doc word positions), a vocab-keyed join, a
    * broadcast symbol table, one doc_id-keyed aggregate.
    */
  private def docDigest(docs: DataFrame, enc: DataFrame): DataFrame = {
    // ≤ |alphabet| + |merges| rows — the single-partition window is a
    // bounded action, same class as the 1-row norm broadcasts
    val symtab = enc.select(explode(split(col("syms"), " ")).as("sym"))
      .distinct()
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("sym"))).cast("long"))
    // corpus scan #2: per-doc word positions -> symbol positions -> ids
    val dtok = docs
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("wpos", "w")))
      .join(enc, "w")
      .select(col("doc_id"), col("wpos"),
        posexplode(split(col("syms"), " ")).as(Seq("spos", "sym")))
      .join(broadcast(symtab), "sym")
    // n_unique comes from the already-collected sequence, NOT a
    // countDistinct: a distinct aggregate alongside collect_list forces
    // the two-phase (doc, token)/(doc) plan that drags the list buffers
    // through an extra exchange — post-hoc array_distinct keeps the
    // aggregate single-phase on doc_id (one exchange; measured in
    // BASELINE.md round 15)
    dtok.groupBy(col("doc_id"))
      .agg(
        (max(col("wpos")) + 1L).cast("long").as("n_words"),
        count(lit(1)).as("n_tokens"),
        collect_list(struct(col("wpos"), col("spos"), col("token_id"))).as("seq"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        expr("transform(array_sort(seq), x -> x.token_id)").as("ids"))
      .select(col("doc_id"), col("n_words"), col("n_tokens"),
        size(array_distinct(col("ids"))).cast("long").as("n_unique_tokens"),
        expr("""aggregate(ids, 0L,
               |  (acc, t) -> (acc * 8191L + t) % 2147483647L)"""
          .stripMargin.replace("\n", " ")).as("token_seq_hash"))
  }

  /** Streaming form of the q283 encode — the production INFERENCE path:
    * arrivals are tokenized under a FROZEN tokenizer artifact (the
    * merge table learned offline by q257, the symbol table it induces)
    * entirely inside one projection — the whole merge chain composes
    * into a per-word scalar expression evaluated inline, symbol→id is
    * an `element_at` over a literal map (the artifact is bounded by
    * |alphabet| + rounds, so it ships as a literal, never a join) — no
    * state, no shuffle, append mode. A symbol outside the frozen
    * inventory (an unseen character) maps to token id 0, the UNK
    * convention every production tokenizer ships.
    *
    * Deliberate shape difference from batch q283, documented: batch
    * encodes each DISTINCT word once on the vocab frame and joins back
    * (right at 100 TB, where word frequency is heavy-tailed); a
    * stateless stream has no distinct-word frame, so each arrival
    * re-encodes its own words inline — the standard serving tradeoff.
    * Token-free/NULL-text arrivals are filtered (batch emits no row for
    * them), so EncodeStreamSpec's bit-equality to batch q283's per-doc
    * digests holds unconditionally, not just on token-bearing corpora.
    */
  def encodeStream(stream: DataFrame, merges: Seq[(String, String)],
      symbolIds: Map[String, Long]): DataFrame = {
    if (merges.size > ExprFoldMaxMerges)
      return encodeStreamScalable(stream, merges, symbolIds)
    val enc = merges.foldLeft("concat(regexp_replace(w, '(.)', '$1 '), '</w>')") {
      case (inner, (l, r)) => mergeFoldSqlOn(inner, l, r)
    }
    val mapLit = symbolIds.toSeq.sortBy(_._1)
      .flatMap { case (s, i) => Seq(s"'${s}'", s"${i}L") }
      .mkString("map(", ", ", ")")
    stream
      // batch q283 has no row for a token-free/NULL-text document (the
      // word join drops it); filter the same docs here so stream/batch
      // parity is unconditional, not corpus-dependent
      .where(expr(s"size($tokensSql) >= 1"))
      .withColumn("ids", expr(
        s"""flatten(transform(${tokensSql}, w ->
           |  transform(split($enc, ' '), s ->
           |    coalesce(element_at($mapLit, s), 0L))))"""
          .stripMargin.replace("\n", " ")))
      .select(col("doc_id"),
        size(expr(tokensSql)).cast("long").as("n_words"),
        size(col("ids")).cast("long").as("n_tokens"),
        size(array_distinct(col("ids"))).cast("long").as("n_unique_tokens"),
        expr("aggregate(ids, 0L, (acc, t) -> (acc * 8191L + t) % 2147483647L)")
          .as("token_seq_hash"))
  }

  /** Production-vocab form of [[encodeStream]]: the same per-arrival
    * stateless encode, but the frozen artifact ships as a broadcast
    * merge array + symbol map consumed by a typed mapPartitions
    * encoder ([[encodeWordSyms]]) — plan size independent of |merges|,
    * so an 8k-64k merges.txt serves where the literal-map expression
    * cannot even parse. Same row contract: token-free/NULL-text
    * arrivals emit nothing, unknown symbols map to UNK id 0. Pinned
    * bit-equal to the expression path at training scale
    * (EncodeStreamSpec) and exercised at 256 merges (BpeScaleSpec).
    * Tokenization uses Locale.ROOT lowercasing — equal to Spark's
    * `lower` on the ASCII range the token pattern keeps.
    */
  private[graft] def encodeStreamScalable(stream: DataFrame,
      merges: Seq[(String, String)], symbolIds: Map[String, Long]): DataFrame = {
    val sess = stream.sparkSession
    import sess.implicits._
    val bc = sess.sparkContext.broadcast((merges.toArray, symbolIds))
    // doc_id decodes BOXED: a NULL doc_id arrival rides through with
    // its digest (batch q283 groups it into a NULL doc_id row and the
    // expression path emits it too — the three paths must agree on
    // degenerate input; NullRobustnessSpec pins all three)
    stream.select(col("doc_id"), col("text")).as[(java.lang.Long, String)]
      .mapPartitions { it =>
        val (pairs, symIds) = bc.value
        val ranks = bpeRankMap(pairs)
        val re = java.util.regex.Pattern
          .compile(graft.functions.TextFns.TokenPattern)
        it.flatMap { case (docId, text) =>
          val words = scala.collection.mutable.ArrayBuffer[String]()
          if (text != null) {
            val m = re.matcher(text.toLowerCase(java.util.Locale.ROOT))
            while (m.find()) words += m.group()
          }
          if (words.isEmpty) None
          else {
            var nTok = 0L
            var h = 0L
            val uniq = new java.util.HashSet[Long]()
            words.foreach { w =>
              encodeWordSyms(w, ranks, pairs).foreach { s =>
                val id = symIds.getOrElse(s, 0L)
                nTok += 1
                uniq.add(id)
                h = (h * 8191L + id) % 2147483647L
              }
            }
            Some((docId, words.length.toLong, nTok, uniq.size.toLong, h))
          }
        }
      }.toDF("doc_id", "n_words", "n_tokens", "n_unique_tokens",
        "token_seq_hash")
  }

  /** The token expression over a `text` column, as SQL text (the
    * [[graft.functions.TextFns.tokens]] formula).
    */
  private val tokensSql =
    s"regexp_extract_all(lower(text), '${graft.functions.TextFns.TokenPattern}', 0)"

  /** The frozen artifact [[encodeStream]] consumes: train merges on a
    * static corpus, derive the symbol inventory ids exactly as q283
    * does (lexicographic rank over the final symbols). The collect is
    * bounded by |alphabet| + rounds (the q41 bounded-action class).
    */
  def tokenizerArtifact(docs: DataFrame, rounds: Int = BpeRounds)
      : (Seq[(String, String)], Map[String, Long]) = {
    val wc = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val (learned, vocab) = bpeTrain(wc, rounds)
    val syms = vocab.select(explode(split(col("syms"), " ")).as("sym"))
      .distinct().orderBy(col("sym"))
      .collect().map(_.getString(0))
    (learned.map { case (_, l, r, _) => (l, r) },
      syms.zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap)
  }

  /** The per-doc digest tail (symtab → per-doc positions → token ids →
    * fold hash), assuming a CTE `enc(w, sa)` with the final per-word
    * symbol LIST is in scope — [[docDigest]]'s oracle twin, shared by
    * q283 and q286.
    */
  private val bpeDocDigestTailSql =
    """symtab AS MATERIALIZED (
      |  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT)
      |      AS token_id
      |  FROM (SELECT DISTINCT unnest(sa) AS sym FROM enc)),
      |dw AS (
      |  SELECT doc_id, u['wpos'] AS wpos, u['w'] AS w FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(ws)),
      |        j -> {'wpos': j, 'w': ws[j+1]})) AS u
      |    FROM (SELECT doc_id,
      |            regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      |          FROM documents))),
      |dsym AS (
      |  SELECT doc_id, wpos, v['spos'] AS spos, v['sym'] AS sym FROM (
      |    SELECT doc_id, wpos, unnest(list_transform(range(len(sa)),
      |        j -> {'spos': j, 'sym': sa[j+1]})) AS v
      |    FROM dw JOIN enc USING (w))),
      |dtok AS (
      |  SELECT doc_id, wpos, spos, token_id FROM dsym JOIN symtab USING (sym))
      |SELECT doc_id,
      |  CAST(max(wpos) + 1 AS BIGINT) AS n_words,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(count(DISTINCT token_id) AS BIGINT) AS n_unique_tokens,
      |  CAST(list_reduce(
      |      list_prepend(CAST(0 AS BIGINT), list(token_id ORDER BY wpos, spos)),
      |      (acc, x) -> (acc * 8191 + x) % 2147483647) AS BIGINT)
      |    AS token_seq_hash
      |FROM dtok
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  private lazy val q283Sql =
    s"""WITH $bpeWordChainSql,
      |enc AS MATERIALIZED (
      |  SELECT w, string_split(syms, ' ') AS sa FROM w$BpeRounds),
      |$bpeDocDigestTailSql""".stripMargin

  // q285 — tokenize-and-pack CAPSTONE: the final training-batch
  // manifest, composed end to end from REAL token ids — q283's per-doc
  // BPE sequences (counts + order digest), the q105/q110 repetition
  // schedule re-weighted by BPE token mass (the unit a training mix is
  // actually specified in; q110 used the regex proxy), the q110
  // loader-shuffle rank within each source, and q80's concat-then-chunk
  // packing over that loader order. One row per materialized copy in
  // loader order: which fixed-budget training sequence it lands in
  // (seq_no), where in that sequence it starts (seq_offset), and the
  // content digest that ties the slot back to the exact token ids —
  // the artifact this whole pipeline exists to ship to a trainer.
  //
  // Scale shape: the doc-stats frame (one BPE encode, pinned — two
  // consumers over an expensive upstream) feeds a |sources|-row
  // broadcast factor table; the copy explode is ≤ RepCap× doc rows;
  // the loader rank is rankDistributed (carry machinery, no global
  // sort); the pack running sum is PrefixSum's range-exchange + carry
  // (q98/q107 discipline) and the vt denominator a broadcast-joined
  // per-source copy count — no data-sized per-source sort window
  // anywhere; nothing corpus-scale lands on one task.
  private def q285(s: SparkSession, d: String): DataFrame = {
    val dd = bpeDocStats(s, d)
      .select(col("doc_id"), col("n_tokens"), col("token_seq_hash"))
      .join(documents(s, d).select(col("doc_id"), col("source")), "doc_id")
      .localCheckpoint() // 2 consumers over the full BPE encode
    val counts = dd.groupBy(col("source")).agg(sum(col("n_tokens")).as("t_src"))
    val mx = counts.agg(max(col("t_src")).as("t_max"))
    // t_src >= 1 by construction (only token-bearing docs reach dd),
    // so the div is safe under ANSI
    val factors = counts.crossJoin(broadcast(mx))
      .withColumn("factor_bp",
        least(lit(Sampling.RepCapBp), expr("(10000 * t_max) div t_src")))
      .select(col("source"), col("factor_bp"))
    val withCopies = dd.join(broadcast(factors), Seq("source"))
      .withColumn("u",
        hash60(concat(lit("rep"), col("doc_id").cast("string"))) % 10000)
      .withColumn("copies", expr("factor_bp div 10000") +
        when(col("u") < col("factor_bp") % 10000, 1L).otherwise(0L))
    // |sources|-row aggregate over the checkpointed dd chain — the
    // q107 vt-denominator shape (broadcast join, NOT a per-source
    // max-over window that would drag every copy row onto one task)
    val nCopies = withCopies.groupBy(col("source"))
      .agg(sum(col("copies")).as("n_copies"))
    val copies = withCopies
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("token_seq_hash"),
        explode(sequence(lit(0L), col("copies") - 1)).as("rep_idx"))
      .withColumn("draw", hash60(concat(lit("lo"), col("doc_id").cast("string"),
        lit("_"), col("rep_idx").cast("string"))))
    // q110's virtual-time interleave key: sources finish together at
    // vt = 1 (small sources run >1 epoch). n_copies = Σ copies per
    // source (the rank k is dense 1..n, so this equals max(k)); the
    // one IEEE division is bit-identical in both engines (q110 rule).
    // Loader rank AND pack running sum come from ONE rankAndSum pass
    // (a rank is the running sum of 1 over the same (draw, doc_id,
    // rep_idx) total order, so cum_tokens-ordered-by-k ≡ the running
    // sum in that order — one range exchange + carry serves both,
    // where rank-then-sum paid it twice). The global loader sequence
    // is ORDER BY (vt, source, k) — packing stays per source (the
    // scalable shape), the trainer interleaves PACKED sequences by vt.
    graft.ops.PrefixSum.rankAndSum(copies, Seq("source"),
        Seq(col("draw"), col("doc_id"), col("rep_idx")), col("n_tokens"))
      .withColumnRenamed("rk", "k")
      .withColumnRenamed("cum", "cum_tokens")
      .join(broadcast(nCopies), Seq("source"))
      .withColumn("vt", col("k").cast("double") / col("n_copies"))
      .select(col("source"), col("k"), col("vt"), col("doc_id"),
        col("rep_idx"), col("n_tokens"), col("cum_tokens"),
        expr(s"(cum_tokens - n_tokens) div ${Sampling.PackBudget}").as("seq_no"),
        expr(s"(cum_tokens - n_tokens) % ${Sampling.PackBudget}").as("seq_offset"),
        col("token_seq_hash"))
      .orderBy(col("source"), col("k"))
  }

  private lazy val q285Sql =
    s"""WITH $bpeWordChainSql,
      |enc AS MATERIALIZED (
      |  SELECT w, string_split(syms, ' ') AS sa FROM w$BpeRounds),
      |symtab AS MATERIALIZED (
      |  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS BIGINT)
      |      AS token_id
      |  FROM (SELECT DISTINCT unnest(sa) AS sym FROM enc)),
      |dw AS (
      |  SELECT doc_id, u['wpos'] AS wpos, u['w'] AS w FROM (
      |    SELECT doc_id, unnest(list_transform(range(len(ws)),
      |        j -> {'wpos': j, 'w': ws[j+1]})) AS u
      |    FROM (SELECT doc_id,
      |            regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
      |          FROM documents))),
      |dsym AS (
      |  SELECT doc_id, wpos, v['spos'] AS spos, v['sym'] AS sym FROM (
      |    SELECT doc_id, wpos, unnest(list_transform(range(len(sa)),
      |        j -> {'spos': j, 'sym': sa[j+1]})) AS v
      |    FROM dw JOIN enc USING (w))),
      |dtok AS (
      |  SELECT doc_id, wpos, spos, token_id FROM dsym JOIN symtab USING (sym)),
      |dstats AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(list_reduce(
      |        list_prepend(CAST(0 AS BIGINT), list(token_id ORDER BY wpos, spos)),
      |        (acc, x) -> (acc * 8191 + x) % 2147483647) AS BIGINT)
      |      AS token_seq_hash
      |  FROM dtok GROUP BY doc_id),
      |d AS MATERIALIZED (
      |  SELECT doc_id, source, n_tokens, token_seq_hash
      |  FROM dstats JOIN documents USING (doc_id)),
      |counts AS MATERIALIZED (
      |  SELECT source, sum(n_tokens) AS t_src FROM d GROUP BY source),
      |mx AS (SELECT max(t_src) AS t_max FROM counts),
      |factors AS (SELECT source,
      |    least(${Sampling.RepCapBp}, (10000 * t_max) // t_src) AS factor_bp
      |  FROM counts, mx),
      |rep AS (SELECT d.*, factor_bp // 10000 +
      |    CASE WHEN ${hash60Sql("'rep' || CAST(doc_id AS VARCHAR)")} % 10000
      |      < factor_bp % 10000 THEN 1 ELSE 0 END AS copies
      |  FROM d JOIN factors USING (source)),
      |cx AS (SELECT source, doc_id, n_tokens, token_seq_hash,
      |    unnest(range(CAST(copies AS BIGINT))) AS rep_idx FROM rep),
      |drawn AS (SELECT *,
      |    ${hash60Sql("'lo' || CAST(doc_id AS VARCHAR) || '_' || CAST(rep_idx AS VARCHAR)")}
      |      AS draw
      |  FROM cx),
      |r AS (SELECT source, doc_id, n_tokens, token_seq_hash, rep_idx,
      |    row_number() OVER (PARTITION BY source ORDER BY draw, doc_id, rep_idx)
      |      AS k
      |  FROM drawn),
      |wsum AS (SELECT r.*,
      |    max(k) OVER (PARTITION BY source) AS n_copies,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY k) AS cum_tokens
      |  FROM r)
      |SELECT source, CAST(k AS BIGINT) AS k,
      |  CAST(k AS DOUBLE) / n_copies AS vt, doc_id,
      |  CAST(rep_idx AS BIGINT) AS rep_idx, n_tokens,
      |  CAST(cum_tokens AS BIGINT) AS cum_tokens,
      |  CAST((cum_tokens - n_tokens) // ${Sampling.PackBudget} AS BIGINT)
      |    AS seq_no,
      |  CAST((cum_tokens - n_tokens) % ${Sampling.PackBudget} AS BIGINT)
      |    AS seq_offset,
      |  token_seq_hash
      |FROM wsum
      |ORDER BY source, k""".stripMargin

  /** q286's merge-table size — production scale relative to
    * [[ExprFoldMaxMerges]] (16), so [[bpeApply]]'s dispatch is far on
    * the [[bpeApplyTable]] side and the registered query provably
    * exercises the broadcast-table mapPartitions encoder. Tiny corpora
    * may yield fewer distinct pairs; both engines then carry the same
    * shorter dense-rank table.
    */
  private[graft] val TableMerges = 256

  // q286 — BPE encode under a SHIPPED production-sized merge table:
  // the deployment scenario q283 cannot reach. q283 trains and applies
  // BpeRounds(=6) merges, which [[bpeApply]] routes through the
  // composed expression fold; a real tokenizer ships merges.txt with
  // thousands of ranks, where only the data-driven [[bpeApplyTable]]
  // (broadcast rank array + typed mapPartitions encoder,
  // BpeApplySpec/BpeScaleSpec-pinned) can plan. This query puts THAT
  // code path through the DuckDB gate: the shipped table is the top
  // [[TableMerges]] adjacent-pair statistics of the char-split vocab
  // (rank = weighted count desc, then (l, r) — a deterministic, dense
  // merges.txt both engines derive identically), applied rank-ordered
  // with one greedy leftmost pass per rank — the exact loop
  // [[encodeWordSyms]] implements and the oracle replays as a nested
  // list fold (outer fold over the rank-ordered merge list, inner fold
  // = the proven w$k greedy rewrite with (l, r) from the outer
  // element). Output: q283's per-doc digest contract.
  //
  // Scale shape: q283's exactly — one corpus scan for word
  // frequencies, a 256-row bounded collect (the q41/q87/q236 class)
  // for the table, ONE vocab-sized mapPartitions projection under the
  // broadcast table (cost independent of |merges|), one corpus scan
  // for per-doc positions, a vocab-keyed join, a ≤|alphabet|+256-row
  // broadcast symbol table, one doc-keyed aggregate.
  /** q286's shipped merges.txt: the top-[[TableMerges]] adjacent-pair
    * statistics of the char-split (w, cnt) vocab, rank-ordered by
    * (weighted count desc, l, r) — a 256-row bounded collect (the
    * q41/q87/q236 class). Factored out so BpeApplySpec can pin the
    * table's size (beyond the dispatch ceiling at every SF) and replay
    * it sequentially.
    */
  private[graft] def shippedMergeTable(wc: DataFrame): Seq[(String, String)] =
    wc.select(col("cnt"),
        concat(regexp_replace(col("w"), "(.)", "$1 "), lit("</w>")).as("syms"))
      .select(col("cnt"), expr(
        """explode(transform(sequence(0, size(split(syms, ' ')) - 2),
          |  i -> struct(split(syms, ' ')[i] AS l,
          |              split(syms, ' ')[i+1] AS r)))""".stripMargin).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(col("c").desc, col("l"), col("r"))
      .limit(TableMerges)
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))

  private def q286(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val wc = docs.select(explode(tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds the pair stats AND the table apply
    val enc = bpeApplyTable(wc.select(col("w")), shippedMergeTable(wc))
      .localCheckpoint()
    docDigest(docs, enc).orderBy(col("doc_id"))
  }

  private lazy val q286Sql =
    s"""WITH $bpeW0Sql,
      |mrg AS MATERIALIZED (
      |  SELECT l || ' ' || r AS lr, row_number() OVER (ORDER BY c DESC, l, r)
      |    AS rnk
      |  FROM (
      |    SELECT a[i] AS l, a[i+1] AS r, sum(cnt) AS c FROM (
      |      SELECT cnt, a, unnest(range(1, len(a))) AS i
      |      FROM (SELECT cnt, string_split(syms, ' ') AS a FROM w0))
      |    GROUP BY 1, 2
      |    ORDER BY c DESC, l, r LIMIT $TableMerges)),
      |ml AS MATERIALIZED (SELECT list(lr ORDER BY rnk) AS ms FROM mrg),
      |enc AS MATERIALIZED (
      |  SELECT w, string_split(list_reduce(
      |    list_prepend(syms, ms),
      |    (acc, x) -> list_reduce(string_split(acc, ' '), (a2, s) ->
      |      CASE WHEN a2 = string_split(x, ' ')[1]
      |               AND s = string_split(x, ' ')[2]
      |             THEN a2 || s
      |           WHEN ends_with(a2, ' ' || string_split(x, ' ')[1])
      |               AND s = string_split(x, ' ')[2]
      |             THEN left(a2, len(a2) - len(string_split(x, ' ')[1]))
      |                  || string_split(x, ' ')[1] || s
      |           ELSE a2 || ' ' || s END)), ' ') AS sa
      |  FROM w0, ml),
      |$bpeDocDigestTailSql""".stripMargin

  private val q257Sql = {
    // every CTE MATERIALIZED (the q236 rule): the p_k scalar subqueries
    // appear several times each and w_k chains on w_{k-1} — inlining
    // would re-derive the whole chain per reference (~3^rounds blowup)
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT count(*) AS cnt,
        |    regexp_replace(w, '(.)', '\1 ', 'g') || '</w>' AS syms
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |        FROM documents)
        |  GROUP BY w)""".stripMargin
    def round(k: Int): Seq[String] = Seq(
      s"""p$k AS MATERIALIZED (
        |  SELECT l, r, c FROM (
        |    SELECT a[i] AS l, a[i+1] AS r, sum(cnt) AS c FROM (
        |      SELECT cnt, a, unnest(range(1, len(a))) AS i
        |      FROM (SELECT cnt, string_split(syms, ' ') AS a FROM w${k - 1}))
        |    GROUP BY 1, 2)
        |  ORDER BY c DESC, l, r LIMIT 1)""".stripMargin,
      s"""w$k AS MATERIALIZED (
        |  SELECT cnt, list_reduce(string_split(syms, ' '), (acc, x) ->
        |    CASE WHEN acc = l AND x = r THEN l || r
        |         WHEN ends_with(acc, ' ' || l) AND x = r
        |           THEN left(acc, len(acc) - len(l)) || l || r
        |         ELSE acc || ' ' || x END) AS syms
        |  FROM w${k - 1}, p$k)""".stripMargin)
    val sel = (1 to BpeRounds).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS merge_rank,
        |  (SELECT l FROM p$k) AS sym_left, (SELECT r FROM p$k) AS sym_right,
        |  CAST((SELECT c FROM p$k) AS BIGINT) AS pair_count""".stripMargin
    }.mkString("\nUNION ALL\n")
    "WITH " + (w0 +: (1 to BpeRounds).flatMap(round)).mkString(",\n") +
      "\n" + sel + "\nORDER BY merge_rank"
  }

  val all: Seq[Q] = Seq(
    Q("q50_token_stats", q50, Some(q50Sql)),
    Q("q51_lang_id", q51, Some(q51Sql)),
    Q("q52_quality_score", q52, Some(q52Sql)),
    Q("q53_fingerprint", q53, Some(q53Sql)),
    Q("q54_rolling_fingerprint", q54, Some(q54Sql)),
    Q("q75_tfidf_keywords", q75, Some(q75Sql)),
    Q("q77_repetition_filter", q77, Some(q77Sql)),
    Q("q91_bpe_tokens", q91, Some(q91Sql)),
    Q("q96_feature_hash", q96, Some(q96Sql)),
    Q("q99_token_novelty", q99, Some(q99Sql)),
    Q("q178_trending_terms", q178, Some(q178Sql)),
    Q("q109_vocab_encode", q109, Some(q109Sql)),
    Q("q226_entropy_gate", q226, Some(q226Sql)),
    Q("q116_corpus_profile", q116, Some(q116Sql)),
    Q("q181_freq_spectrum", q181, Some(q181Sql)),
    Q("q182_vocab_growth", q182, Some(q182Sql)),
    Q("q236_greedy_coverage", q236, Some(q236Sql)),
    Q("q238_text_segmentation", q238, Some(q238Sql)),
    Q("q256_repeat_span", q256, Some(q256Sql)),
    Q("q257_bpe_merges", q257, Some(q257Sql)),
    Q("q258_bpe_fertility", q258, Some(q258Sql)),
    Q("q283_bpe_encode", q283, Some(q283Sql)),
    Q("q285_tokenize_pack", q285, Some(q285Sql)),
    Q("q286_bpe_table_encode", q286, Some(q286Sql)),
  )
}
