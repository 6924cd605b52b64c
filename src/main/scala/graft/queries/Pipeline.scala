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
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m),
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
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
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

  /** q130 — the round-10 capstone: the document-REWRITE pipeline
    * composed end to end as one oracle-verified plan. Where q55/q90
    * select and q100/q110 mix and order, q130 EDITS: every document is
    * rewritten by segment-frequency boilerplate removal (q121) and
    * adjacent-repetition collapse (q124), the rewritten corpus is
    * scored by the hashed-bigram fluency model FIT ON THE REWRITTEN
    * `en` slice (q122 — clean first, then score, the CCNet order), and
    * the surviving documents are packed into length-grouped batches
    * (q125) sized by their REWRITTEN token counts. Output: per-batch
    * loader stats over the cleaned corpus.
    *
    * Scale shape inherits from its stages: segment fingerprints (not
    * text) shuffle for the hot-set; both rewrites and the per-doc
    * bigram bucketing run in-row; the fluency model is two ≤1024-row
    * broadcast aggregates; batching ranks through rankDistributed.
    * The rewritten token arrays are materialized ONCE behind a doc_id
    * exchange and every downstream stage (bigram explode, scoring,
    * batching) reads that frame — the corpus is scanned once.
    */
  private def q130(s: SparkSession, d: String): DataFrame = {
    import Cleanup.{SegLen, SegMinDf}
    import Fluency.{Buckets, FpScale, KeepMinFpMean}
    import Batching.{BandWidth, BatchDocs, FpScale => PadScale, PackSeed}
    val base = documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .withColumn("n", size(col("toks")))
      .localCheckpoint()
    // q121 stage: dropped-segment index set per doc
    val segs = base.filter(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(size(toks) + ${SegLen - 1}) div $SegLen").cast("long") - 1)).as("k"))
      .select(col("doc_id"), col("k"),
        hash60(concat_ws(" ", slice(col("toks"),
          (col("k") * SegLen + 1).cast("int"), lit(SegLen)))).as("h"))
      .localCheckpoint()
    val hot = segs.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SegMinDf).select(col("h"))
    val dks = segs.join(hot, Seq("h"))
      .groupBy(col("doc_id")).agg(collect_list(col("k")).as("dks"))
    // in-row rewrites: segment drop (ct), then repetition trim (tr)
    val rewritten = base.join(dks, Seq("doc_id"), "left")
      .withColumn("dks", coalesce(col("dks"), array().cast("array<bigint>")))
      .withColumn("ct", when(col("n") > 0, expr(
        s"""flatten(transform(
           |  filter(sequence(0L, (size(toks) + ${SegLen - 1}) div $SegLen - 1L),
           |    k -> NOT array_contains(dks, k)),
           |  k -> slice(toks, cast(k * $SegLen + 1 as int), $SegLen)))""".stripMargin))
        .otherwise(array().cast("array<string>")))
      .withColumn("tr", when(size(col("ct")) > 0, expr(
        """transform(
          |  filter(sequence(0, size(ct) - 1), i -> i = 0 OR ct[i] != ct[i - 1]),
          |  i -> ct[i])""".stripMargin))
        .otherwise(array().cast("array<string>")))
      .select(col("doc_id"), col("lang"), col("tr"))
      .repartition(col("doc_id")) // materialize tr before the Generate
    // q122 stage on the REWRITTEN corpus (b1 hashed per bigram here:
    // hoisting a per-token hash array would re-evaluate the heavy tr
    // rewrite inside the same projection — measured slower)
    def h60(e: String) = s"cast(conv(substr(md5($e), 1, 15), 16, 10) as bigint)"
    val bi = rewritten.filter(size(col("tr")) >= 2)
      .select(col("doc_id"), col("lang"), size(col("tr")).cast("long").as("nt"),
        explode(sequence(lit(0), size(col("tr")) - 2)).as("i"), col("tr"))
      .select(col("doc_id"), col("lang"), col("nt"),
        expr(s"pmod(${h60("tr[i]")}, ${Buckets}L)").as("b1"),
        expr(s"pmod(${h60("concat(tr[i], ' ', tr[i+1])")}, ${Buckets}L)").as("b2"))
      // three consumers (c2, c1, the scoring probe) — materialize the
      // compact (32 B/row) bucket frame or the rewrite Generates run 3×
      .localCheckpoint()
    val ref = bi.filter(col("lang") === "en")
    val c2 = ref.groupBy(col("b2")).agg(count(lit(1)).as("c2"))
    val c1 = ref.groupBy(col("b1")).agg(count(lit(1)).as("c1"))
    val surv = bi.join(broadcast(c2), Seq("b2"), "left")
      .join(broadcast(c1), Seq("b1"), "left")
      .select(col("doc_id"), col("nt"),
        expr(s"((coalesce(c2, 0L) + 1L) * $FpScale) div (coalesce(c1, 0L) + $Buckets)")
          .as("fp"))
      .groupBy(col("doc_id"))
      .agg(max(col("nt")).as("n_toks"), count(lit(1)).as("n_bigrams"),
        sum(col("fp")).as("fp_sum"))
      .filter(expr("fp_sum div n_bigrams") >= KeepMinFpMean)
      .select(col("doc_id"), col("n_toks"))
    // q125 stage over the survivors, sized by REWRITTEN length
    val sized = surv
      .withColumn("band", expr(s"n_toks div $BandWidth"))
      .withColumn("draw", hash60(concat(lit(PackSeed), col("doc_id").cast("string"))))
    Sampling.rankDistributed(sized, Seq("band"), Seq(col("draw"), col("doc_id")))
      .withColumn("batch_idx", expr(s"(rk - 1L) div $BatchDocs"))
      .groupBy(col("band"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_toks")).as("max_len"),
        sum(col("n_toks")).as("sum_len"))
      .withColumn("pad_fp", expr(
        s"((n_docs * max_len - sum_len) * $PadScale) div (n_docs * max_len)"))
      .orderBy(col("band"), col("batch_idx"))
  }

  private val q130Sql = {
    import Cleanup.{SegLen, SegMinDf}
    import Fluency.{Buckets, FpScale, KeepMinFpMean}
    import Batching.{BandWidth, BatchDocs, FpScale => PadScale, PackSeed}
    val slice = s"list_slice(toks, k*$SegLen+1, k*$SegLen+$SegLen)"
    val draw = hash60Sql(s"'$PackSeed' || CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
      |  SELECT doc_id, lang, regexp_extract_all(lower(text), '$TokenPattern') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, k, ${hash60Sql(s"array_to_string($slice, ' ')")} AS h
      |  FROM (SELECT doc_id, toks,
      |          unnest(range((len(toks) + ${SegLen - 1}) // $SegLen)) AS k
      |        FROM t)),
      |hot AS (SELECT h FROM s GROUP BY h
      |        HAVING count(DISTINCT doc_id) >= $SegMinDf),
      |dk AS (SELECT doc_id, list(k) AS dks FROM s
      |       WHERE h IN (SELECT h FROM hot) GROUP BY doc_id),
      |ctt AS (
      |  SELECT t.doc_id, lang, flatten(list_transform(
      |    list_filter(range((len(toks) + ${SegLen - 1}) // $SegLen),
      |      k -> NOT list_contains(coalesce(dks, []), k)),
      |    k -> $slice)) AS ct
      |  FROM t LEFT JOIN dk USING (doc_id)),
      |trt AS (
      |  SELECT doc_id, lang, list_transform(
      |    list_filter(range(1, len(ct) + 1), i -> i = 1 OR ct[i] <> ct[i-1]),
      |    i -> ct[i]) AS tr
      |  FROM ctt),
      |bi AS (
      |  SELECT doc_id, lang, len(tr) AS nt,
      |    ${hash60Sql("tr[i+1]")} % $Buckets AS b1,
      |    ${hash60Sql("tr[i+1] || ' ' || tr[i+2]")} % $Buckets AS b2
      |  FROM (SELECT doc_id, lang, tr, unnest(range(len(tr) - 1)) AS i FROM trt)),
      |c2 AS (SELECT b2, count(*) AS c FROM bi WHERE lang = 'en' GROUP BY b2),
      |c1 AS (SELECT b1, count(*) AS c FROM bi WHERE lang = 'en' GROUP BY b1),
      |sc AS (
      |  SELECT doc_id, max(nt) AS n_toks, count(*) AS n_bigrams,
      |    SUM((coalesce(c2.c, 0) + 1) * $FpScale
      |        // (coalesce(c1.c, 0) + $Buckets)) AS fp_sum
      |  FROM bi LEFT JOIN c2 USING (b2) LEFT JOIN c1 USING (b1)
      |  GROUP BY doc_id),
      |surv AS (SELECT doc_id, n_toks FROM sc
      |         WHERE fp_sum // n_bigrams >= $KeepMinFpMean),
      |r AS (
      |  SELECT doc_id, n_toks, n_toks // $BandWidth AS band,
      |    row_number() OVER (PARTITION BY n_toks // $BandWidth
      |      ORDER BY $draw, doc_id) AS rk
      |  FROM surv),
      |b AS (
      |  SELECT band, (rk - 1) // $BatchDocs AS batch_idx,
      |    count(*) AS n_docs, max(n_toks) AS max_len, sum(n_toks) AS sum_len
      |  FROM r GROUP BY band, (rk - 1) // $BatchDocs)
      |SELECT CAST(band AS BIGINT) AS band, CAST(batch_idx AS BIGINT) AS batch_idx,
      |  CAST(n_docs AS BIGINT) AS n_docs, CAST(max_len AS BIGINT) AS max_len,
      |  CAST(sum_len AS BIGINT) AS sum_len,
      |  CAST(((n_docs * max_len - sum_len) * $PadScale) // (n_docs * max_len)
      |    AS BIGINT) AS pad_fp
      |FROM b
      |ORDER BY band, batch_idx""".stripMargin
  }

  // q282 — the round-14 capstone: the LEARNED curation pipeline as one
  // oracle-verified plan, upgrading both halves of q90 (fixed gates +
  // naive split) with this round's learned machinery:
  //
  //   1. learned mixture thinning — q278's DoReMi weights applied as
  //      q280's deterministic hash resample (unknown domains kept);
  //   2. near-dup clustering of the SURVIVORS — the LSH pair pipeline +
  //      connected components run on the thinned corpus (thinning first
  //      shrinks the quadratic-ish pair surface, the order a production
  //      pass uses);
  //   3. leakage-safe split — q279's cluster-keyed assignment over the
  //      survivor clusters;
  //
  // reporting the end state per (split, source) cell: doc/cluster/char
  // counts and the cell's share of its split (scale 2^20) — which
  // should read roughly equal across splits (hash uniformity) and
  // roughly alpha across sources (the learned mix), making the capstone
  // its own sanity check. Cells are data-driven (no spine: an empty
  // (split, source) cell is absent in both engines).
  //
  // Scale shape: the mixture collapse + D-row keep probabilities are
  // bounded prior jobs; the thinned corpus re-derives by narrow ops
  // (scan + broadcast join + hash filter — recomputation is cheaper
  // than materializing corpus text); pairs/components run only on
  // survivors; the report aggregate is one combinable shuffle keyed by
  // (split, source).
  private def q282(s: SparkSession, d: String): DataFrame =
    learnedCurationOf(documents(s, d))

  /** The q282 plan over any (doc_id, lang, source, text, n_chars)
    * frame — public for fixture specs.
    */
  def learnedCurationOf(docs: DataFrame): DataFrame = {
    val S = Fluency.FpScale
    val probs = Mixture.keepProbsOf(Mixture.mixtureOf(docs)).localCheckpoint()
    val kept = docs
      .join(broadcast(probs), Seq("source"), "left")
      .withColumn("p_keep_fp", coalesce(col("p_keep_fp"), lit(S)))
      .filter(Mixture.keptCol === 1L)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
    val pairs = Dedup.candidatePairsFrom(kept)
      .select(col("doc_a"), col("doc_b")).localCheckpoint()
    val comp = graft.ops.ConnectedComponents
      .minLabel(pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("id").as("doc_id"), col("comp"))
    val cell = kept.select(col("doc_id"), col("source"), col("n_chars"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("source"), col("n_chars"),
        coalesce(col("comp"), col("doc_id")).as("cluster_id"))
      .withColumn("split", Splits.splitOf(col("cluster_id")))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("n_chars")).as("n_chars"))
      // <= 3 x |domains| rows; pin so the split totals reuse it
      .localCheckpoint()
    val tot = cell.groupBy(col("split")).agg(sum(col("n_docs")).as("td"))
    cell.join(broadcast(tot), "split")
      .select(col("split"), col("source"), col("n_docs"), col("n_clusters"),
        col("n_chars"),
        // DECIMAL(38,0)-staged: n_docs * S overflows Long past
        // ~8.8e12 docs per split cell (same bound keepProbsOf defends)
        expr(s"CAST(CAST(n_docs AS DECIMAL(38,0)) * ${S}L div td" +
          " AS BIGINT)").as("cell_share_fp"))
      .orderBy(col("split"), col("source"))
  }

  private lazy val q282Sql = {
    val S = Fluency.FpScale
    s"""WITH RECURSIVE ${Mixture.keepProbCtesSql},
      |kept AS MATERIALIZED (
      |  SELECT d.doc_id, d.source, d.text, d.n_chars
      |  FROM documents d LEFT JOIN pk USING (source)
      |  WHERE ${Mixture.keptSql} = 1),
      |${Dedup.pairsCteSqlFrom("kept")},
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (
      |  SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
      |cell AS (
      |  SELECT ${Splits.splitSql("coalesce(c.cluster_id, k.doc_id)")} AS split,
      |    k.source, count(*) AS n_docs,
      |    count(DISTINCT coalesce(c.cluster_id, k.doc_id)) AS n_clusters,
      |    sum(k.n_chars) AS n_chars
      |  FROM kept k LEFT JOIN comp c USING (doc_id)
      |  GROUP BY 1, 2),
      |stot AS (SELECT split, sum(n_docs) AS td FROM cell GROUP BY 1)
      |SELECT split, source, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_clusters AS BIGINT) AS n_clusters,
      |  CAST(n_chars AS BIGINT) AS n_chars,
      |  CAST(CAST(n_docs AS HUGEINT) * $S // td AS BIGINT) AS cell_share_fp
      |FROM cell JOIN stot USING (split)
      |ORDER BY split, source""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q55_training_pipeline", q55, Some(q55Sql)),
    Q("q90_curation_pipeline", q90, Some(q90Sql)),
    Q("q100_mixing_pipeline", q100, Some(q100Sql)),
    Q("q110_loader_order", q110, Some(q110Sql)),
    Q("q130_cleanup_capstone", q130, Some(q130Sql)),
    Q("q282_learned_curation", q282, Some(q282Sql)),
  )
}
