package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Deduplication operators over `documents` — the workhorse stage of a
  * training-data pipeline at 100 TB:
  *
  *  - exact dedup: hash-groupBy on the raw text (one shuffle on the
  *    64-bit fingerprint, never on the full text — at scale the text
  *    column stays columnar and only the 8-byte hash shuffles);
  *  - normalized dedup: same, after lowercase/strip/collapse;
  *  - MinHash + LSH: word-shingle signatures, banded into buckets so
  *    candidate generation is a groupBy on (band, bandKey) — NO O(n²)
  *    cross join ever materializes. Costs: one scan to build
  *    signatures, one shuffle of (band,key,doc) pairs, one shuffle to
  *    pair within buckets. This is the standard scale-out architecture
  *    (same shape as Spark MLlib's MinHashLSH, reimplemented with
  *    portable arithmetic so DuckDB can verify it bit-for-bit);
  *  - n-gram Jaccard verification on the candidate pairs (exact
  *    similarity only for pairs that share a band — the LSH prefilter
  *    bounds the quadratic term by bucket size).
  *
  * MinHash math (portable across engines): token 3-shingles hashed with
  * the md5-derived 60-bit hash ([[graft.functions.TextFns.hash60]]),
  * reduced mod p = 2^31-1; permutation j is
  * h_j(x) = ((2j+1)·x + 12345j + 6789) mod p, so every product stays
  * < 2^62 and the whole signature is exact 64-bit integer arithmetic in
  * both Spark and DuckDB. ssp has no dedup operator of any kind
  * (SURVEY.md §2.2) — this is part of the beyond-reference surface.
  */
object Dedup {

  val P: Long = 2147483647L // 2^31 - 1
  val NumHashes = 32
  val Bands = 8 // 4 rows per band

  /** LSH buckets larger than this are triangle-split across tasks. */
  val HotBucketThreshold = 256
  /** Row-group fan-out for triangle-split hot LSH buckets. */
  val TriangleSplit = 8
  /** Target pair count per task for adaptively-split dense blocks
    * (q33): per-task work ≈ pairsPerTask × per-pair intersect cost
    * (~µs each — a task lands in the hundreds of ms, fine-grained
    * enough to saturate executors even when few blocks exist).
    */
  val PairsPerTask: Long = 1L << 16

  // q30 — exact dedup: representative (min doc_id) + cardinality per
  // distinct text, via the 60-bit fingerprint so the shuffle key is 8
  // bytes. Collision probability at 10^12 docs ~ 4e-7 (birthday, 60
  // bits); production path would carry a 128-bit hash.
  private def q30(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupBy(hash60(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id"))

  private val q30Sql =
    s"""SELECT ${hash60Sql("text")} AS fingerprint,
      |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY keep_doc_id""".stripMargin

  // q31 — normalized dedup + survivor rate per (lang, source) cell.
  private def q31(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("fp", hash60(normalize(col("text"))))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_unique"))
      .orderBy(col("lang"), col("source"))

  private val q31Sql =
    s"""SELECT lang, source, count(*) AS n_docs,
      |  count(DISTINCT ${hash60Sql(normalizeSql("text"))}) AS n_unique
      |FROM documents
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  /** Column: list of word 3-shingle hashes (mod p) from a token-array
    * column, via the codegen NGramHash60 expression (one compiled md5
    * loop per row; the earlier interpreted-HOF form re-dispatched the
    * expression tree per element).
    */
  private[queries] def shingleHashes(toks: Column): Column =
    call_function("ngram_hash60", toks, lit(3), lit(P))

  private[queries] val shingleHashesSql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""list_transform(
       |    list_transform(range(greatest(len($toks) - 2, 0)),
       |      i -> $toks[i+1] || ' ' || $toks[i+2] || ' ' || $toks[i+3]),
       |    sh -> ${hash60Sql("sh")} % $P)""".stripMargin
  }

  private val signatureSql =
    s"""list_transform(range(${NumHashes}),
       |    j -> coalesce(list_min(list_transform(shashes,
       |      x -> ((2*j+1)*x + 12345*j + 6789) % $P)), $P))""".stripMargin

  // MinHash LSH candidate pairs: signatures → Bands bands of 4 →
  // explode (band, bandKey=4 sig values) → groupBy bucket → pairs, with
  // the estimated Jaccard (matching signature fraction) per pair.
  // Shared by q32 (the pair list) and q35 (clusters over the pairs).
  private[queries] def candidatePairs(s: SparkSession, d: String): DataFrame =
    candidatePairsFrom(documents(s, d))

  /** The LSH pair pipeline over any (doc_id, text, ...) frame —
    * split out so specs can feed adversarial corpora (e.g. thousands of
    * identical documents) through the exact production path.
    */
  /** (doc_id, sig, band, bkey) banded MinHash signatures for any
    * (doc_id, text, ...) frame — the shared front half of batch LSH
    * (below) and streaming LSH
    * (graft.streaming.StatefulStreams.streamingNearDupPairs): all
    * narrow deterministic ops, so it runs identically over a streaming
    * DataFrame.
    */
  private[graft] def bandedSignatures(documentsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documentsDf.sparkSession)
    // Tokenize on the scan, then repartition BEFORE the heavy per-doc
    // signature math: the testdata is one small parquet file (one input
    // partition), and at 100 TB the same exchange is what balances
    // skewed document sizes across executors. The signature itself is
    // the codegen'd MinHashSig expression (the interpreted HOF version
    // cost 29 s at sf0.1; this is ~ms).
    val toksDf = documentsDf
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // Shingle-eligibility gate: a doc with fewer than 3 tokens (or
      // NULL text) produces ZERO shingles, and minhash over an empty
      // shingle set is the all-P sentinel — every such doc would share
      // one signature and pair at est_jaccard 1.0 with zero content
      // evidence, and at 100 TB millions of null/short rows would pile
      // into one quadratic bucket. Too-short docs are out of scope for
      // shingle-granularity LSH by definition (exact dedup q30 owns
      // them); the same WHERE lives in the DuckDB pairs CTE, and the
      // streaming twin inherits this gate (null arrivals cannot poison
      // bucket state). Pinned by NullRobustnessSpec; no testdata doc is
      // affected (min tokens/doc = 10 at every SF).
      .filter(size(col("toks")) >= 3)
      .repartition(col("doc_id"))
    val docs = toksDf
      .select(col("doc_id"), shingleHashes(col("toks")).as("shashes"))
      .select(col("doc_id"), expr("minhash_sig(shashes)").as("sig"))
    val rows = NumHashes / Bands
    docs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(Bands - 1)), b =>
        struct(b.as("band"),
          concat_ws(",", transform(slice(col("sig"), b * rows + 1, lit(rows)),
            _.cast("string"))).as("bkey")))).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bkey"))
  }

  private[graft] def candidatePairsFrom(documentsDf: DataFrame): DataFrame = {
    val banded = bandedSignatures(documentsDf)
    // Hot-bucket insurance: a degenerate band key (e.g. a duplicate-
    // heavy corpus where thousands of docs share one signature) makes a
    // bucket's pair generation quadratic ON ONE TASK. The pair OUTPUT
    // is inherently C(m,2) — but the work can be spread: buckets above
    // HotBucketThreshold get triangle-split (ops/SelfJoins) over
    // TriangleSplit row-groups, while cold buckets (the common case —
    // LSH buckets are near-unique by construction) keep replication 1
    // and degenerate to the plain single-block self-join. The
    // hot-bucket list is a map-side-combined count — never skewed —
    // and broadcast (tiny: only buckets over the threshold; costs one
    // extra corpus scan, cheaper at scale than the extra shuffle a
    // count-window would need).
    val hot = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > HotBucketThreshold)
      .select(col("band"), col("bkey"), lit(true).as("__hot"))
    val graded = banded.join(broadcast(hot), Seq("band", "bkey"), "left")
    graft.ops.SelfJoins
      .pairsWithinBlocks(graded, Seq("band", "bkey"), "doc_id",
        when(col("__hot"), lit(TriangleSplit)).otherwise(lit(1)))
      .select(least(col("doc_id_l"), col("doc_id_r")).as("doc_a"),
        greatest(col("doc_id_l"), col("doc_id_r")).as("doc_b"),
        (size(filter(zip_with(col("sig_l"), col("sig_r"), (x, y) => x === y),
          v => v)).cast("double") / NumHashes).as("est_jaccard"))
      .distinct()
  }

  private def q32(s: SparkSession, d: String): DataFrame =
    candidatePairs(s, d).orderBy(col("doc_a"), col("doc_b"))

  /** DuckDB CTE list producing `pairs(doc_a, doc_b, est_jaccard)` over
    * an arbitrary (doc_id, text) relation — shared by the q32/q35
    * oracles (over `documents`) and subset consumers (q282's kept set).
    */
  private[queries] def pairsCteSqlFrom(tbl: String): String = {
    val rows = NumHashes / Bands
    s"""sigs AS (
      |  SELECT doc_id, $signatureSql AS sig
      |  FROM (SELECT doc_id, $shingleHashesSql AS shashes FROM $tbl
      |        WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3) t),
      |banded AS (
      |  SELECT doc_id, sig, b.band AS band,
      |    array_to_string(sig[b.band*$rows+1 : b.band*$rows+$rows], ',') AS bkey
      |  FROM sigs, (SELECT unnest(range($Bands)) AS band) b),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(len(list_filter(list_transform(range($NumHashes),
      |      i -> a.sig[i+1] = b.sig[i+1]), x -> x)) AS DOUBLE) / $NumHashes AS est_jaccard
      |  FROM banded a JOIN banded b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** The canonical instance over `documents`. */
  private[queries] val pairsCteSql = pairsCteSqlFrom("documents")

  private val q32Sql =
    s"""WITH $pairsCteSql
      |SELECT doc_a, doc_b, est_jaccard FROM pairs
      |ORDER BY doc_a, doc_b""".stripMargin

  // q35 — duplicate clusters: connected components over the LSH
  // candidate pairs (graft.ops.ConnectedComponents min-label
  // propagation); cluster id = min doc_id in the component — i.e. the
  // representative a dedup pipeline keeps. Oracle: recursive-CTE
  // transitive closure over the same pairs.
  private def q35(s: SparkSession, d: String): DataFrame = {
    val edges = candidatePairs(s, d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = graft.ops.ConnectedComponents.minLabel(edges)
    comp
      .withColumn("cluster_size", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("comp"))))
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }

  private val q35Sql =
    s"""WITH RECURSIVE $pairsCteSql,
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
      |SELECT doc_id, cluster_id,
      |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
      |FROM comp
      |ORDER BY doc_id""".stripMargin

  // q93 — representative selection: dedup's KEEP decision. For each
  // duplicate cluster (q35's connected components over the LSH pairs),
  // keep the highest-quality member — type-token ratio × length gate,
  // the q52 quality core — tie-broken to the smallest doc_id, and
  // report the cluster size (how much a dedup pass would drop).
  //
  // Scale shape: the component frame holds only docs that appear in a
  // candidate pair (orders of magnitude smaller than the corpus at
  // real dup rates), the quality features are one corpus scan, and the
  // keep decision is a hash aggregate (max_by over a tie-free ordering
  // struct) — one shuffle keyed by cluster_id, no sort-window over the
  // corpus.
  private def q93(s: SparkSession, d: String): DataFrame = {
    val edges = candidatePairs(s, d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = graft.ops.ConnectedComponents.minLabel(edges)
      .select(col("id").as("doc_id"), col("comp").as("cluster_id"))
    val qual = documents(s, d)
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .select(col("doc_id"),
        ((col("n_distinct").cast("double") / greatest(col("n_toks"), lit(1L))) *
          when(col("n_toks") >= 20 && col("n_toks") <= 1000, 1.0).otherwise(0.0))
          .as("quality"))
    comp.join(qual, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        max_by(struct(col("doc_id"), col("quality")),
          struct(col("quality"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("cluster_id"), col("best.doc_id").as("kept_doc"),
        col("best.quality").as("kept_quality"), col("cluster_size"))
      .orderBy(col("cluster_id"))
  }

  private val q93Sql =
    s"""WITH RECURSIVE $pairsCteSql,
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
      |qual AS (SELECT doc_id,
      |    CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1) *
      |      (CASE WHEN len(toks) >= 20 AND len(toks) <= 1000 THEN 1.0 ELSE 0.0 END)
      |      AS quality
      |  FROM (SELECT doc_id,
      |      regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
      |    FROM documents) t),
      |m AS (SELECT c.cluster_id, c.doc_id, q.quality,
      |    row_number() OVER (PARTITION BY c.cluster_id
      |      ORDER BY q.quality DESC, c.doc_id) AS rn,
      |    count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
      |  FROM comp c JOIN qual q USING (doc_id))
      |SELECT cluster_id, doc_id AS kept_doc, quality AS kept_quality, cluster_size
      |FROM m WHERE rn = 1
      |ORDER BY cluster_id""".stripMargin

  /** Sorted distinct word-bigram 60-bit hashes of a token array — the
    * exact-verify gram set shared by q33 (Jaccard) and q88
    * (containment); sorted so the pairwise intersect is one codegen'd
    * merge pass (SortedIntersectCount).
    */
  private def gramSet(toks: Column): Column =
    array_sort(array_distinct(call_function("ngram_hash60", toks, lit(2), lit(0L))))

  private val gramSetSql =
    s"""list_sort(list_distinct(list_transform(range(greatest(len(toks) - 1, 0)),
       |      i -> ${hash60Sql("toks[i+1] || ' ' || toks[i+2]")})))""".stripMargin

  // q33 — exact n-gram (word bigram) Jaccard similarity, restricted to
  // blocked candidate pairs (same lang, adjacent length bucket) so the
  // quadratic term stays bounded at scale; emits pairs above 0.2.
  private def q33(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // Gram sets are SORTED DISTINCT 60-bit hashes, so the pairwise
    // Jaccard verify is one codegen'd merge pass per pair
    // (SortedIntersectCount) instead of interpreted string-set
    // intersection (99 s -> ~1 s at sf0.1). |A∪B| = |A|+|B|−|A∩B|.
    val toksDf = documents(s, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
    val docs = toksDf.select(col("doc_id"), col("lang"),
      floor(size(col("toks")) / 50L).cast("long").as("lbucket"),
      gramSet(col("toks")).as("grams"))
    // The blocked self-join has only O(#langs × #buckets) distinct keys
    // and EVERY block is dense (all-pairs is the semantic), so a plain
    // shuffle puts each block's C(m,2) pairs on one task, and a
    // broadcast of one side ships the whole corpus's gram sets to every
    // executor — O(corpus) memory, the 100 TB failure mode. The
    // triangle decomposition (ops/SelfJoins) spreads each block over
    // R(R+1)/2 tasks at (R+1)/2× replication — the √ lower bound for
    // distributing an all-pairs join, and the balance that matters:
    // the intersect work dominates this query, so wall time tracks the
    // largest per-task pair count, (m/R)². R is sized PER BLOCK from an
    // exact count prepass (R = ceil(m/√pairsPerTask)): a fixed factor
    // over-replicates small blocks and under-splits big ones as block
    // sizes vary with the corpus.
    graft.ops.SelfJoins
      .adaptivePairsWithinBlocks(docs, Seq("lang", "lbucket"), "doc_id",
        pairsPerTask = PairsPerTask)
      .select(least(col("doc_id_l"), col("doc_id_r")).as("doc_a"),
        greatest(col("doc_id_l"), col("doc_id_r")).as("doc_b"),
        col("grams_l").as("ga"), col("grams_r").as("gb"))
      .withColumn("inter", expr("sorted_intersect_count(ga, gb)"))
      .withColumn("jaccard",
        col("inter").cast("double") / (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") > 0.2)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q33Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH docs AS (
      |  SELECT doc_id, lang, len(toks) // 50 AS lbucket,
      |    $gramSetSql AS grams
      |  FROM (SELECT doc_id, lang, $toks AS toks FROM documents) t),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    len(list_intersect(a.grams, b.grams)) AS inter,
      |    len(a.grams) AS na, len(b.grams) AS nb
      |  FROM docs a JOIN docs b
      |    ON a.lang = b.lang AND a.lbucket = b.lbucket AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
      |FROM pairs
      |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) > 0.2
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  // q36 — SimHash near-dup pairs: 60-bit majority-vote signature per
  // doc (codegen'd SimHash60 over the token hashes), candidates via
  // pigeonhole banding (4 chunks of 15 bits: hamming <= 3 implies at
  // least one equal chunk), verified by exact hamming distance.
  private def q36(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val toksDf = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      // token-free docs (empty/NULL/punctuation-only text) all simhash
      // to sig 0 and would pair mutually at hamming 0 with zero content
      // evidence — the same degenerate class the MinHash shingle gate
      // excludes (NullRobustnessSpec); no testdata doc is affected
      .filter(size(col("toks")) >= 1)
      .repartition(col("doc_id"))
    val sigs = toksDf
      .select(col("doc_id"),
        transform(col("toks"), t => hash60(t)).as("hs"))
      .select(col("doc_id"), expr("simhash60(hs)").as("sig"))
    val banded = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"),
          pmod(shiftright(col("sig"), 15 * c), lit(32768L)).as("chunk"))): _*)).as("x"))
      .select(col("doc_id"), col("sig"), col("x.c"), col("x.chunk"))
    val a = banded.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"), col("c"), col("chunk"))
    val b = banded.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"), col("c"), col("chunk"))
    // Same scale rule as q33: never broadcast a corpus-sized side. The
    // (c, chunk) key space is 4×2^15 — wide enough for a plain shuffle
    // in the typical case — but degenerate chunks (e.g. every empty doc
    // hashes to sig 0) concentrate; the salt spreads any such hot chunk
    // over 8 tasks at 8× replication of the 16-byte banded rows.
    graft.ops.SkewedJoins.saltedEquiJoinUsing(a, b, Seq("c", "chunk"), saltFactor = 8)
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sig_a ^ sig_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q36Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val simhash =
      s"""list_reduce(list_transform(range(60), bit ->
         |      CASE WHEN list_sum(list_transform(hs,
         |        h -> CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |      THEN 1::BIGINT << bit ELSE 0::BIGINT END), (a, b) -> a + b)""".stripMargin
    s"""WITH sigs AS (
      |  SELECT doc_id, $simhash AS sig
      |  FROM (SELECT doc_id, list_transform($toks, t -> ${hash60Sql("t")}) AS hs
      |        FROM documents WHERE len($toks) >= 1) t),
      |banded AS (
      |  SELECT doc_id, sig, cc.c AS c, (sig >> (15 * cc.c)) & 32767 AS chunk
      |  FROM sigs, (SELECT unnest(range(4)) AS c) cc)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
      |FROM banded a JOIN banded b
      |  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.sig, b.sig)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** q86 — winnowing-style shared-substring near-dup: every 32-char
    * window of the normalized text is Rabin–Karp-hashed (the codegen
    * rolling_hashes expression, O(1)/shift), CONTENT-DEFINED sampled
    * (keep h % 16 == 0 — both docs of a shared substring select the
    * same windows, no alignment needed), and pairs sharing ≥ 2 sampled
    * fingerprints emit with their shared count. This catches verbatim
    * COPIED PASSAGES between otherwise-different documents — the case
    * MinHash (whole-doc similarity, q32) dilutes away.
    *
    * Scale shape: one corpus scan; the shuffle carries ~n_chars/16
    * 8-byte fingerprints per doc, not text; pair generation is the
    * same hot-bucket-insured blocked self-join as q32 (a boilerplate
    * substring shared by thousands of docs triangle-splits instead of
    * pinning one task).
    */
  val SubstrWindow = 32
  val SubstrSample = 16
  val SubstrMinShared = 2

  private def q86(s: SparkSession, d: String): DataFrame =
    substringNearDupPairs(documents(s, d))

  /** The q86 pipeline over any (doc_id, text, ...) frame — split out so
    * specs can plant verbatim copied passages and drive the exact
    * production path.
    */
  /** (doc_id, h) content-defined sampled window fingerprints — the
    * shared front half of batch q86 and the streaming form
    * (graft.streaming.StatefulStreams.streamingSubstringPairs): all
    * narrow deterministic ops, so it runs identically over a streaming
    * DataFrame.
    */
  private[graft] def substringFingerprints(documentsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documentsDf.sparkSession)
    documentsDf
      .select(col("doc_id"), normalize(col("text")).as("norm"))
      .select(col("doc_id"), explode(array_distinct(
        filter(expr(s"rolling_hashes(norm, $SubstrWindow)"),
          h => h % SubstrSample === 0))).as("h"))
  }

  private[graft] def substringNearDupPairs(documentsDf: DataFrame): DataFrame = {
    val fps = substringFingerprints(
      documentsDf.repartition(col("doc_id")))
    val hot = fps.groupBy(col("h"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > HotBucketThreshold)
      .select(col("h"), lit(true).as("__hot"))
    val graded = fps.join(broadcast(hot), Seq("h"), "left")
    graft.ops.SelfJoins
      .pairsWithinBlocks(graded, Seq("h"), "doc_id",
        when(col("__hot"), lit(TriangleSplit)).otherwise(lit(1)))
      .select(least(col("doc_id_l"), col("doc_id_r")).as("doc_a"),
        greatest(col("doc_id_l"), col("doc_id_r")).as("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= SubstrMinShared)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** DuckDB CTE list producing `wpairs(doc_a, doc_b, n_shared)` — the
    * winnow candidate pairs, shared by the q86 and q88 oracles.
    */
  private[queries] val winnowPairsCteSql = {
    val norm = normalizeSql("text")
    s"""wn AS (SELECT doc_id, $norm AS norm FROM documents),
      |wrh AS (SELECT doc_id,
      |  ${graft.functions.TextFns.rollingHashesSql("norm", SubstrWindow)} AS rh
      |  FROM wn),
      |wfp AS (SELECT DISTINCT doc_id, h
      |  FROM (SELECT doc_id, unnest(rh) AS h FROM wrh)
      |  WHERE h % $SubstrSample = 0),
      |wpairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      |  FROM wfp a JOIN wfp b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin
  }

  private val q86Sql =
    s"""WITH $winnowPairsCteSql
      |SELECT doc_a, doc_b, n_shared FROM wpairs
      |WHERE n_shared >= $SubstrMinShared
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q88 — containment verify: for each winnow candidate pair, the
    * exact bigram-set containment in BOTH directions
    * (|A∩B|/|A|, |A∩B|/|B|) — the superset-dedup primitive. A short
    * doc pasted inside a long one has near-1.0 containment on the
    * short side but LOW Jaccard, so q33's symmetric verify never
    * surfaces it; the winnow candidates (content-defined window
    * fingerprints) find such pairs regardless of the length ratio,
    * where MinHash-LSH banding also would not.
    *
    * Scale shape: the expensive exact gram sets are built ONLY for
    * documents appearing in a candidate pair — the pair set is
    * materialized once (localCheckpoint; it is orders of magnitude
    * smaller than the corpus) and its doc_ids broadcast-semi-join the
    * corpus scan, so the verify stage touches candidate docs, never
    * the full corpus. The containments themselves are one codegen
    * merge-intersect per pair and two exact-integer divisions
    * (bit-identical cross-engine).
    */
  val ContainmentThreshold = 0.5

  private def q88(s: SparkSession, d: String): DataFrame =
    containmentPairs(documents(s, d))

  private[graft] def containmentPairs(documentsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(documentsDf.sparkSession)
    val cand = substringNearDupPairs(documentsDf)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    // Candidate-doc gram sets are also materialized: they are reused
    // across both join sides, and the interpreted gram transform would
    // otherwise be re-inlined (and re-evaluated) at every downstream
    // reference after project collapse.
    val grams = documentsDf
      .join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"), gramSet(col("toks")).as("grams"))
      .localCheckpoint(true)
    cand
      .join(grams.select(col("doc_id").as("doc_a"), col("grams").as("ga")), Seq("doc_a"))
      .join(grams.select(col("doc_id").as("doc_b"), col("grams").as("gb")), Seq("doc_b"))
      .filter(size(col("ga")) > 0 && size(col("gb")) > 0)
      .withColumn("inter", expr("sorted_intersect_count(ga, gb)"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / size(col("ga"))).as("cont_a"),
        (col("inter").cast("double") / size(col("gb"))).as("cont_b"))
      .filter(greatest(col("cont_a"), col("cont_b")) >= ContainmentThreshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  private val q88Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    s"""WITH $winnowPairsCteSql,
      |g AS (SELECT doc_id, $gramSetSql AS grams
      |  FROM (SELECT doc_id, $toks AS toks FROM documents) t),
      |j AS (SELECT p.doc_a, p.doc_b,
      |    len(list_intersect(a.grams, b.grams)) AS inter,
      |    len(a.grams) AS na, len(b.grams) AS nb
      |  FROM (SELECT doc_a, doc_b FROM wpairs WHERE n_shared >= $SubstrMinShared) p
      |  JOIN g a ON p.doc_a = a.doc_id
      |  JOIN g b ON p.doc_b = b.doc_id
      |  WHERE len(a.grams) > 0 AND len(b.grams) > 0)
      |SELECT doc_a, doc_b,
      |  CAST(inter AS DOUBLE) / na AS cont_a,
      |  CAST(inter AS DOUBLE) / nb AS cont_b
      |FROM j
      |WHERE greatest(CAST(inter AS DOUBLE) / na, CAST(inter AS DOUBLE) / nb)
      |  >= $ContainmentThreshold
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  // q128 — dup-cluster size histogram: the dedup REPORT every pipeline
  // prints before committing a pass (how much mass sits in clusters of
  // each size, and how many docs a keep-one-per-cluster pass drops).
  // Size-1 clusters (docs in no candidate pair) are counted
  // arithmetically from the corpus total — never materialized as rows,
  // so the histogram costs the q35 component pass plus a
  // histogram-sized aggregate.
  private def q128(s: SparkSession, d: String): DataFrame = {
    val edges = candidatePairs(s, d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = graft.ops.ConnectedComponents.minLabel(edges)
    val hist = comp.groupBy(col("comp"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("total"))
    val inComp = comp.agg(count(lit(1)).as("paired"))
    val singles = nDocs.crossJoin(inComp)
      .select(lit(1L).as("cluster_size"),
        (col("total") - col("paired")).as("n_clusters"),
        (col("total") - col("paired")).as("n_docs"))
    singles.unionByName(hist)
      .withColumn("dropped_by_dedup", col("n_docs") - col("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  private val q128Sql =
    s"""WITH RECURSIVE $pairsCteSql,
      |pairs_m AS MATERIALIZED (SELECT doc_a, doc_b FROM pairs),
      |undirected(a, b) AS MATERIALIZED (
      |  SELECT doc_a, doc_b FROM pairs_m UNION SELECT doc_b, doc_a FROM pairs_m
      |  UNION SELECT doc_a, doc_a FROM pairs_m UNION SELECT doc_b, doc_b FROM pairs_m),
      |reach(a, b) AS (
      |  SELECT a, b FROM undirected
      |  UNION
      |  SELECT r.a, u.b FROM reach r JOIN undirected u ON r.b = u.a),
      |comp AS MATERIALIZED (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),
      |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM comp
      |       GROUP BY cluster_id),
      |hist AS (SELECT cluster_size, count(*) AS n_clusters,
      |           cluster_size * count(*) AS n_docs
      |         FROM cs GROUP BY cluster_size),
      |singles AS (
      |  SELECT CAST(1 AS BIGINT) AS cluster_size,
      |    (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp)
      |      AS n_clusters,
      |    (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp)
      |      AS n_docs)
      |SELECT cluster_size, n_clusters, n_docs,
      |  n_docs - n_clusters AS dropped_by_dedup
      |FROM (SELECT * FROM singles UNION ALL SELECT * FROM hist) t
      |ORDER BY cluster_size""".stripMargin

  // q141 — INCREMENTAL LSH index maintenance: the nightly-snapshot
  // form of q32. A persisted corpus index holds banded signatures for
  // every already-ingested document; a new batch arrives (modeled as
  // doc_id % 10 == 0) and must be checked for near-duplicates against
  // the index AND within itself — but the index is NEVER self-joined.
  // That asymmetry is the entire 100 TB story: per-snapshot work is
  // O(batch × bucket-density) + O(batch²-within-buckets), independent
  // of corpus size, where re-running batch q32 over corpus+batch would
  // re-pay the full corpus×corpus bucket join every night.
  //
  // The probe side (batch) shuffles on (band, bkey) against the
  // index's existing bucket partitioning; batch-internal pairs reuse
  // the full q32 path, hot-bucket triangle insurance included. The
  // oracle runs the naive full-corpus bucket join with an
  // at-least-one-new filter — same pair set, quadratic form.
  /** Core: near-dup candidate pairs touching the `arrivals` batch,
    * given the already-indexed `indexed` frame. Fixture-testable.
    */
  private[graft] def incrementalPairs(
      indexed: DataFrame, arrivals: DataFrame): DataFrame = {
    val bNew = bandedSignatures(arrivals)
    val bOld = bandedSignatures(indexed)
    val cross = bNew.as("n")
      .join(bOld.as("o"), Seq("band", "bkey"))
      .select(
        least(col("n.doc_id"), col("o.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("doc_b"),
        (size(filter(zip_with(col("n.sig"), col("o.sig"), (x, y) => x === y),
          v => v)).cast("double") / NumHashes).as("est_jaccard"))
      .distinct()
      .withColumn("src", lit("cross"))
    val intra = candidatePairsFrom(arrivals).withColumn("src", lit("intra"))
    cross.unionByName(intra).orderBy(col("doc_a"), col("doc_b"))
  }

  private def q141(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    incrementalPairs(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0))
  }

  private val q141Sql = {
    val rows = NumHashes / Bands
    s"""WITH sigs AS (
      |  SELECT doc_id, $signatureSql AS sig
      |  FROM (SELECT doc_id, $shingleHashesSql AS shashes FROM documents
      |        WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3) t),
      |banded AS (
      |  SELECT doc_id, sig, b.band AS band,
      |    array_to_string(sig[b.band*$rows+1 : b.band*$rows+$rows], ',') AS bkey
      |  FROM sigs, (SELECT unnest(range($Bands)) AS band) b)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_filter(list_transform(range($NumHashes),
      |    i -> a.sig[i+1] = b.sig[i+1]), x -> x)) AS DOUBLE) / $NumHashes
      |    AS est_jaccard,
      |  CASE WHEN a.doc_id % 10 = 0 AND b.doc_id % 10 = 0
      |    THEN 'intra' ELSE 'cross' END AS src
      |FROM banded a JOIN banded b
      |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      |WHERE a.doc_id % 10 = 0 OR b.doc_id % 10 = 0
      |ORDER BY doc_a, doc_b""".stripMargin
  }

  // q189 — EXACT set-similarity join by prefix filtering (the
  // AllPairs/PPJoin operator class): every document pair whose
  // 3-shingle-set Jaccard ≥ τ = 9/10, found WITHOUT LSH and without
  // the all-pairs cross join. The set elements are the hashed word
  // 3-shingles (the q32 codegen ngram_hash60 — 8-byte keys, and the
  // shingle space is what makes prefix filtering WORK on this corpus:
  // its unigram vocabulary is 31 words, so the "rarest" unigram still
  // hits 3816 docs at sf0.1 and unigram prefixes fan out to ~45M
  // candidate pairs, while the rarest shingles hit ≤7 docs and the
  // candidate bound drops to ~125k — measured before this rewrite).
  // The theorem: order the shingle vocabulary by global rarity (df
  // asc, hash asc); if |A∩B|/|A∪B| ≥ τ, then A and B must share an
  // element among each one's first n − ⌈τ·n⌉ + 1 rarest (else the
  // overlap is too small) — so candidate generation is an equi-join
  // on PREFIX elements only, the lowest-fanout keys. Candidates then
  // verify exactly with an in-row array_intersect of the two docs'
  // shingle-hash arrays. τ arithmetic is integer throughout
  // (⌈9n/10⌉ = (9n+9) DIV 10; keep test inter·10 ≥ 9·(na+nb−inter)).
  // Complements q32 (MinHash-LSH is probabilistic recall; this is
  // exact) and q33 (which verifies LSH candidates; this generates its
  // own, with a completeness theorem). The output is the per-DOC
  // summary (match count + best partner), not the raw pair list: this
  // corpus is a near-dup soup by construction, so pair rows would be
  // quadratic in cluster size — exactly the shape a 100 TB report
  // must not have — while the per-doc frame is bounded by the corpus.
  //
  // Scale shape: shingle-vocab-sized rank + per-doc prefix cut
  // (doc-bounded window); the pair join runs on rare 8-byte keys with
  // the standard length filter (10·na ≥ 9·nb) cutting mismatched
  // sizes before the distinct; shingle arrays travel only for
  // surviving candidate pairs. The oracle replays the identical
  // algorithm (the q33 discipline — the quadratic naive form would be
  // the oracle's own scale-killer).
  /** Core of q189 over any (doc_id, text, ...) frame — split out so
    * the spec can compare it against a brute-force all-pairs Jaccard
    * on synthetic corpora (the oracle replays the same prefix-filter
    * algorithm, so an algorithmic bug would be invisible to it; the
    * brute-force spec is what pins completeness).
    */
  private[graft] def similarityJoinOf(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    val dt = docsDf
      .select(col("doc_id"),
        explode(array_distinct(shingleHashes(tokens(col("text"))))).as("tk"))
    val dfc = dt.groupBy(col("tk")).agg(count(lit(1)).as("df"))
    val tokRank = Sampling.rankDistributed(dfc, Seq.empty,
        Seq(col("df"), col("tk")))
      .select(col("tk"), col("rk").as("trk"))
    val dtr = dt.join(tokRank, Seq("tk"))
    val nOf = dtr.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("trk"))
    val prefix = dtr.withColumn("p", row_number().over(wd))
      .join(nOf, Seq("doc_id"))
      .filter(col("p") <= col("n") - expr("(9 * n + 9) DIV 10") + 1)
      .select(col("tk"), col("doc_id"), col("n"))
    val cands = prefix.as("a").join(prefix.as("b"),
        col("a.tk") === col("b.tk") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * 10 >= col("b.n") * 9 && col("b.n") * 10 >= col("a.n") * 9)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .distinct()
    val arrs = dt.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(col("tk"))).as("toks"))
    val pairs = cands
      .join(arrs.select(col("doc_id").as("doc_a"), col("toks").as("ta")), Seq("doc_a"))
      .join(arrs.select(col("doc_id").as("doc_b"), col("toks").as("tb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .filter(col("inter") * 10 >= (col("na") + col("nb") - col("inter")) * 9)
      .select(col("doc_a"), col("doc_b"), col("inter"),
        expr("inter * 1048576 DIV (na + nb - inter)").as("jac_fp"))
    val sym = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("partner"),
        col("inter"), col("jac_fp"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("partner"),
        col("inter"), col("jac_fp")))
    sym.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        max(struct(col("jac_fp"), (-col("partner")).as("np"), col("inter"))).as("b"))
      .select(col("doc_id"), col("n_matches"), (-col("b.np")).as("best_match"),
        col("b.inter").as("best_inter"), col("b.jac_fp").as("best_jac_fp"))
      .orderBy(col("doc_id"))
  }

  private def q189(s: SparkSession, d: String): DataFrame =
    similarityJoinOf(documents(s, d))

  private val q189Sql =
    s"""WITH dt AS (SELECT DISTINCT doc_id, tk FROM (
      |    SELECT doc_id, unnest($shingleHashesSql) AS tk
      |    FROM documents)),
      |df AS (SELECT tk, count(*) AS df FROM dt GROUP BY tk),
      |tr AS (SELECT tk, row_number() OVER (ORDER BY df, tk) AS trk FROM df),
      |dtr AS (SELECT d.doc_id, d.tk, trk FROM dt d JOIN tr USING (tk)),
      |n AS (SELECT doc_id, count(*) AS n FROM dtr GROUP BY doc_id),
      |pos AS (SELECT doc_id, tk,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY trk) AS p
      |  FROM dtr),
      |pref AS (
      |  SELECT pos.doc_id, tk, n FROM pos JOIN n USING (doc_id)
      |  WHERE p <= n - (9 * n + 9) // 10 + 1),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.n AS na, b.n AS nb
      |  FROM pref a JOIN pref b ON a.tk = b.tk AND a.doc_id < b.doc_id
      |    AND a.n * 10 >= b.n * 9 AND b.n * 10 >= a.n * 9),
      |arr AS (SELECT doc_id, list(tk) AS toks FROM dt GROUP BY doc_id),
      |iv AS (
      |  SELECT doc_a, doc_b,
      |    CAST(len(list_intersect(x.toks, y.toks)) AS BIGINT) AS inter,
      |    na, nb
      |  FROM cand JOIN arr x ON x.doc_id = doc_a
      |  JOIN arr y ON y.doc_id = doc_b),
      |p2 AS (
      |  SELECT doc_a, doc_b, inter,
      |    CAST(inter * 1048576 // (na + nb - inter) AS BIGINT) AS jac_fp
      |  FROM iv WHERE inter * 10 >= 9 * (na + nb - inter)),
      |sym AS (
      |  SELECT doc_a AS doc_id, doc_b AS partner, inter, jac_fp FROM p2
      |  UNION ALL
      |  SELECT doc_b AS doc_id, doc_a AS partner, inter, jac_fp FROM p2),
      |r AS (
      |  SELECT doc_id, partner, inter, jac_fp,
      |    count(*) OVER (PARTITION BY doc_id) AS n_matches,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY jac_fp DESC, partner) AS rk
      |  FROM sym)
      |SELECT doc_id, CAST(n_matches AS BIGINT) AS n_matches,
      |  partner AS best_match, inter AS best_inter, jac_fp AS best_jac_fp
      |FROM r WHERE rk = 1
      |ORDER BY doc_id""".stripMargin

  /** q276 window length in tokens (power of two: [[SuffixRounds]]
    * prefix-doubling rounds reach it exactly) and the cross-document
    * duplication floor. Lee et al. 2021 ("Deduplicating Training Data
    * Makes Language Models Better") uses 50 BPE tokens on real corpora;
    * 16 word-tokens is the same operator scaled to the synthetic docs
    * (10-99 tokens each).
    */
  val SuffixL = 16
  val SuffixRounds = 4
  val SuffixMinDocs = 2

  // q276 — EXACT substring dedup at suffix granularity: every maximal
  // cross-document duplicated token span, with exact boundaries. This
  // is the operator q86 only APPROXIMATES (winnowing samples 1/16 of
  // window fingerprints — it finds which DOCS overlap, not where) and
  // q121 quantizes (fixed 8-token segment grid — a duplicate straddling
  // a segment boundary is invisible): here EVERY L-token window gets a
  // fingerprint, windows duplicated across >= SuffixMinDocs docs are
  // flagged, and runs of consecutive flagged starts merge into maximal
  // spans [span_start, span_end] (token offsets, 0-based inclusive).
  //
  // Algorithm: prefix doubling over hashed suffix ranks (the
  // Manber-Myers suffix-array construction step, bounded to window
  // length L): rank_0(pos) = h(token at pos); rank_{2w}(pos) =
  // h(rank_w(pos), rank_w(pos+w)). After log2(L) rounds rank_L
  // identifies the exact L-token substring (60-bit fingerprint space;
  // a collision needs ~2^30 DISTINCT windows per birthday bound — and
  // the same md5 chain runs in the oracle, so the gate is bit-exact
  // regardless).
  //
  // Scale shape: ONE exchange total on the corpus side — tokens hash
  // behind a doc_id repartition, then every doubling round is
  // lead(rank, w) OVER (PARTITION BY doc_id ORDER BY pos): an
  // in-partition window sort, NO join and NO shuffle (the equi-join
  // formulation would pay 2 exchanges per round). Rows carry
  // (doc_id, pos, 8-byte rank) — token text never shuffles. The
  // duplicated-window set is duplicate-mass-sized but NOT assumed
  // broadcastable (at 100 TB every boilerplate header lands in it — the
  // q114/q121 rule), so it flows back through a shuffled equi-join on
  // the fingerprint. Span merging is one more in-partition window.
  /** The q276 pipeline over any (doc_id, text) frame — split out so
    * SubstringSpanSpec can check it against brute-force window
    * enumeration on planted fixtures.
    */
  /** Shared front half of q276/q277: the tokenized per-doc base frame
    * and the flagged duplicated-window starts (doc_id, pos, r, df).
    */
  private[graft] def suffixFlagged(docs: DataFrame): (DataFrame, DataFrame) = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .localCheckpoint() // q73 lesson: materialize toks behind the exchange
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    var r = base
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        hash60(col("tok")).as("r"))
      .localCheckpoint()
    var width = 1
    while (width < SuffixL) {
      // rank of the 2w-window = hash of (rank of left w-window, rank of
      // right w-window); tails without a full window drop out here, so
      // surviving positions always carry a complete L-token window
      r = r.withColumn("r2", lead(col("r"), width).over(ord))
        .filter(col("r2").isNotNull)
        .select(col("doc_id"), col("pos"),
          hash60(concat_ws(":", col("r"), col("r2"))).as("r"))
        .localCheckpoint() // linear lineage: 4 rounds, not 2^4 scan leaves
      width *= 2
    }
    val dup = r.groupBy(col("r"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= SuffixMinDocs)
    (base, r.join(dup, Seq("r")))
  }

  private[graft] def substringSpansOf(docs: DataFrame): DataFrame = {
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val (_, flagged) = suffixFlagged(docs)
    // gaps-and-islands: consecutive flagged starts share (pos - rn)
    val spans = flagged
      .withColumn("grp", col("pos") -
        row_number().over(ord).cast("long"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (SuffixL - 1)).as("span_end"),
        count(lit(1)).as("n_windows"),
        min_by(col("r"), col("pos")).as("first_fp"),
        max(col("df")).as("max_df"))
    spans.select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"),
        col("n_windows"), col("first_fp"), col("max_df"))
      .orderBy(col("doc_id"), col("span_start"))
  }

  private def q276(s: SparkSession, d: String): DataFrame =
    substringSpansOf(documents(s, d))

  // q277 — the ACTION half of q276 (Lee et al. 2021 apply step): scrub
  // every duplicated span from the corpus, keeping ONE canonical copy.
  // The canonical occurrence of a duplicated L-window fingerprint is
  // its globally-first occurrence (min (doc_id, pos) — deterministic,
  // engine-independent). A token position is removed iff it is covered
  // by at least one NON-canonical flagged window and by NO canonical
  // window of its own doc (the canonical copy keeps its full text even
  // where overlapping duplicates cross it). Emits per doc the token
  // counts, removed-span count, and the fingerprint of the reassembled
  // text — the q121 output contract at suffix granularity.
  //
  // Scale shape: reuses [[suffixFlagged]] (one corpus exchange, windowed
  // doubling); everything after is DUPLICATE-MASS-sized: the canonical
  // mark is a window over flagged rows partitioned by fingerprint, the
  // coverage explode is 16x flagged rows, and the removed-index SETS
  // join back to the 1-row-per-doc base frame where the text rebuilds
  // IN-ROW from the token array (the q121 rule: reassembly never
  // shuffles tokens).
  /** The q277 pipeline over any (doc_id, text) frame — split out so
    * SubstringSpanSpec can check it against brute-force removal on
    * planted fixtures.
    */
  private[graft] def substringScrubOf(docs: DataFrame): DataFrame = {
    val (base, flagged) = suffixFlagged(docs)
    val wCanon = org.apache.spark.sql.expressions.Window
      .partitionBy(col("r")).orderBy(col("doc_id"), col("pos"))
    val cover = flagged
      .withColumn("canon", (row_number().over(wCanon) === 1).cast("int"))
      .select(col("doc_id"), col("canon"),
        explode(sequence(col("pos"), col("pos") + (SuffixL - 1))).as("p"))
    val removed = cover.groupBy(col("doc_id"), col("p"))
      .agg(max(col("canon")).as("any_canon"))
      .filter(col("any_canon") === 0)
      .select(col("doc_id"), col("p"))
      .localCheckpoint() // feeds the per-doc set AND the island count
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
    val rem = removed
      .withColumn("grp", col("p") - row_number().over(wOrd).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_removed"),
        countDistinct(col("grp")).as("n_spans_dropped"),
        collect_list(col("p")).as("rps"))
    base.join(rem, Seq("doc_id"), "left")
      .withColumn("rset", coalesce(col("rps"), array().cast("array<bigint>")))
      .withColumn("kept",
        filter(col("toks"), (_, i) => !array_contains(col("rset"), i.cast("long"))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("kept")).cast("long").as("n_kept"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("n_spans_dropped"), lit(0L)).as("n_spans_dropped"),
        hash60(concat_ws(" ", col("kept"))).as("clean_fp"))
      .orderBy(col("doc_id"))
  }

  private def q277(s: SparkSession, d: String): DataFrame =
    substringScrubOf(documents(s, d))

  private val q277Sql = {
    val fpClean = hash60Sql("coalesce(reb.clean, '')")
    s"""WITH $suffixChainSql,
      |fl AS (
      |  SELECT f.doc_id, f.pos,
      |    CAST(row_number() OVER (PARTITION BY f.r
      |      ORDER BY f.doc_id, f.pos) = 1 AS INT) AS canon
      |  FROM r4 f JOIN dup d USING (r)),
      |cover AS (
      |  SELECT doc_id, pos + u.i AS p, canon
      |  FROM fl, range($SuffixL) u(i)),
      |removed AS (
      |  SELECT doc_id, p FROM cover
      |  GROUP BY doc_id, p HAVING max(canon) = 0),
      |rem AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed,
      |    CAST(count(DISTINCT p - rn) AS BIGINT) AS n_spans_dropped
      |  FROM (SELECT doc_id, p,
      |      row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
      |    FROM removed) x
      |  GROUP BY doc_id),
      |kept AS (
      |  SELECT t.doc_id, t.pos, t.tok FROM tk t
      |  WHERE NOT EXISTS (SELECT 1 FROM removed x
      |    WHERE x.doc_id = t.doc_id AND x.p = t.pos)),
      |reb AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
      |    string_agg(tok, ' ' ORDER BY pos) AS clean
      |  FROM kept GROUP BY doc_id),
      |tot AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
      |  FROM tk GROUP BY doc_id)
      |SELECT t.doc_id, t.n_tokens,
      |  coalesce(reb.n_kept, 0) AS n_kept,
      |  coalesce(rem.n_removed, 0) AS n_removed,
      |  coalesce(rem.n_spans_dropped, 0) AS n_spans_dropped,
      |  $fpClean AS clean_fp
      |FROM tot t
      |LEFT JOIN reb ON reb.doc_id = t.doc_id
      |LEFT JOIN rem ON rem.doc_id = t.doc_id
      |ORDER BY t.doc_id""".stripMargin
  }

  /** Shared DuckDB prefix of the q276/q277 oracles: tokenized positions
    * (tk), the hashed prefix-doubling rounds to r4 (= rank of the full
    * L-token window), and the cross-doc duplicated fingerprints (dup).
    */
  // lazy: q277Sql initializes earlier in the object body (the q218Sql
  // init-order rule — a plain val here would splice "null" into it)
  private lazy val suffixChainSql = {
    val h0 = hash60Sql("tok")
    def hPair(a: String, b: String) = hash60Sql(s"$a || ':' || $b")
    val rounds = Seq(1, 2, 4, 8).zipWithIndex.map { case (w, i) =>
      val prev = s"r$i"
      s"""r${i + 1} AS (
        |  SELECT doc_id, pos, ${hPair("r", s"lead(r, $w) OVER w")} AS r
        |  FROM $prev
        |  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |  QUALIFY lead(r, $w) OVER w IS NOT NULL)""".stripMargin
    }.mkString(",\n")
    s"""tk AS (
      |  SELECT doc_id,
      |    unnest(regexp_extract_all(lower(text), '$TokenPattern')) AS tok,
      |    generate_subscripts(regexp_extract_all(lower(text), '$TokenPattern'), 1)
      |      - 1 AS pos
      |  FROM documents),
      |r0 AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, $h0 AS r FROM tk),
      |$rounds,
      |dup AS (
      |  SELECT r, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM r4 GROUP BY r HAVING count(DISTINCT doc_id) >= $SuffixMinDocs)"""
      .stripMargin
  }

  private val q276Sql = {
    s"""WITH $suffixChainSql,
      |fl AS (
      |  SELECT f.doc_id, f.pos, f.r, d.df,
      |    f.pos - row_number() OVER (PARTITION BY f.doc_id ORDER BY f.pos)
      |      AS grp
      |  FROM r4 f JOIN dup d USING (r))
      |SELECT doc_id, min(pos) AS span_start,
      |  max(pos) + ${SuffixL - 1} AS span_end,
      |  max(pos) + ${SuffixL - 1} - min(pos) + 1 AS span_len,
      |  CAST(count(*) AS BIGINT) AS n_windows,
      |  arg_min(r, pos) AS first_fp,
      |  max(df) AS max_df
      |FROM fl GROUP BY doc_id, grp
      |ORDER BY doc_id, span_start""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q30_dedup_exact", q30, Some(q30Sql)),
    Q("q31_dedup_norm", q31, Some(q31Sql)),
    Q("q32_minhash_lsh", q32, Some(q32Sql)),
    Q("q33_ngram_jaccard", q33, Some(q33Sql)),
    Q("q35_dedup_clusters", q35, Some(q35Sql)),
    Q("q93_keep_best", q93, Some(q93Sql)),
    Q("q36_simhash", q36, Some(q36Sql)),
    Q("q86_substring_winnow", q86, Some(q86Sql)),
    Q("q88_containment", q88, Some(q88Sql)),
    Q("q128_cluster_histogram", q128, Some(q128Sql)),
    Q("q141_incremental_lsh", q141, Some(q141Sql)),
    Q("q189_prefix_filter_join", q189, Some(q189Sql)),
    Q("q276_substring_spans", q276, Some(q276Sql)),
    Q("q277_substring_scrub", q277, Some(q277Sql)),
  )
}
