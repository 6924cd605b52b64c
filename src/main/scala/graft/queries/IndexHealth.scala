package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.functions.TextFns._

/** Bucket-skew report across the engine's hash-bucketed index
  * structures — the operational dashboard that predicts whether a
  * 100 TB run will hot-spot BEFORE it runs: every LSH/feature-hash
  * structure in the engine degrades the same way (one degenerate
  * bucket goes quadratic, or one feature bucket swallows the
  * distribution), and the mitigation knobs (triangle split thresholds,
  * band counts, bucket counts) are sized from exactly these numbers.
  * Covers four structures, each through the SAME builder the
  * production operator uses — the report audits the real index frames,
  * not a reimplementation:
  *
  *   - `minhash_bands` — q32's banded signature buckets
  *     (Dedup.bandedSignatures);
  *   - `winnow_fps` — q86's sampled rolling-hash fingerprint buckets
  *     (Dedup.substringFingerprints);
  *   - `dsir_feats` — q115/q131's hashed-bigram feature buckets;
  *   - `phash_bands` — q127's perceptual-hash band buckets.
  *
  * Per structure: bucket count, item count, the largest bucket, and
  * the largest bucket's share of all items in 2^20 fixed point (the
  * skew alarm). Scale shape: each structure contributes one
  * bucket-keyed aggregate (map-side combined) followed by a 1-row
  * stats aggregate; the union is 4 rows.
  */
object IndexHealth {

  val FpScale = 1048576L // 2^20

  private def statsOf(buckets: DataFrame, name: String): DataFrame =
    buckets.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("c")).as("n_items"),
        max(col("c")).as("max_bucket"))
      .select(lit(name).as("structure"), col("n_buckets"), col("n_items"),
        col("max_bucket"),
        expr(s"(max_bucket * $FpScale) div n_items").as("top_share_fp"))

  private def q132(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val minhash = Dedup.bandedSignatures(docs)
      .select(concat_ws("|", col("band"), col("bkey")).as("bucket"))
    val winnow = Dedup.substringFingerprints(docs)
      .select(col("h").cast("string").as("bucket"))
    val dsir = docs
      .select(col("doc_id"), array_distinct(call_function("ngram_hash60",
        tokens(col("text")), lit(2), lit(Sampling.DsirBuckets))).as("fs"))
      .repartition(col("doc_id"))
      .select(explode(col("fs")).as("f"))
      .select(col("f").cast("string").as("bucket"))
    val phash = graft.multimodal.Multimodal.perceptualHashes(
        graft.multimodal.Multimodal.mediaFromDocuments(s, d))
      .toDF("media_id", "phash")
      .select(col("phash"), explode(sequence(lit(0), lit(3))).as("b"))
      .select(concat_ws("|", col("b"),
        expr("shiftright(phash, b * 15) & 32767")).as("bucket"))
    statsOf(minhash, "minhash_bands")
      .unionByName(statsOf(winnow, "winnow_fps"))
      .unionByName(statsOf(dsir, "dsir_feats"))
      .unionByName(statsOf(phash, "phash_bands"))
      .orderBy(col("structure"))
  }

  private val q132Sql = {
    def byteAt(i: String): String =
      s"((strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    def stats(src: String, name: String) =
      s"""SELECT '$name' AS structure, count(*) AS n_buckets,
         |  CAST(sum(c) AS BIGINT) AS n_items,
         |  CAST(max(c) AS BIGINT) AS max_bucket,
         |  CAST((max(c) * $FpScale) // sum(c) AS BIGINT) AS top_share_fp
         |FROM (SELECT bucket, count(*) AS c FROM $src GROUP BY bucket) ${name}_b"""
        .stripMargin
    s"""WITH ${Dedup.pairsCteSql},
      |${Dedup.winnowPairsCteSql},
      |mh AS (SELECT band || '|' || bkey AS bucket FROM banded),
      |wf AS (SELECT CAST(h AS VARCHAR) AS bucket FROM wfp),
      |df AS (
      |  SELECT CAST(unnest(list_distinct(list_transform(
      |    range(greatest(len(t) - 1, 0)),
      |    i -> ${hash60Sql("t[i+1] || ' ' || t[i+2]")} % ${Sampling.DsirBuckets})))
      |    AS VARCHAR) AS bucket
      |  FROM (SELECT regexp_extract_all(lower(text), '$TokenPattern') AS t
      |        FROM documents) dd),
      |pm AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents),
      |pb AS (
      |  SELECT media_id, (60*j)//len AS blk, ${byteAt("j")} AS v
      |  FROM (SELECT media_id, hx, len, unnest(range(len)) AS j FROM pm)),
      |pbs AS (
      |  SELECT media_id, blk, sum(v) AS s,
      |    sum(sum(v)) OVER (PARTITION BY media_id) AS total
      |  FROM pb GROUP BY media_id, blk),
      |ph2 AS (
      |  SELECT media_id,
      |    sum(CASE WHEN s > total//60 THEN 1::BIGINT << blk ELSE 0 END) AS phash
      |  FROM pbs GROUP BY media_id),
      |pf AS (
      |  SELECT b || '|' || ((phash >> (b * 15)) & 32767) AS bucket
      |  FROM ph2, (SELECT unnest(range(4)) AS b) bb)
      |${stats("mh", "minhash_bands")}
      |UNION ALL ${stats("wf", "winnow_fps")}
      |UNION ALL ${stats("df", "dsir_feats")}
      |UNION ALL ${stats("pf", "phash_bands")}
      |ORDER BY structure""".stripMargin
  }

  // ---- q136: MinHash estimator calibration -------------------------------

  // q136 — calibration matrix for the q32 MinHash Jaccard estimator:
  // every LSH candidate pair's ESTIMATED similarity (matching-signature
  // fraction, k/32) against its EXACT shingle-set Jaccard — the ground
  // truth the signatures sketch — cross-tabulated into decile buckets.
  // This is the eval that sizes NumHashes/Bands before a 100 TB dedup
  // run: off-diagonal mass above the exact-decile diagonal is the
  // false-positive work the verify stage will pay for, mass missing
  // below ~0.2 exact is recall the banding already lost. Bucket
  // arithmetic is INTEGER-only on both engines (est recovers the match
  // count k exactly — k/32 is dyadic — and the exact side buckets
  // (inter*10) div union without ever forming the double), so the cells
  // hash-compare bit-exactly. Scale shape: the pair frame is
  // candidate-sized (LSH output, not corpus²), the shingle sets join in
  // by doc_id twice, the intersect is the codegen'd
  // sorted_intersect_count merge pass, and the matrix aggregate is ≤121
  // cells.
  private def q136(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.candidatePairs(s, d)
    val sets = documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        array_sort(array_distinct(Dedup.shingleHashes(col("toks")))).as("sset"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb")), "doc_b")
      .withColumn("inter", expr("sorted_intersect_count(sa, sb)"))
      .withColumn("uni",
        size(col("sa")).cast("long") + size(col("sb")).cast("long") - col("inter"))
      .withColumn("k_match",
        floor(col("est_jaccard") * Dedup.NumHashes + lit(0.5)).cast("long"))
      .withColumn("est_bucket", expr(s"(k_match * 10) div ${Dedup.NumHashes}"))
      .withColumn("exact_bucket",
        when(col("uni") === 0, lit(10L)).otherwise(expr("(inter * 10) div uni")))
      .groupBy(col("est_bucket"), col("exact_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("est_bucket"), col("exact_bucket"))
  }

  private val q136Sql =
    s"""WITH ${Dedup.pairsCteSql},
      |sets AS (
      |  SELECT doc_id, list_distinct(${Dedup.shingleHashesSql}) AS sset
      |  FROM documents),
      |j AS (
      |  SELECT p.est_jaccard,
      |    len(list_intersect(a.sset, b.sset)) AS inter,
      |    len(a.sset) + len(b.sset) - len(list_intersect(a.sset, b.sset)) AS uni
      |  FROM pairs p
      |  JOIN sets a ON a.doc_id = p.doc_a
      |  JOIN sets b ON b.doc_id = p.doc_b),
      |b AS (
      |  SELECT CAST((CAST(floor(est_jaccard * ${Dedup.NumHashes} + 0.5) AS BIGINT)
      |           * 10) // ${Dedup.NumHashes} AS BIGINT) AS est_bucket,
      |    CAST(CASE WHEN uni = 0 THEN 10
      |              ELSE (inter * 10) // uni END AS BIGINT) AS exact_bucket
      |  FROM j)
      |SELECT est_bucket, exact_bucket, count(*) AS n_pairs
      |FROM b GROUP BY est_bucket, exact_bucket
      |ORDER BY est_bucket, exact_bucket""".stripMargin

  // q159 — join-key skew audit with exact Gini: for each candidate
  // shuffle key of the fact table, the per-key row-count distribution
  // summarized as (#keys, rows, heaviest key, Gini coefficient in 2^20
  // fixed point). This is the pre-flight a 100 TB join runs BEFORE
  // picking its shuffle key: a Gini near 0 shuffles evenly, a Gini
  // near 2^20 means one straggler task — the number that decides
  // between a plain shuffle join, salting (q45's SkewedJoins), or AQE
  // skew splitting. Gini comes from the rank identity
  // Σ(2·rk − n − 1)·c / (n·Σc) over counts ranked ascending — ranks
  // via rankDistributed (range partition + broadcast carry, no global
  // window), the product sum in DECIMAL(38,0) so a trillion-row key
  // count cannot overflow, and one integer DIV at the end — bit-equal
  // in DuckDB's HUGEINT arithmetic.
  private def q159(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val keys = li.select(lit("l_partkey").as("kc"), col("l_partkey").as("key"))
      .unionAll(li.select(lit("l_suppkey").as("kc"), col("l_suppkey").as("key")))
      .unionAll(li.select(lit("l_orderkey").as("kc"), col("l_orderkey").as("key")))
    val counts = keys.groupBy(col("kc"), col("key")).agg(count(lit(1)).as("c"))
    val ranked = Sampling.rankDistributed(counts, Seq("kc"),
      Seq(col("c"), col("key")))
    val per = ranked.groupBy(col("kc")).agg(
      count(lit(1)).as("n_keys"),
      sum(col("c")).as("total"),
      max(col("c")).as("max_cnt"),
      sum((col("rk") * 2 - 1).cast(DecimalType(38, 0)) * col("c"))
        .as("wsum")) // Σ(2rk−1)c; the −n·Σc term folds in below
    per.select(col("kc").as("key_col"), col("n_keys"), col("total"),
        col("max_cnt"),
        expr(s"CAST((wsum - CAST(n_keys AS DECIMAL(38,0)) * total) " +
          s"* $FpScale DIV (CAST(n_keys AS DECIMAL(38,0)) * total) AS BIGINT)")
          .as("gini_fp"))
      .orderBy(col("key_col"))
  }

  private val q159Sql =
    s"""WITH k AS (
      |  SELECT 'l_partkey' AS kc, l_partkey AS key FROM lineitem
      |  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
      |  UNION ALL SELECT 'l_orderkey', l_orderkey FROM lineitem),
      |c AS (SELECT kc, key, count(*) AS c FROM k GROUP BY kc, key),
      |r AS (SELECT kc, c,
      |    row_number() OVER (PARTITION BY kc ORDER BY c, key) AS rk
      |  FROM c),
      |p AS (SELECT kc, count(*) AS n_keys, sum(c) AS total, max(c) AS max_cnt,
      |    sum((2 * rk - 1) * c) AS wsum
      |  FROM r GROUP BY kc)
      |SELECT kc AS key_col, n_keys, CAST(total AS BIGINT) AS total, max_cnt,
      |  CAST((wsum - n_keys * total) * $FpScale
      |    // (n_keys * total) AS BIGINT) AS gini_fp
      |FROM p ORDER BY key_col""".stripMargin

  // q164 — join-size planner: the exact output cardinality of each
  // candidate fact↔dim join, computed WITHOUT running the join —
  // |A ⋈ B| = Σ_k cA(k)·cB(k) over the per-key count frames. With
  // q159's Gini this is the planner dashboard: predicted rows decide
  // broadcast-vs-shuffle and pre-size shuffle partitions; at 100 TB
  // the count frames are keyspace-sized (not data-sized) and the
  // product join shuffles only those. The DECIMAL(38,0) product sum
  // survives trillion-row keys. Each row also carries the fan-out
  // ratio (output rows per fact row, 2^20 fixed point).
  private def q164(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    // fact_rows is the UNJOINED fact count (1-row frame, cross-joined
    // into each advisory): summing ca after the inner join would count
    // only keys that matched the dim, silently inflating "output rows
    // per fact row" whenever orphan fact keys exist — correct only
    // under referential integrity, which a planner dashboard must not
    // assume of the data it is auditing
    val factTotal = li.agg(count(lit(1)).as("fact_rows"))
    def est(name: String, factKey: Column, dim: DataFrame,
        dimKey: Column): DataFrame = {
      val ca = li.groupBy(factKey.as("k")).agg(count(lit(1)).as("ca"))
      val cb = dim.groupBy(dimKey.as("k")).agg(count(lit(1)).as("cb"))
      ca.join(cb, Seq("k"))
        .agg(coalesce(sum((col("ca") * col("cb")).cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0))).as("est"))
        .crossJoin(factTotal)
        .select(lit(name).as("join_name"),
          expr("CAST(est AS BIGINT)").as("est_rows"),
          col("fact_rows"),
          expr(s"CAST(est * $FpScale DIV CAST(fact_rows AS DECIMAL(38,0)) AS BIGINT)")
            .as("fanout_fp"))
    }
    est("lineitem_orders", col("l_orderkey"),
        orders(s, d), col("o_orderkey"))
      .unionAll(est("lineitem_part", col("l_partkey"), part(s, d), col("p_partkey")))
      .unionAll(est("lineitem_supplier", col("l_suppkey"),
        supplier(s, d), col("s_suppkey")))
      .orderBy(col("join_name"))
  }

  private val q164Sql = {
    def est(name: String, fk: String, dim: String, dk: String) =
      s"""SELECT '$name' AS join_name,
        |  CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS est_rows,
        |  (SELECT count(*) FROM lineitem) AS fact_rows,
        |  CAST(coalesce(sum(ca * cb), 0) * $FpScale
        |    // (SELECT count(*) FROM lineitem) AS BIGINT) AS fanout_fp
        |FROM (SELECT $fk AS k, count(*) AS ca FROM lineitem GROUP BY $fk) a
        |JOIN (SELECT $dk AS k, count(*) AS cb FROM $dim GROUP BY $dk) b
        |USING (k)""".stripMargin
    s"""SELECT * FROM (
      |${est("lineitem_orders", "l_orderkey", "orders", "o_orderkey")}
      |UNION ALL
      |${est("lineitem_part", "l_partkey", "part", "p_partkey")}
      |UNION ALL
      |${est("lineitem_supplier", "l_suppkey", "supplier", "s_suppkey")})
      |ORDER BY join_name""".stripMargin
  }

  // q165 — Benford first-digit audit: the leading-digit distribution
  // of order totals against Benford's law, the classic
  // synthetic-data / fraud smoke test. The digit comes from the
  // DECIMAL string form (never float math), expected shares are
  // log10(1 + 1/d) pinned as 2^20 fixed-point CONSTANTS (identical
  // literals in both engines — no cross-engine log), and the deviation
  // is |observed − expected| in the same fixed point. One scan,
  // 9-row output.
  private val BenfordFp: Map[Int, Long] = Map(
    // floor(log10(1 + 1/d) * 2^20) for d = 1..9
    1 -> 315652L, 2 -> 184645L, 3 -> 131007L, 4 -> 101617L,
    5 -> 83027L, 6 -> 70198L, 7 -> 60808L, 8 -> 53637L, 9 -> 47980L)

  private def q165(s: SparkSession, d: String): DataFrame = {
    val expected = BenfordFp.toSeq.map { case (dg, fp) =>
      s"WHEN $dg THEN ${fp}L" }.sorted.mkString(" ")
    orders(s, d)
      .select(expr("CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(14,2)) " +
        "AS STRING), 1, 1) AS INT)").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("observed"))
      .withColumn("n_total", sum(col("observed")).over())
      .withColumn("observed_fp",
        expr(s"observed * $FpScale DIV n_total"))
      .withColumn("expected_fp",
        expr(s"CAST(CASE digit $expected END AS BIGINT)"))
      .withColumn("dev_fp", abs(col("observed_fp") - col("expected_fp")))
      .select(col("digit"), col("observed"), col("observed_fp"),
        col("expected_fp"), col("dev_fp"))
      .orderBy(col("digit"))
  }

  private val q165Sql = {
    val expected = BenfordFp.toSeq.map { case (dg, fp) =>
      s"WHEN $dg THEN $fp" }.sorted.mkString(" ")
    s"""WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(14,2))
      |      AS VARCHAR), 1, 1) AS INT) AS digit,
      |    count(*) AS observed
      |  FROM orders GROUP BY 1),
      |t AS (SELECT c.*, sum(observed) OVER () AS n_total FROM c),
      |f AS (SELECT digit, observed,
      |    observed * $FpScale // n_total AS observed_fp,
      |    CAST(CASE digit $expected END AS BIGINT) AS expected_fp
      |  FROM t)
      |SELECT digit, observed, CAST(observed_fp AS BIGINT) AS observed_fp,
      |  expected_fp, CAST(abs(observed_fp - expected_fp) AS BIGINT) AS dev_fp
      |FROM f ORDER BY digit""".stripMargin
  }

  // q167 — the round-12 capstone: a join-strategy ADVISOR composing
  // the q159 skew Gini and the q164 cardinality estimate into the
  // decision a 100 TB physical planner makes per join — broadcast the
  // dim (when it fits the q05 broadcast budget), salt the fact key
  // (when its count distribution is pathologically unequal — the
  // SkewedJoins mitigation), or take the plain shuffle. All inputs are
  // keyspace-sized aggregates of single scans; the thresholds are
  // pinned constants so the recommendation is oracle-checkable.
  private val AdvisorBroadcastMaxRows = 10000L // dim fits executor memory
  private val AdvisorSaltGini = 400000L // ~0.38 in 2^20 fixed point

  private def q167(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    def advise(name: String, factKey: Column, dim: DataFrame,
        dimKey: Column): DataFrame = {
      val ca = li.groupBy(factKey.as("key")).agg(count(lit(1)).as("c"))
      val cb = dim.groupBy(dimKey.as("key")).agg(count(lit(1)).as("cb"))
      val ranked = Sampling.rankDistributed(
        ca.select(lit(name).as("kc"), col("key"), col("c")),
        Seq("kc"), Seq(col("c"), col("key")))
      val skew = ranked.groupBy(col("kc")).agg(
        count(lit(1)).as("n_keys"), sum(col("c")).as("total"),
        sum((col("rk") * 2 - 1).cast(DecimalType(38, 0)) * col("c")).as("wsum"))
        .select(col("kc"),
          expr(s"CAST((wsum - CAST(n_keys AS DECIMAL(38,0)) * total) " +
            s"* $FpScale DIV (CAST(n_keys AS DECIMAL(38,0)) * total) AS BIGINT)")
            .as("gini_fp"))
      val size = ca.join(cb, Seq("key"))
        .agg(coalesce(sum((col("c") * col("cb")).cast(DecimalType(38, 0))),
          lit(0).cast(DecimalType(38, 0))).as("est"))
        .crossJoin(cb.agg(count(lit(1)).as("dim_rows")))
        .select(lit(name).as("kc"), expr("CAST(est AS BIGINT)").as("est_rows"),
          col("dim_rows"))
      skew.join(size, Seq("kc"))
        .select(col("kc").as("join_name"), col("dim_rows"), col("est_rows"),
          col("gini_fp"),
          when(col("dim_rows") <= AdvisorBroadcastMaxRows, "broadcast")
            .when(col("gini_fp") >= AdvisorSaltGini, "salted_shuffle")
            .otherwise("shuffle").as("strategy"))
    }
    advise("lineitem_orders", col("l_orderkey"), orders(s, d), col("o_orderkey"))
      .unionAll(advise("lineitem_part", col("l_partkey"),
        part(s, d), col("p_partkey")))
      .unionAll(advise("lineitem_supplier", col("l_suppkey"),
        supplier(s, d), col("s_suppkey")))
      .orderBy(col("join_name"))
  }

  private val q167Sql = {
    def one(name: String, fk: String, dim: String, dk: String) =
      s"""SELECT '$name' AS join_name,
        |  (SELECT count(*) FROM (SELECT DISTINCT $dk FROM $dim)) AS dim_rows,
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT)
        |   FROM (SELECT $fk AS key, count(*) AS ca FROM lineitem GROUP BY $fk) a
        |   JOIN (SELECT $dk AS key, count(*) AS cb FROM $dim GROUP BY $dk) b
        |   USING (key)) AS est_rows,
        |  (SELECT CAST((sum((2 * rk - 1) * c) - count(*) * sum(c))
        |      * $FpScale // (count(*) * sum(c)) AS BIGINT)
        |   FROM (SELECT c, row_number() OVER (ORDER BY c, key) AS rk
        |         FROM (SELECT $fk AS key, count(*) AS c FROM lineitem
        |               GROUP BY $fk))) AS gini_fp""".stripMargin
    val rows = Seq(
      one("lineitem_orders", "l_orderkey", "orders", "o_orderkey"),
      one("lineitem_part", "l_partkey", "part", "p_partkey"),
      one("lineitem_supplier", "l_suppkey", "supplier", "s_suppkey"),
    ).mkString("\nUNION ALL\n")
    s"""SELECT join_name, dim_rows, est_rows, gini_fp,
      |  CASE WHEN dim_rows <= $AdvisorBroadcastMaxRows THEN 'broadcast'
      |    WHEN gini_fp >= $AdvisorSaltGini THEN 'salted_shuffle'
      |    ELSE 'shuffle' END AS strategy
      |FROM (
      |$rows
      |) ORDER BY join_name""".stripMargin
  }

  // q180 — ANALYZE-style column statistics for the fact table: per
  // column, null count, exact distinct count, and numeric min/max —
  // the stats a cost-based optimizer (and q159/q164/q167's planning
  // family) is fed from. Numeric bounds are emitted as exact BIGINTs
  // (ints directly, money through the cents DECIMAL bridge, the date
  // as epoch millis; strings get NULL bounds), so no float-formatting
  // ambiguity reaches the oracle. The table scans ONCE into a
  // materialized compact frame; each column then runs its own
  // partial-distinct aggregate over it and the 11 one-row results
  // union — measured 2× faster than the single multi-DISTINCT
  // aggregate, whose Expand replicates every row |cols| times through
  // one shuffle (6.8 → 3.4 s at sf0.1). Swap in approx_count_distinct
  // when 2% error is acceptable.
  private def q180(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d)
    val ints = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    val money = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val strs = Seq("l_returnflag", "l_linestatus")
    def cents(c: String) = expr(s"CAST(CAST($c AS DECIMAL(14,2)) * 100 AS BIGINT)")
    val numOf: Seq[(String, Column)] =
      ints.map(c => c -> col(c).cast("long")) ++
        money.map(c => c -> cents(c)) ++
        strs.map(c => c -> lit(null).cast("long")) :+
        ("l_shipdate" -> expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))"))
    val base = li.select(numOf.map { case (c, num) =>
      struct(col(c).isNull.as("isn"), num.as("num"), col(c).as("v")).as(c)
    }: _*).localCheckpoint()
    val perCol = numOf.map { case (c, _) =>
      base.agg(
        sum(when(col(s"$c.isn"), 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col(s"$c.v")).as("n_distinct"),
        min(col(s"$c.num")).as("min_num"),
        max(col(s"$c.num")).as("max_num"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_num"), col("max_num"))
    }
    perCol.reduce(_ unionAll _).orderBy(col("col_name"))
  }

  private val q180Sql = {
    def row(c: String, num: String) =
      s"""SELECT '$c' AS col_name,
        |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  count(DISTINCT $c) AS n_distinct,
        |  $num AS min_num,
        |  ${num.replace("min(", "max(")} AS max_num
        |FROM lineitem""".stripMargin
    val ints = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .map(c => row(c, s"min(CAST($c AS BIGINT))"))
    val money = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(c => row(c, s"min(CAST(CAST($c AS DECIMAL(14,2)) * 100 AS BIGINT))"))
    val strs = Seq("l_returnflag", "l_linestatus")
      .map(c => row(c, "min(CAST(NULL AS BIGINT))"))
    val date = row("l_shipdate", "min(epoch_ms(CAST(l_shipdate AS TIMESTAMP)))")
    s"""SELECT * FROM (
      |${(ints ++ money ++ strs :+ date).mkString("\nUNION ALL\n")}
      |) ORDER BY col_name""".stripMargin
  }

  // q235 — postings-list compression planner: for every term in the
  // corpus's inverted index, the exact byte cost of delta+varint
  // encoding its sorted doc_id postings (the Lucene/PforDelta family's
  // baseline layout) against the raw 8-byte layout — the sizing report
  // an index-storage planner reads before choosing a codec. Gap
  // varint cost is pure integer arithmetic: a value v costs
  // (bitlen(v) + 6) DIV 7 bytes, with bitlen computed by binary
  // string length (never floor(log2(double)) — the engine-parity rule
  // from the log2-bucket queries), so both engines agree bit-for-bit.
  //
  // Scale shape: one corpus scan explodes per-doc DISTINCT terms (the
  // posting relation, O(total tokens)); gap formation is a lag over
  // term-partitioned windows — term-sharded parallelism, the layout an
  // index builder would write in anyway (the gaps fall out of the
  // sort-merge at write time; computing them standalone costs one
  // range shuffle). Output is vocabulary-sized.
  /** Core: per-term delta+varint byte costs over a (doc_id, term)
    * posting relation. Fixture-testable.
    */
  private[graft] def postingsBytesOf(posts: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
    posts
      .withColumn("gap", col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w), lit(0L)))
      .withColumn("vbytes", expr("(length(bin(gap)) + 6) DIV 7"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        (count(lit(1)) * 8L).as("raw_bytes"),
        sum(col("vbytes")).as("varint_bytes"))
      .select(col("term"), col("df"), col("raw_bytes"), col("varint_bytes"),
        expr("(raw_bytes - varint_bytes) * 1048576 DIV raw_bytes").as("savings_fp"))
      .orderBy(col("term"))
  }

  private def q235(s: SparkSession, d: String): DataFrame =
    postingsBytesOf(documents(s, d)
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("term")))

  private val q235Sql =
    """WITH p AS (
      |  SELECT doc_id, unnest(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
      |    AS term
      |  FROM documents),
      |g AS (
      |  SELECT term,
      |    doc_id - coalesce(lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), 0)
      |      AS gap
      |  FROM p),
      |v AS (
      |  SELECT term, CAST((length(printf('%b', gap)) + 6) // 7 AS BIGINT) AS vbytes
      |  FROM g)
      |SELECT term, count(*) AS df, count(*) * 8 AS raw_bytes,
      |  CAST(sum(vbytes) AS BIGINT) AS varint_bytes,
      |  CAST((count(*) * 8 - CAST(sum(vbytes) AS BIGINT)) * 1048576
      |    // (count(*) * 8) AS BIGINT) AS savings_fp
      |FROM v GROUP BY term
      |ORDER BY term""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q132_index_health", q132, Some(q132Sql)),
    Q("q136_minhash_calibration", q136, Some(q136Sql)),
    Q("q159_join_skew_audit", q159, Some(q159Sql)),
    Q("q164_join_size_planner", q164, Some(q164Sql)),
    Q("q165_benford_audit", q165, Some(q165Sql)),
    Q("q167_join_advisor", q167, Some(q167Sql)),
    Q("q180_column_stats", q180, Some(q180Sql)),
    Q("q235_postings_bytes", q235, Some(q235Sql)),
  )
}
