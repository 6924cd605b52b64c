package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextFns._

/** Train/test contamination detection — the pretraining-pipeline gate
  * that checks candidate training documents for n-gram overlap with a
  * held-out benchmark/eval set (the standard decontamination step; the
  * reference has nothing like it, SURVEY.md §2.2).
  *
  * Architecture at 100 TB: the benchmark side is FIXED-SIZE (an eval
  * suite, not a corpus slice), so its distinct gram-hash set is
  * legitimately broadcastable — the corpus side streams once through a
  * gram-level hash join with no shuffle of document text; only (doc_id,
  * gram-hash) pairs move. If the benchmark ever outgrows broadcast,
  * the same plan runs as a shuffled equi-join on the 8-byte hash.
  * Here the "benchmark" is the deterministic doc_id % 97 == 0 slice so
  * the oracle can reproduce it.
  */
object Contamination {

  val GramLen = 5
  val BenchMod = 97

  private def indices(n: Column): Column =
    when(n > 0, sequence(lit(0), n - 1)).otherwise(array().cast("array<int>"))

  // q73 — per-document contamination: distinct 5-gram hashes hit in the
  // benchmark set, flagged when >= 50% of the document's grams overlap.
  // (The sf corpus has near-dups but almost none against the 1%
  // benchmark slice, so the flag branch is pinned by a fixture in
  // ContaminationSpec where a benchmark doc has a true near-copy.)
  private def q73(s: SparkSession, d: String): DataFrame =
    contaminationOf(documents(s, d))

  /** (doc_id, gs): sorted distinct gram-hash array per document, so the
    * overlap against the benchmark set is one codegen'd merge pass
    * (sorted_intersect_count, the q33 trick). NO explode anywhere:
    * exploding a computed array makes Spark's Generate re-evaluate the
    * md5-per-gram expression once per OUTPUT row (measured 17 s vs 1 s
    * at sf0.1). All narrow deterministic ops — runs identically over a
    * streaming frame.
    */
  private def gramSets(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    val toksDf = docsDf
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(col("doc_id"))
    val grams = array_sort(array_distinct(transform(
      indices(size(col("toks")) - (GramLen - 1)),
      i => hash60(concat_ws(" ",
        (0 until GramLen).map(j => element_at(col("toks"), i + j + 1)): _*)))))
    toksDf.select(col("doc_id"), grams.as("gs"))
  }

  /** The benchmark side is fixed-size (an eval suite): one sorted
    * deduped hash array, broadcast to every task — the corpus streams
    * through in a single scan with zero shuffle.
    */
  private def overlap(corpusGrams: DataFrame, benchmark: DataFrame): DataFrame = {
    val benchArr = gramSets(benchmark)
      .agg(array_sort(array_distinct(flatten(collect_list(col("gs"))))).as("bg"))
    corpusGrams.crossJoin(broadcast(benchArr))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_grams"),
        expr("sorted_intersect_count(gs, bg)").as("n_hit"))
      .withColumn("contaminated",
        when(col("n_grams") > 0 && col("n_hit") * 2 >= col("n_grams"), 1).otherwise(0))
  }

  private[graft] def contaminationOf(documentsDf: DataFrame): DataFrame =
    overlap(
      gramSets(documentsDf).filter(col("doc_id") % BenchMod =!= 0),
      documentsDf.filter(col("doc_id") % BenchMod === 0))
      .orderBy(col("doc_id"))

  /** Streaming form: each micro-batch of candidate documents flows
    * through the same single-scan overlap plan against the static
    * benchmark (stream-static broadcast join — no streaming state).
    */
  def contaminationStream(stream: DataFrame, benchmark: DataFrame): DataFrame =
    overlap(gramSets(stream), benchmark)

  private val q73Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val gram = (0 until GramLen).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH grams AS (
      |  SELECT doc_id, list_sort(list_distinct(list_transform(
      |    range(greatest(len(t) - ${GramLen - 1}, 0)),
      |    i -> ${hash60Sql(gram)}))) AS gs
      |  FROM (SELECT doc_id, $toks AS t FROM documents) x),
      |bench AS (
      |  SELECT list_sort(list_distinct(flatten(list(gs)))) AS bg
      |  FROM grams WHERE doc_id % $BenchMod = 0)
      |SELECT g.doc_id, CAST(len(g.gs) AS BIGINT) AS n_grams,
      |  CAST(len(list_intersect(g.gs, b.bg)) AS BIGINT) AS n_hit,
      |  CASE WHEN len(g.gs) > 0 AND len(list_intersect(g.gs, b.bg)) * 2 >= len(g.gs)
      |       THEN 1 ELSE 0 END AS contaminated
      |FROM grams g, bench b
      |WHERE g.doc_id % $BenchMod <> 0
      |ORDER BY g.doc_id""".stripMargin
  }

  // q114 — cross-split leakage audit: after the q89 hash split, check
  // every held-out (val/test) document for 5-gram overlap against the
  // TRAIN split — the self-contamination a training pipeline creates
  // when near-duplicates straddle the split boundary (exact-fingerprint
  // dedup alone cannot catch these; the standard practice is n-gram
  // decontamination of eval sets against train). Differs from q73 in
  // the critical scale dimension: the train side is CORPUS-SIZED, not
  // a fixed eval suite, so broadcasting it is illegal — the overlap
  // runs as a shuffled equi-join on the 8-byte gram hash. Only
  // (gram-hash) and (doc_id, gram-hash) rows reach the wire; document
  // text never shuffles. The train gram set is distinct-aggregated
  // (map-side partial dedup), and the per-doc roll-up re-keys by
  // doc_id — three hash-sized exchanges total, each sized by gram
  // cardinality, never by text bytes.
  private val LeakNum = 2 // leaked when n_hit * 2 >= n_grams (>= 50%)

  /** Core over (doc_id, split, text) — fixture-testable; q114 derives
    * the split from the q89 hash so the audit composes with the real
    * split assignment.
    */
  private[graft] def splitLeakageOf(docsDf: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docsDf.sparkSession)
    // Materialize the distinct gram-hash array behind the exchange so
    // the Generate consumes an attribute (the q73 re-evaluation trap).
    val base = docsDf
      .select(col("doc_id"), col("split"),
        array_distinct(call_function(
          "ngram_hash60", tokens(col("text")), lit(GramLen), lit(0L))).as("gs"))
      .repartition(col("doc_id"))
    val ex = base.select(col("doc_id"), col("split"), explode(col("gs")).as("g"))
    val train = ex.filter(col("split") === "train").select(col("g")).distinct()
    ex.filter(col("split") =!= "train")
      .join(train.withColumn("hit", lit(1L)), Seq("g"), "left")
      .groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hit"))
      .withColumn("leaked",
        when(col("n_hit") * LeakNum >= col("n_grams"), 1L).otherwise(0L))
      .orderBy(col("doc_id"))
  }

  private def q114(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(
      hash60(concat(lit(Sampling.SplitSeed), col("doc_id").cast("string"))), lit(100L))
    val split = when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    splitLeakageOf(documents(s, d).select(col("doc_id"), split.as("split"), col("text")))
  }

  private val q114Sql = {
    val toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    val gram = (0 until GramLen).map(j => s"t[i+${j + 1}]").mkString(" || ' ' || ")
    s"""WITH d AS (
      |  SELECT doc_id,
      |    CASE WHEN h % 100 < 80 THEN 'train' WHEN h % 100 < 90 THEN 'val'
      |         ELSE 'test' END AS split,
      |    $toks AS t
      |  FROM (SELECT doc_id, text,
      |          ${hash60Sql(s"'${Sampling.SplitSeed}' || CAST(doc_id AS VARCHAR)")} AS h
      |        FROM documents) x),
      |g AS (
      |  SELECT doc_id, split, unnest(list_distinct(list_transform(
      |    range(greatest(len(t) - ${GramLen - 1}, 0)),
      |    i -> ${hash60Sql(gram)}))) AS g
      |  FROM d),
      |tr AS (SELECT DISTINCT g FROM g WHERE split = 'train')
      |SELECT e.doc_id, e.split, count(*) AS n_grams, count(tr.g) AS n_hit,
      |  CAST(CASE WHEN count(tr.g) * $LeakNum >= count(*) THEN 1 ELSE 0 END
      |    AS BIGINT) AS leaked
      |FROM g e LEFT JOIN tr ON e.g = tr.g
      |WHERE e.split <> 'train'
      |GROUP BY e.doc_id, e.split
      |ORDER BY e.doc_id""".stripMargin
  }

  /** q123 cosine threshold for the SEMANTIC contamination flag, sized
    * so the gate fires both ways at every driver SF (the synthetic
    * embeddings are near-uniform — max benchmark cosine spans
    * ~0.40-0.47; a production pipeline on normalized sentence
    * embeddings would sit at ~0.95).
    */
  val SemTau = 0.35

  // q123 — semantic contamination gate: the embedding-space sibling of
  // q73's lexical n-gram gate (paraphrased benchmark questions carry
  // no shared 5-grams but land next to the benchmark in embedding
  // space). Every corpus vector is scored by its max cosine against
  // the benchmark slice (vec_id % BenchMod == 0, the q73 convention)
  // and flagged when it exceeds SemTau, with the offending benchmark
  // id attributed.
  //
  // Scale shape: the benchmark side is an eval suite — fixed-size —
  // so it broadcasts; the corpus side streams ONCE through a
  // broadcast nested-loop scoring pass and a per-vector max_by
  // aggregate that combines map-side. No shuffle of embedding
  // payloads, no self-join. (Contrast q34/q112: corpus×corpus
  // near-dup needs cell blocking; benchmark×corpus does not.)
  private def q123(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val e = embeddings(s, d)
    val bench = e.filter(col("vec_id") % BenchMod === 0)
      .select(col("vec_id").as("bench_id"), col("embedding").as("bvec"))
    e.filter(col("vec_id") % BenchMod =!= 0)
      .join(broadcast(bench))
      .select(col("vec_id"), col("bench_id"),
        expr("cosine_sim(embedding, bvec)").as("cos"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos")).as("max_cos"),
        min_by(col("bench_id"), struct(negate(col("cos")), col("bench_id")))
          .as("bench_id"))
      .withColumn("contaminated",
        when(col("max_cos") >= SemTau, 1L).otherwise(0L))
      .select(col("vec_id"), col("bench_id"), col("max_cos"), col("contaminated"))
      .orderBy(col("vec_id"))
  }

  private val q123Sql = {
    def dot(u: String, v: String) =
      s"list_reduce(list_transform(range(64), i -> CAST($u[i+1] AS DOUBLE) * CAST($v[i+1] AS DOUBLE)), (x, y) -> x + y)"
    val cos = s"(${dot("e.embedding", "b.embedding")} / " +
      s"(sqrt(${dot("e.embedding", "e.embedding")}) * sqrt(${dot("b.embedding", "b.embedding")})))"
    s"""WITH sc AS (
      |  SELECT e.vec_id, b.vec_id AS bench_id, $cos AS cos
      |  FROM embeddings e JOIN embeddings b
      |    ON b.vec_id % $BenchMod = 0 AND e.vec_id % $BenchMod <> 0)
      |SELECT vec_id, bench_id, max_cos,
      |  CAST(CASE WHEN max_cos >= $SemTau THEN 1 ELSE 0 END AS BIGINT)
      |    AS contaminated
      |FROM (
      |  SELECT vec_id, bench_id, cos,
      |    max(cos) OVER (PARTITION BY vec_id) AS max_cos,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY cos DESC, bench_id) AS rk
      |  FROM sc) t
      |WHERE rk = 1
      |ORDER BY vec_id""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q73_contamination", q73, Some(q73Sql)),
    Q("q114_split_leakage", q114, Some(q114Sql)),
    Q("q123_semantic_contamination", q123, Some(q123Sql)),
  )
}
