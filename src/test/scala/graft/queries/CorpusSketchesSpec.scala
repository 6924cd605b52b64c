package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the properties of the round-7 corpus/sketch operators that the
  * DuckDB oracle can't see: the CMS overestimate invariant, the Bloom
  * stage's pruning (and its false positives being removed by the exact
  * verify), and chunking coverage against an independent Scala
  * reference.
  */
class CorpusSketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  private def run(name: String, dir: String = sf) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("q81 boilerplate grams recompute to the same document frequencies") {
    val got = run("q81_boilerplate_ngrams").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // independent reference: naive Scala recount over the raw text
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = scala.collection.mutable.Map.empty[String, Set[Long]]
    for ((id, text) <- docs) {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
      for (g <- toks.sliding(Corpus.GramLen).filter(_.size == Corpus.GramLen))
        df.updateWith(g.mkString(" "))(s => Some(s.getOrElse(Set.empty) + id))
    }
    val want = df.collect { case (g, ids) if ids.size >= Corpus.BoilerplateMinDf =>
      (g, ids.size.toLong)
    }.toSeq.sortBy { case (g, n) => (-n, g) }
    assert(got.nonEmpty, "threshold produced an empty boilerplate set")
    assert(got == want)
  }

  test("q82 chunks cover every token with the configured overlap") {
    val chunks = run("q82_token_chunking")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_toks").as("toks_in_chunks"),
        max("n_toks").as("max_ck"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val lens = graft.Tables.documents(spark, sf).select(col("doc_id"),
      size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(chunks.keySet == lens.keySet, "every document must chunk")
    for ((id, n) <- lens) {
      val (nck, total, maxCk) = chunks(id)
      val wantNck = 1L + math.max(0L,
        (n - Corpus.ChunkSize + Corpus.ChunkStride - 1) / Corpus.ChunkStride)
      assert(nck == wantNck, s"doc $id: $nck chunks, want $wantNck for $n tokens")
      assert(maxCk <= Corpus.ChunkSize)
      // stride-overlap identity: every chunk but the last is full, and
      // each boundary re-reads size-stride tokens, so
      // Σ|chunk| = n + (nck-1)·(size-stride) exactly
      assert(total == n + (nck - 1) * (Corpus.ChunkSize - Corpus.ChunkStride),
        s"doc $id: token coverage mismatch")
    }
  }

  test("q83 CMS estimates dominate exact counts and collisions really occur") {
    val rows = run("q83_cms_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == Sketches.CmsTop)
    for ((g, exact, cms) <- rows)
      assert(cms >= exact, s"CMS under-estimated '$g': $cms < $exact")
    // width << vocabulary: the sketch must actually be lossy here,
    // otherwise the test scale isn't exercising the collision path
    assert(rows.exists { case (_, exact, cms) => cms > exact },
      "no collision anywhere — sketch width too large for the test to mean anything")
  }

  test("streaming CMS cells equal the batch cell table over the same documents") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = Sketches.cmsCellsOf(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    // three micro-batches: the sketch must accumulate across them
    docs.grouped((docs.size + 2) / 3).foreach(g => in.addData(g))
    val q = Sketches.cmsCellsOf(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("scms")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("scms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(batch.map(_._3).sum > 0)
  }

  test("q84 bloom prefilter prunes, passes FPs, and the verify stage removes them") {
    // sf0.01: the build side sets ~20% of the bits, so FPs exist
    val exact = graft.Tables.orders(spark, sf01).join(
      graft.Tables.customer(spark, sf01).filter(col("c_mktsegment") === "AUTOMOBILE"),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val nExact = exact.count()
    val nTotal = graft.Tables.orders(spark, sf01).count()
    val cand = Sketches.bloomCandidates(spark, sf01)
    // prefilter stage plan: one scan, the codegen merge-intersect
    // membership test, and ONLY the 1-row bitset broadcast (by-design
    // BNLJ) — no shuffle, no data-sized broadcast
    val candPlan = cand.queryExecution.executedPlan.toString
    assert(candPlan.contains("sorted_intersect_count"), candPlan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(candPlan).size == 1, candPlan)
    assert(!candPlan.contains("Exchange hashpartitioning"), candPlan)
    val nBloom = cand.count()
    assert(nBloom >= nExact, "bloom must never drop a true match")
    assert(nBloom > nExact, "expected false positives at this fill ratio")
    assert(nBloom < nTotal, "bloom stage must prune")
    // end-to-end equals the plain semi-join aggregate
    val got = run("q84_bloom_semi_join", sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = exact.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(14, 2)))
          .cast("double").as("total_price"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("bloom prefilter survives probe columns named like its internals") {
    // regression: prefilter used hardcoded __ppos / bloom_bits working
    // names — a probe frame already carrying either column had it
    // silently replaced-then-dropped; names must be collision-free
    import spark.implicits._
    val build = Seq(1L, 2L, 3L).toDF("k")
    val bits = graft.ops.BloomPrefilter.bitset(build, col("k"), k = 3, m = 64)
    val probe = Seq((1L, "keep-a", 10L), (4L, "keep-b", 20L), (2L, "keep-c", 30L))
      .toDF("k", "__ppos", "bloom_bits")
    val out = graft.ops.BloomPrefilter.prefilter(probe, col("k"), bits, k = 3, m = 64)
    assert(out.columns.toSeq == Seq("k", "__ppos", "bloom_bits"),
      "probe's own columns must survive the prefilter untouched")
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // true members 1 and 2 must pass with their original payloads
    assert(Set((1L, "keep-a", 10L), (2L, "keep-c", 30L)).subsetOf(rows), rows.toString)
  }
}
