package graft.queries

import graft.SparkSpec

/** The production-vocab evidence for the data-driven BPE apply
  * ([[TextAnalysis.bpeApplyTable]] / encodeStreamScalable): a 256-rank
  * merge table — far past ExprFoldMaxMerges, the scale where the
  * expression fold's one-nested-aggregate-per-merge tree stops being
  * plannable — encodes the sf0.001 corpus word frame correctly (every
  * word checked against the sequential Sennrich loop) with a plan whose
  * size is independent of |merges|.
  *
  * The merge table is realistic, not noise: rank-ordered char chains of
  * the corpus's most frequent words (the shape a trained merges.txt
  * has — early ranks fire on almost every word), deduplicated.
  */
class BpeScaleSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val Ranks = 256

  /** Sequential reference (BpeApplySpec's ground truth). */
  private def seqApply(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector :+ "</w>"
    for ((l, r) <- merges) {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  /** 256 distinct merges with a trained table's profile: first the
    * char chains of the corpus's frequent words ((c1,c2), (c1c2,c3),
    * ... then (word, </w>)) — ranks that fire on nearly every word —
    * then deterministic two-char ranks that DON'T occur on this shard,
    * exactly how a production merges.txt behaves on any one shard (a
    * 32k-rank table mostly misses any given word; the encoder must pay
    * for present ranks only).
    */
  private def mergeTable(words: Seq[String]): Seq[(String, String)] = {
    val seen = scala.collection.mutable.LinkedHashSet[(String, String)]()
    words.foreach { w =>
      var acc = w.take(1)
      w.drop(1).foreach { c => seen += ((acc, c.toString)); acc += c }
      seen += ((w, "</w>"))
    }
    val filler = for (a <- 'a' to 'z'; b <- 'a' to 'z')
      yield (s"$a$b", s"$b$a")
    filler.iterator.takeWhile(_ => seen.size < Ranks).foreach(seen += _)
    seen.toSeq.take(Ranks)
  }

  test(s"table apply at $Ranks merges: exact on the corpus word frame, " +
      "bounded plan") {
    val sf = "/root/testdata/sf0.001"
    val wc = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val frequent = wc.orderBy(col("cnt").desc, col("w"))
      .limit(800).collect().map(_.getString(0)).toSeq
    val merges = mergeTable(frequent)
    assert(merges.size == Ranks, s"only ${merges.size} merges derived")

    val df = TextAnalysis.bpeApply(wc.select(col("w")), merges)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("MapPartitions"),
      "256 ranks must dispatch to the data-driven path")
    assert(plan.length < 20000,
      s"plan grew with |merges| (${plan.length} chars) — " +
        "the table path must keep plan size merge-count-independent")

    val t0 = System.nanoTime()
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"encoded ${got.size} distinct words under $Ranks ranks in $secs%.2f s")
    // exact against the sequential loop on EVERY word (the frame is
    // small at sf0.001; at real scale this is the BpeApplySpec property)
    got.foreach { case (w, syms) =>
      assert(syms == seqApply(w, merges).mkString(" "),
        s"word '$w': got '$syms'")
    }
    // early ranks must actually fire — a no-op table would prove nothing
    val multi = got.count { case (w, syms) =>
      syms.split(' ').exists(_.length > 2) }
    assert(multi > got.size / 10,
      s"merge table barely fired ($multi/${got.size} words with a 3+-char symbol)")
  }

  test(s"scalable streaming encode at $Ranks merges matches a direct encode") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val wc = docs
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt")).localCheckpoint()
    val frequent = wc.orderBy(col("cnt").desc, col("w"))
      .limit(800).collect().map(_.getString(0)).toSeq
    val merges = mergeTable(frequent)
    // symbol inventory exactly as q283 derives it: lexicographic rank
    // over the applied vocab's distinct symbols
    val symIds = TextAnalysis.bpeApply(wc.select(col("w")), merges)
      .select(explode(split(col("syms"), " ")).as("sym"))
      .distinct().orderBy(col("sym")).collect().map(_.getString(0))
      .zipWithIndex.map { case (s, i) => s -> (i + 1L) }.toMap
    // encodeStream dispatches to the mapPartitions path at this size
    val got = TextAnalysis.encodeStream(docs, merges, symIds)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // independent digest: encode each doc's words sequentially
    val ranks = TextAnalysis.bpeRankMap(merges.toArray)
    val re = java.util.regex.Pattern.compile(graft.functions.TextFns.TokenPattern)
    val want = docs.as[(Long, String)].collect().flatMap { case (id, text) =>
      val m = re.matcher(Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT))
      val words = {
        val b = Seq.newBuilder[String]
        while (m.find()) b += m.group()
        b.result()
      }
      if (words.isEmpty) None
      else Some(id -> words.flatMap(w => seqApply(w, merges))
        .map(s => symIds.getOrElse(s, 0L))
        .foldLeft(0L)((acc, t) => (acc * 8191L + t) % 2147483647L))
    }.toMap
    assert(got == want,
      s"digest mismatch on ${got.keySet.union(want.keySet).count(k => got.get(k) != want.get(k))} docs")
  }
}
