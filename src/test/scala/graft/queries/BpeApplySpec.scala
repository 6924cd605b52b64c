package graft.queries

import graft.SparkSpec

/** Pins the decoupled BPE APPLY pass (q283's encode core): the
  * one-projection fold-based encoder must agree with a sequential
  * per-word Sennrich apply loop (rank-ordered merges, each applied
  * greedy-leftmost-non-overlapping) on random words under random merge
  * tables, on the adversarial repeat/chain fixtures, and — when handed
  * training's own merges — reproduce training's final vocabulary state
  * exactly.
  */
class BpeApplySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  /** Sequential reference: split to chars + </w>, then for each merge
    * in rank order do one left-to-right scan merging non-overlapping
    * (l, r) adjacencies — the loop a single-node tokenizer runs.
    */
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

  private def applyOn(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, String] =
    TextAnalysis.bpeApply(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("fixtures: consecutive repeats and chained merges") {
    val words = Seq("ssss", "sssss", "abab", "aaaa", "a", "ab")
    // (s,s) twice exercises re-merging a just-created token in a LATER
    // round; (a,b)+(ab,ab) exercises a merge whose operands are merged
    // tokens; the singleton word exercises the 2-symbol floor
    val merges = Seq(("s", "s"), ("ss", "ss"), ("a", "b"), ("ab", "ab"))
    val got = applyOn(words, merges)
    for (w <- words)
      assert(got(w) == seqApply(w, merges).mkString(" "),
        s"word '$w': got '${got(w)}', want '${seqApply(w, merges).mkString(" ")}'")
    assert(got("ssss") == "ssss </w>")
    assert(got("sssss") == "ssss s </w>")
    assert(got("abab") == "abab </w>")
  }

  test("property: fold-based apply equals the sequential Sennrich loop") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // tiny alphabet forces dense repeats — the case where a greedy fold
    // and a naive replace diverge; merge operands drawn from the small
    // closure {a, b, aa, ab, ba, bb, </w>} so merges actually fire and
    // chain onto each other's outputs
    val sym = Gen.oneOf("a", "b", "aa", "ab", "ba", "bb", "</w>")
    val gen = for {
      nw <- Gen.choose(1, 12)
      words <- Gen.listOfN(nw,
        Gen.choose(1, 8).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString)))
      nm <- Gen.choose(0, 6)
      merges <- Gen.listOfN(nm, Gen.zip(sym, sym))
    } yield (words.distinct, merges)
    val prop = Prop.forAll(gen) { case (words, merges) =>
      val got = applyOn(words, merges)
      words.forall(w => got(w) == seqApply(w, merges).mkString(" "))
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("q283 token totals reconcile with q258's fertility accounting") {
    val sf = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions.sum
    val enc = graft.SparkEntry.queries("q283_bpe_encode")(spark, sf)
      .agg(sum(col("n_tokens")), sum(col("n_words"))).collect()(0)
    val fert = graft.SparkEntry.queries("q258_bpe_fertility")(spark, sf)
      .agg(sum(col("n_bpe_tokens")), sum(col("n_words"))).collect()(0)
    assert(enc.getLong(0) == fert.getLong(0),
      s"emitted token total ${enc.getLong(0)} != fertility accounting ${fert.getLong(0)}")
    assert(enc.getLong(1) == fert.getLong(1),
      s"word totals diverge: ${enc.getLong(1)} vs ${fert.getLong(1)}")
  }

  test("apply under training's merges reproduces training's vocab state") {
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("w", "cnt").localCheckpoint()
    val (learned, vocab) = TextAnalysis.bpeTrain(wc, 6)
    val trained = vocab.select(col("w"), col("syms"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val applied = applyOn(trained.keys.toSeq,
      learned.map { case (_, l, r, _) => (l, r) })
    assert(applied == trained, s"applied $applied != trained $trained")
  }
}
