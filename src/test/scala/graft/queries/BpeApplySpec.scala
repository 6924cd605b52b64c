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
    TextAnalysis.bpeApplyExpr(words.toDF("w"), merges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  private def applyTableOn(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, String] =
    TextAnalysis.bpeApplyTable(words.toDF("w"), merges)
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

  test("property: data-driven table apply equals the sequential loop") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // same generator as the expression-path property — duplicates in
    // the merge list are likely at this density, pinning the
    // fire-at-every-rank duplicate handling of encodeWordSyms
    val sym = Gen.oneOf("a", "b", "aa", "ab", "ba", "bb", "</w>")
    val gen = for {
      nw <- Gen.choose(1, 12)
      words <- Gen.listOfN(nw,
        Gen.choose(1, 8).flatMap(n =>
          Gen.listOfN(n, Gen.oneOf("a", "b")).map(_.mkString)))
      nm <- Gen.choose(0, 8)
      merges <- Gen.listOfN(nm, Gen.zip(sym, sym))
    } yield (words.distinct, merges)
    val prop = Prop.forAll(gen) { case (words, merges) =>
      val got = applyTableOn(words, merges)
      words.forall(w => got(w) == seqApply(w, merges).mkString(" "))
    }
    val res = check(Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("table apply: passthrough columns ride through, fixtures agree") {
    val merges = Seq(("s", "s"), ("ss", "ss"), ("a", "b"), ("ab", "ab"))
    val words = Seq(("ssss", 7L), ("sssss", 1L), ("abab", 2L), ("a", 3L))
    val got = TextAnalysis.bpeApplyTable(
        words.toDF("w", "cnt"), merges)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    for ((w, cnt) <- words)
      assert(got(w) == ((cnt, seqApply(w, merges).mkString(" "))),
        s"word '$w': got ${got(w)}")
  }

  test("table apply: NULL word yields NULL syms, as the expression fold does") {
    val merges = Seq(("a", "b"))
    val rows = Seq(Some("ab"), None, Some("ba"))
    val viaExpr = TextAnalysis.bpeApplyExpr(rows.toDF("w"), merges)
      .collect().map(r => Option(r.getString(0)) -> Option(r.getString(1))).toSet
    val viaTable = TextAnalysis.bpeApplyTable(rows.toDF("w"), merges)
      .collect().map(r => Option(r.getString(0)) -> Option(r.getString(1))).toSet
    assert(viaTable == viaExpr, s"$viaTable != $viaExpr")
    assert(viaTable.contains(None -> None))
  }

  test("bpeApply dispatches to the table path above ExprFoldMaxMerges") {
    val small = Seq.fill(TextAnalysis.ExprFoldMaxMerges)(("a", "b"))
    val large = small :+ (("b", "a"))
    val planSmall = TextAnalysis.bpeApply(Seq("ab").toDF("w"), small)
      .queryExecution.executedPlan.toString
    val planLarge = TextAnalysis.bpeApply(Seq("ab").toDF("w"), large)
      .queryExecution.executedPlan.toString
    assert(!planSmall.contains("MapPartitions"), "small table must codegen")
    assert(planLarge.contains("MapPartitions"),
      "large table must take the data-driven path")
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

  test("q285 manifest reconciles with q283: per-copy counts, digests, " +
      "and contiguous per-source packing") {
    val sf = "/root/testdata/sf0.001"
    val pack = graft.SparkEntry.queries("q285_tokenize_pack")(spark, sf)
      .collect()
    val q283rows = graft.SparkEntry.queries("q283_bpe_encode")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(4))).toMap
    // every copy carries its doc's exact q283 token count and digest
    pack.foreach { r =>
      val (doc, n, h) = (r.getLong(3), r.getLong(5), r.getLong(9))
      assert(q283rows(doc) == ((n, h)),
        s"doc $doc: manifest ($n, $h) != q283 ${q283rows(doc)}")
    }
    // the rep_idx=0 slice is exactly the q283 corpus (each doc packed
    // at least once), so first-copy token totals reconcile
    val firstCopies = pack.filter(_.getLong(4) == 0L)
    assert(firstCopies.length == q283rows.size)
    assert(firstCopies.map(_.getLong(5)).sum == q283rows.values.map(_._1).sum)
    // packing invariant per source: cum is the prefix sum over k, and
    // (seq_no, seq_offset) is exactly the PackBudget chop of it; the
    // vt interleave key is k/n_copies — ends exactly at 1.0 per source
    pack.groupBy(_.getString(0)).foreach { case (src, rows) =>
      var cum = 0L
      val ordered = rows.sortBy(_.getLong(1))
      ordered.foreach { r =>
        assert(r.getLong(6) == cum + r.getLong(5), s"$src k=${r.getLong(1)} cum")
        assert(r.getLong(7) == cum / Sampling.PackBudget &&
            r.getLong(8) == cum % Sampling.PackBudget,
          s"$src k=${r.getLong(1)} chop")
        assert(r.getDouble(2) == r.getLong(1).toDouble / ordered.length,
          s"$src k=${r.getLong(1)} vt")
        cum += r.getLong(5)
      }
      assert(ordered.last.getDouble(2) == 1.0, s"$src vt must end at 1.0")
    }
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

  test("q286's shipped table is production-sized and the table-path encode " +
      "of it agrees with the sequential replay") {
    val sf = "/root/testdata/sf0.001"
    // the r16 coverage gap: every registered query crossed bpeApply's
    // dispatch at BpeRounds = 6, so the production bpeApplyTable path
    // never passed the oracle gate. q286 closes it; this spec pins the
    // two facts the oracle row rests on. (The registered plan itself
    // cannot be string-asserted: enc is localCheckpoint'd — two
    // consumers — so the mapPartitions encoder runs eagerly and the
    // final plan reads the checkpoint.)
    val wc = graft.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFns.tokens(col("text"))).as("w"))
      .groupBy(col("w"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .localCheckpoint()
    // fact 1: the corpus-derived table is beyond the dispatch ceiling
    // at EVERY test SF (even the smallest corpus), so whether q286
    // calls bpeApplyTable directly (today) or through bpeApply's
    // dispatcher (a refactor), the table path is what runs
    val merges = TextAnalysis.shippedMergeTable(wc)
    assert(merges.size > TextAnalysis.ExprFoldMaxMerges,
      s"sf0.001 shipped table has ${merges.size} ranks — dispatch not exercised")
    // fact 2: the table-path encode of the REAL corpus-derived table
    // (single-char ranks, rank-order adjacency destruction) equals the
    // sequential Sennrich replay, word for word, on a corpus sample —
    // the property BpeApplySpec pins elsewhere only on random tables
    val sample = wc.select(col("w")).limit(64)
    val got = TextAnalysis.bpeApplyTable(sample, merges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    got.foreach { case (w, syms) =>
      assert(syms == seqApply(w, merges).mkString(" "), s"word '$w'")
    }
    assert(got.size == 64 || got.size == wc.count().toInt)
  }
}
