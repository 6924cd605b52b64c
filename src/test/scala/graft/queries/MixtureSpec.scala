package graft.queries

import graft.SparkSpec

/** Pins q278's multiplicative-weights chain against a sequential Long
  * fold of the same recurrence (factor, cumulative product with
  * per-step rescale, cross-domain normalization, step average — all
  * truncating integer division on non-negative operands), on a planted
  * two-domain corpus where the direction is known: the gibberish
  * domain under-performs the q122 reference model, accumulates excess
  * loss, and must end UP-weighted — DoReMi's defining behavior.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private val S = Fluency.FpScale
  private val T = Mixture.Steps

  /** 16 fluent en docs (source=web: shared high-frequency bigrams, so
    * they score far above the keep threshold against the reference
    * model they themselves train) and 16 gibberish docs (source=spam,
    * lang=xx: bigrams unseen by the reference, floor score). doc_ids
    * interleave so every MWU step sees both domains.
    */
  private def docs = {
    val fluent = "the cat sat on the mat and the dog sat on the rug " * 4
    (0L until 32L).map { i =>
      if (i % 2 == 0) (i, "en", "web", fluent)
      else (i, "xx", "spam",
        (0 until 40).map(j => s"zx${i}q${j * 7}v").mkString(" "))
    }.toDF("doc_id", "lang", "source", "text")
  }

  test("q278 matches a sequential fold of the MWU recurrence") {
    val d = docs.cache()
    // per-doc deficits from the production scorer (the spec pins the
    // MWU chain, not the q122 scorer — q122 has its own oracle row)
    val perDoc = Fluency.scoredOf(d)
      .join(d.select($"doc_id", $"source"), "doc_id")
      .select($"doc_id", $"source", $"fp_mean")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val deficits = perDoc.map { case (id, src, fp) =>
      (src, id % T, math.max(0L, Fluency.KeepMinFpMean - fp))
    }
    val sources = deficits.map(_._1).distinct.sorted
    val l: Map[String, IndexedSeq[Long]] = sources.map { src =>
      src -> (0 until T).map { t =>
        val cell = deficits.filter(x => x._1 == src && x._2 == t).map(_._3)
        if (cell.isEmpty) 0L else cell.sum / math.max(cell.size, 1L)
      }
    }.toMap
    // the MWU fold: c_t per source, cross-source norms, alphas, average
    val c = scala.collection.mutable.Map[String, IndexedSeq[Long]]()
    sources.foreach { src =>
      val cs = (0 until T).foldLeft(IndexedSeq.empty[Long]) { (acc, t) =>
        val f = S + Mixture.Eta * l(src)(t)
        acc :+ (if (t == 0) f else acc(t - 1) * f / S)
      }
      c(src) = cs
    }
    val norms = (0 until T).map(t => sources.map(src => c(src)(t)).sum)
    val alpha = sources.map { src =>
      src -> (0 until T).map(t => c(src)(t) * S / norms(t))
    }.toMap
    val expected = sources.map { src =>
      val defs = deficits.filter(_._1 == src).map(_._3)
      (src, defs.length.toLong, defs.sum / defs.length,
        alpha(src)(T - 1), alpha(src).sum / T)
    }

    val got = Mixture.mixtureOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected.toSeq)

    // DoReMi direction: the hard (gibberish) domain ends up-weighted,
    // and the per-step normalization holds to truncation
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("spam")._3 > bySrc("web")._3) // mean deficit
    assert(bySrc("spam")._5 > bySrc("web")._5) // avg alpha
    assert(bySrc("spam")._4 > bySrc("web")._4) // final alpha
    val alphaSum = got.map(_._4).sum
    assert(alphaSum <= S && alphaSum >= S - sources.length)
    d.unpersist()
  }

  /** Independent per-doc keep fold: p from the (already pinned) q278
    * output via the same DECIMAL-staged ratio arithmetic, verdicts from
    * a test-side md5. Returns (perDoc kept rows, p by source).
    */
  private def keptFold(d: org.apache.spark.sql.DataFrame)
      : (Seq[(Long, String, Long, Long)], Map[String, Long]) = {
    val mix = Mixture.mixtureOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    val nt = mix.map(_._2).sum
    val ratios = mix.map { case (src, n, a) =>
      src -> (BigInt(a) * nt / n).toLong }.toMap
    val rmax = ratios.values.max
    val p = ratios.map { case (src, r) => src -> r * S / rmax }
    val rows = d.select($"doc_id", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val kept = rows.toSeq.map { case (id, src, nc) =>
      (id, src, nc,
        if (TestFolds.md5hash60(Mixture.ResampleSeed + id) % S < p(src)) 1L else 0L)
    }
    (kept, p)
  }

  test("q280 resample matches an independent fold; up-weighted domain kept whole") {
    val d = docs
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .cache()
    val (kept, p) = keptFold(d)
    val totKept = kept.map(_._4).sum
    val expected = kept.groupBy(_._2).toSeq.sortBy(_._1).map { case (src, rs) =>
      (src, p(src), rs.length.toLong, rs.map(_._4).sum,
        rs.filter(_._4 == 1L).map(_._3).sum,
        rs.map(_._4).sum * S / math.max(totKept, 1L))
    }
    val got = Mixture.resampleOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)

    // DoReMi stage-2 direction: the hard domain is the max-ratio one —
    // keep probability exactly S, so it survives intact; the easy
    // domain thins
    val m = got.map(r => r._1 -> r).toMap
    assert(m("spam")._2 == S && m("spam")._4 == 16L)
    assert(m("web")._2 < S && m("web")._4 < 16L)
    d.unpersist()
  }

  test("resample stream verdicts are bit-equal to batch, with zero state rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlc = spark.sqlContext
    val d = docs
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .cache()
    val (kept, _) = keptFold(d)
    val expected = kept.map { case (id, src, _, k) => (id, src, k) }.toSet

    val probs = Mixture.keepProbsOf(Mixture.mixtureOf(d)).localCheckpoint()
    val in = MemoryStream[(Long, String)]
    val q = Mixture.resampleStream(in.toDF().toDF("doc_id", "source"), probs)
      .writeStream.format("memory").queryName("resample_stream")
      .outputMode("append").start()
    try {
      in.addData(kept.map(r => (r._1, r._2)))
      q.processAllAvailable()
      val got = spark.table("resample_stream").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      assert(got == expected, s"stream $got != batch $expected")
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"resampler must be stateless, found ${state.length} state operators")
    } finally q.stop()
    d.unpersist()
  }
}
