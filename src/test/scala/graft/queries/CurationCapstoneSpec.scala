package graft.queries

import graft.SparkSpec

/** q282 end-to-end pin on a planted corpus where every stage's outcome
  * is derivable by hand: a fluent domain that is ONE 16-member
  * duplicate family (identical texts) and a gibberish domain of 16
  * unique documents. The learned mixture must keep all of the hard
  * (gibberish) domain and thin the fluent one; the survivors' dup
  * family must land in exactly one cluster, hence one (split, source)
  * cell; and the whole report must equal a first-principles fold
  * (test-side md5 for both the resample verdict and the split bucket).
  */
class CurationCapstoneSpec extends SparkSpec {
  import spark.implicits._

  private val S = Fluency.FpScale

  import TestFolds.{md5hash60, splitOf}

  private val fluent = "the cat sat on the mat and the dog sat on the rug " * 4

  private def rows: Seq[(Long, String, String, String)] =
    (0L until 32L).map { i =>
      if (i % 2 == 0) (i, "en", "web", fluent)
      else (i, "xx", "spam",
        (0 until 40).map(j => s"zx${i}q${j * 7}v").mkString(" "))
    }

  private def docs = rows.toDF("doc_id", "lang", "source", "text")
    .withColumn("n_chars",
      org.apache.spark.sql.functions.length($"text").cast("long"))

  test("q282 equals the first-principles fold; hard domain kept whole, family unsplit") {
    val d = docs.cache()
    // keep probabilities from the production derivation (pinned by
    // MixtureSpec); verdicts and buckets recomputed test-side
    val p = Mixture.keepProbsOf(Mixture.mixtureOf(d)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = rows.filter { case (id, _, src, _) =>
      md5hash60(Mixture.ResampleSeed + id) % S < p(src)
    }
    val keptWeb = kept.filter(_._3 == "web").map(_._1)
    val keptSpam = kept.filter(_._3 == "spam").map(_._1)
    assert(p("spam") == S && keptSpam.size == 16, "hard domain kept whole")
    assert(p("web") < S && keptWeb.size < 16, "easy domain thinned")

    // clusters among survivors: the web family collapses to min kept
    // id; spam docs are singletons
    val cluster: Map[Long, Long] =
      (keptWeb.map(_ -> keptWeb.min) ++ keptSpam.map(i => i -> i)).toMap
    val cells = kept.groupBy { case (id, _, src, _) =>
      (splitOf(cluster(id)), src)
    }
    val byCell = cells.map { case ((sp, src), xs) =>
      (sp, src, xs.size.toLong,
        xs.map(x => cluster(x._1)).distinct.size.toLong,
        xs.map(_._4.length.toLong).sum)
    }.toSeq
    val splitTot = byCell.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expected = byCell.map { case (sp, src, nd, nc, ch) =>
      (sp, src, nd, nc, ch, nd * S / splitTot(sp))
    }.sortBy(r => (r._1, r._2))

    val got = Pipeline.learnedCurationOf(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)

    // the family occupies exactly one cell, and cell shares sum to ~S
    assert(got.count(_._2 == "web") == 1, "the dup family must not split")
    got.groupBy(_._1).foreach { case (sp, cs) =>
      val sum = cs.map(_._6).sum
      assert(sum <= S && sum >= S - cs.size, s"split $sp shares sum to $sum")
    }
    d.unpersist()
  }
}
