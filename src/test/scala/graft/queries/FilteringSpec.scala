package graft.queries

import graft.SparkSpec

/** Pins every branch of the q120 drop-reason attribution — the sf
  * corpora only exercise benchmark/blocklist/rules/keep (the blocklist
  * fires before the dup and contamination gates on that data), so the
  * duplicate and contaminated branches are fixture-pinned here.
  */
class FilteringSpec extends SparkSpec {
  import spark.implicits._

  // 22 words, all >= 6 chars except the required stopwords "the a":
  // passes the word-count band (20..90), the mean-length band
  // (4.2..10.0), the stopword rule, and the repetition cap.
  private val t0 = "planet orbits galaxy nebula quasar photon proton neutron " +
    "lepton hadron plasma cosmos meteor copper silver golden helium carbon " +
    "oxygen sodium the a"
  private val t1 = "violet maroon indigo crimson scarlet amber bronze marble " +
    "granite basalt quartz garnet topaz jasper coral pearl ivory cotton " +
    "linen velvet the a"

  test("drop-reason attribution hits every gate in pipeline order") {
    val docs = Seq(
      (0L, t0), // doc_id % 97 == 0 -> benchmark slice
      (1L, t1), // passes everything -> keep
      (2L, t1 + " slow"), // blocklisted term -> blocklist (before dup!)
      (3L, "short text only"), // under MinWords -> rules
      (4L, t1), // same fingerprint as doc 1, min-id loses -> duplicate
      (5L, t0 + " extra trailing words here")) // >=50% of 5-grams in benchmark
      .toDF("doc_id", "text")
    val got = Filtering.dropReasonsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(0L -> "benchmark", 1L -> "keep", 2L -> "blocklist",
      3L -> "rules", 4L -> "duplicate", 5L -> "contaminated"), s"got $got")
  }
}
