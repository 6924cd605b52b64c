package graft.queries

import graft.SparkSpec

/** Pins the q271 production deployment shape: train offline (fitOf on
  * a static corpus), score arrivals online. The streaming scores must
  * be BIT-EQUAL to the batch scores on the same rows — same features,
  * same softsign link, same fixed-point weights — and the stream must
  * report zero stateful operators (it is a pure append projection
  * against the broadcast weight frame).
  */
class QualityScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  // a mix of gate-passing and gate-violating docs (the q113 band is
  // 20..90 words, mean word length 4.2..10.0, needs every stopword)
  private val fixture: Seq[(Long, String)] = {
    val stops = Filtering.Stopwords.mkString(" ")
    Seq(
      1L -> (stops + " " + (1 to 40).map(i => s"word$i").mkString(" ")),
      2L -> "too short by far",
      3L -> (stops + " " + Seq.fill(60)("dup").mkString(" ")),
      4L -> (1 to 50).map(i => s"nostops$i").mkString(" "),
      5L -> (stops + " " + (1 to 30).map(i => s"mixed$i extra").mkString(" ")))
  }

  test("stream scores are bit-equal to batch scores, with zero state rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val static = fixture.toDF("doc_id", "text")
    val w = Classifier.fitOf(
      Classifier.featureFrameOf(static).localCheckpoint(), rounds = 6)
    val batch = Classifier.scoredOf(static, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the fit must be non-degenerate for the pin to mean anything
    assert(batch.map(_._3).size > 1, s"all scores equal: $batch")

    val in = MemoryStream[(Long, String)]
    val q = Classifier.streamingQualityScores(
      in.toDF().toDF("doc_id", "text"), w)
      .writeStream.format("memory").queryName("qscore_stream")
      .outputMode("append").start()
    try {
      in.addData(fixture)
      q.processAllAvailable()
      val got = spark.table("qscore_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batch, s"stream $got != batch $batch")
      val state = q.lastProgress.stateOperators
      assert(state == null || state.isEmpty,
        s"scorer must be stateless, found ${state.length} state operators")
    } finally q.stop()
  }
}
