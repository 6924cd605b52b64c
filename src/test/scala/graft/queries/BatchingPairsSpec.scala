package graft.queries

import graft.SparkSpec

/** Fixture pins for q125/q126 edges the sf corpora don't isolate:
  * the partial trailing batch's padding math, and the q126 rule that a
  * view→click adjacency across a SESSION boundary must not pair.
  */
class BatchingPairsSpec extends SparkSpec {
  import spark.implicits._

  test("length batching: partial batch, per-band isolation, exact pad math") {
    // 10 docs of 16-31 tokens (band 1), 3 docs of 33 tokens (band 2):
    // band 1 packs one full batch of 8 + one partial of 2; band 2 one
    // partial of 3 with zero padding (all lengths equal).
    val docs = ((0 until 10).map(i => (i.toLong, Seq.fill(16 + i)("w").mkString(" "))) ++
      (10 until 13).map(i => (i.toLong, Seq.fill(33)("x").mkString(" "))))
      .toDF("doc_id", "text")
    val got = Batching.packedBatchesOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == Set((1L, 0L), (1L, 1L), (2L, 0L)), s"got ${got.keySet}")
    val (n0, _, _, _) = got((1L, 0L))
    val (n1, _, _, _) = got((1L, 1L))
    assert(n0 == 8L && n1 == 2L)
    // zero-pad batch: every member the same length
    val (n2, mx2, sm2, pad2) = got((2L, 0L))
    assert(n2 == 3L && mx2 == 33L && sm2 == 99L && pad2 == 0L)
    // pad formula check on the full batch: (8*max - sum) * 2^20 div (8*max)
    val (_, mx0, sm0, pad0) = got((1L, 0L))
    assert(pad0 == (8 * mx0 - sm0) * Batching.FpScale / (8 * mx0))
    // band membership is by n_toks div 16, so bands never mix
    assert(!got.keySet.exists(_._1 > 2L))
  }

  test("serpentine shard striping balances a linear size ramp exactly") {
    // sizes 31..16 over 16 docs, 8 shards: block 0 assigns ranks 1-8 to
    // shards 0..7, block 1 reverses — every shard totals 47 tokens
    val docs = (0 until 16).map(i => (i.toLong, Seq.fill(31 - i)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Batching.shardAssignOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L until 8L), s"got $got")
    assert(got.forall(_._2 == 2L), s"doc counts uneven: ${got.toSeq}")
    assert(got.forall(_._3 == 47L), s"token sums uneven: ${got.toSeq}")
  }

  test("turn pairs: adjacency never crosses a session boundary") {
    val gap = 1800000L
    val ev = Seq(
      // session 1: view->click adjacent (pairs), then click (no lead pair)
      (1L, 0L, 10L, "view"), (1L, 1000L, 11L, "click"), (1L, 2000L, 12L, "click"),
      // view at end of session 1; click opens session 2 -> must NOT pair
      (1L, 3000L, 13L, "view"), (1L, 3000L + gap + 1L, 14L, "click"),
      // session 2 continues: view then view (wrong response role -> no pair)
      (1L, 3000L + gap + 2000L, 15L, "view"), (1L, 3000L + gap + 3000L, 16L, "view"),
      // other user: interleaved timestamps must not cross users
      (2L, 500L, 20L, "view"), (2L, 1500L, 21L, "click"))
      .toDF("user_id", "ts_ms", "event_id", "event_type")
    val got = EventWindows.turnPairsOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSet == Set((1L, 10L, 11L, 1000L), (2L, 20L, 21L, 1000L)),
      s"got ${got.toSeq}")
  }

  test("streaming turn pairs match batch q126 across micro-batch splits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val gap = 1800000L
    val events = Seq(
      (1L, 0L, 10L, "view"), (1L, 1000L, 11L, "click"), (1L, 2000L, 12L, "click"),
      (1L, 3000L, 13L, "view"), (1L, 3000L + gap + 1L, 14L, "click"),
      (1L, 3000L + gap + 2000L, 15L, "view"), (1L, 3000L + gap + 3000L, 16L, "click"),
      (2L, 500L, 20L, "view"), (2L, 1500L, 21L, "click"))
    val batch = EventWindows.turnPairsOf(
        events.toDF("user_id", "ts_ms", "event_id", "event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val in = MemoryStream[(Long, Long, Long, String)]
    val out = graft.streaming.StatefulStreams.streamingTurnPairs(
      in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type"))
    val q = out.toDF().writeStream.format("memory").queryName("turn_stream")
      .outputMode("append").start()
    try {
      // split mid-session AND mid-pair: the view (13) arrives one batch
      // before its non-pairing cross-session click (14), and the view
      // (15) one batch before its pairing click (16)
      val (b1, b2) = events.splitAt(4)
      val (b2a, b2b) = b2.splitAt(2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2a); q.processAllAvailable()
      in.addData(b2b); q.processAllAvailable()
      val got = spark.table("turn_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(got == batch, s"stream $got != batch $batch")
    } finally q.stop()
  }
}
