package graft.queries

import graft.SparkSpec

/** Fixture pins for the round-11 additions: TA top-k stop depth
  * (q229), common-neighbor link prediction (q230), interval-overlap
  * co-presence (q231), and SAX motif words (q232). Each core is exact
  * integer arithmetic, so every assertion is equality against a
  * hand-computed value.
  */
class RoundElevenSpec extends SparkSpec {
  import spark.implicits._

  test("TA top-k: certified stop depth on a hand-traced 5-item fixture") {
    // lists sorted desc:  s1: 1(10) 2(9) 3(8) 5(2) 4(1)
    //                     s2: 3(10) 4(9) 5(8) 2(2) 1(1)
    // combined: 1→11 2→11 3→18 4→10 5→10; top-2 = (3,18) then (1,11)
    // T(d) = 20, 18, 16, 4 → first depth with kbest(=11) ≥ T is d=4
    val scored = Seq(
      (1L, 10L, 1L), (2L, 9L, 2L), (3L, 8L, 10L), (4L, 1L, 9L), (5L, 2L, 8L))
      .toDF("doc_id", "s1", "s2")
    val got = Retrieval.taTopkOf(scored, k = 2, depthCap = 5).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((3L, 18L, 4L, 4L), (1L, 11L, 4L, 4L)), s"got ${got.toSeq}")
  }

  test("TA top-k: no certified stop within cap yields an empty audit frame") {
    // anti-correlated lists: combined is flat, threshold never falls
    // below the k-th best within a cap of 1
    val scored = Seq((1L, 10L, 1L), (2L, 1L, 10L), (3L, 5L, 5L))
      .toDF("doc_id", "s1", "s2")
    assert(Retrieval.taTopkOf(scored, k = 2, depthCap = 1).count() == 0L)
  }

  test("link prediction: wedge counts, Jaccard, RA and the hub gate") {
    // cust A={p1,p2}, B={p1,p2,p3}; hub part p9 shared by all four
    // custs is dropped by cap=3, so C and D (p9-only) never pair
    val edges = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L))
      .toDF("cust", "part")
    val got = Graph.linkPredictOf(edges, hubCap = 3L, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // deg includes the hub edge (degree is a property of the customer,
    // the gate only prunes pair GENERATION): deg_a=3, deg_b=4, cn=2
    // jaccard = 2·2^20 DIV 5; ra = 2^20/2 + 2^20/2 (p1, p2 both deg 2)
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 3L, 4L, 2L * 1048576L / 5L, 1048576L)), s"got ${got.toSeq}")
  }

  test("session overlap: cross-slice dedup, touching intervals, disjoint users") {
    val day = 86400000L
    // u1 spans 3 slices; u2 overlaps it inside slice 1 (counted once);
    // u3 touches u1's end exactly (0-ms co-presence); u4 disjoint
    val sess = Seq(
      (1L, 0L, 3L * day), (2L, day, day + 3600000L),
      (3L, 3L * day, 3L * day + 10L), (4L, 10L * day, 11L * day))
      .toDF("user_id", "st", "en")
    val got = Frontier.sessionOverlapOf(sess, day, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 2L, 1L, 3600000L), (1L, 3L, 1L, 0L)),
      s"got ${got.toSeq}")
  }

  test("rendezvous rebalance: movers relocate ONLY to the new shard") {
    val owners = Maintenance.rendezvousOwnersOf((1L to 400L).toDF("doc_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val moved = owners.filter { case (b, a) => b != a }
    // the HRW property: a resize from n to n+1 shards can only move a
    // key if the NEW shard wins it
    assert(moved.forall(_._2 == Maintenance.RvAfter - 1L), s"bad movers ${moved.toSeq}")
    // expected movement ~1/9 of 400 ≈ 44; generous band for hash luck
    assert(moved.length > 10 && moved.length < 120, s"moved ${moved.length}")
    // owners cover the ring (no dead shard on 400 keys)
    assert(owners.map(_._1).distinct.length == Maintenance.RvBefore)
  }

  test("postings bytes: hand-computed gaps, varint sizes and savings") {
    // term t at docs [0, 5, 133]: gaps 0,5,128 -> 1+1+2 varint bytes
    val posts = Seq((0L, "t"), (5L, "t"), (133L, "t"), (7L, "u"))
      .toDF("doc_id", "term")
    val got = IndexHealth.postingsBytesOf(posts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("t", 3L, 24L, 4L, 20L * 1048576L / 24L),
      ("u", 1L, 8L, 1L, 7L * 1048576L / 8L)), s"got ${got.toSeq}")
  }

  test("greedy coverage: submodular picks with doc_id tiebreak") {
    // d1 {1,2,3} first; then d2 {3,4} and d3 {5} both add 1 -> d2 wins
    val sh = Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(3L, 4L)), (3L, Seq(5L)))
      .toDF("doc_id", "sh")
    val got = TextAnalysis.greedyCoverageOf(sh, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 1L, 3L, 3L), (2L, 2L, 1L, 4L), (3L, 3L, 1L, 5L)),
      s"got ${got.toSeq}")
  }

  test("IBLT reconcile: decodes an asymmetric diff exactly from sketches") {
    // A = 1..300; B drops 50,150,250 and adds 901,902 — the decode
    // must recover all five with the right sides, from cells alone
    val a = (1L to 300L).toDF("doc_id")
    val b = ((1L to 300L).filterNot(Set(50L, 150L, 250L)) ++ Seq(901L, 902L))
      .toDF("doc_id")
    val got = Maintenance.ibltReconcileOf(a, b).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a_only", 50L), ("a_only", 150L), ("a_only", 250L),
      ("b_only", 901L), ("b_only", 902L)), s"got ${got.toSeq}")
  }

  test("IBLT reconcile: identical replicas decode to an empty diff") {
    val a = (1L to 100L).toDF("doc_id")
    assert(Maintenance.ibltReconcileOf(a, a).count() == 0L)
  }

  test("IBLT reconcile: over-capacity diff fails loudly, never partially") {
    // a diff of 2000 ids >> the 3x171-cell sketch capacity (~340):
    // peeling must stall and the decode must throw the resize-and-
    // resend error instead of returning whatever subset peeled
    val a = (1L to 4000L).toDF("doc_id")
    val b = (2001L to 4000L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Maintenance.ibltReconcileOf(a, b).count()
    }
    assert(e.getMessage.contains("IBLT peel stalled"), s"got $e")
  }

  test("text tiling: orthogonal blocks cut, repeated blocks don't") {
    // doc 1: 20 'a' then 20 'b' -> dot 0, cos2 0 -> cut
    // doc 2: 40 'a'            -> cos2 = 2^20 -> no cut
    // doc 3: 39 tokens         -> one complete block, excluded
    val docs = Seq(
      (1L, Seq.fill(20)("a") ++ Seq.fill(20)("b")),
      (2L, Seq.fill(40)("a")),
      (3L, Seq.fill(39)("x"))).toDF("doc_id", "toks")
    val got = TextAnalysis.textTilingOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 2L, 1L, 2L, 0L), (2L, 2L, 0L, 1L, 1048576L)), s"got ${got.toSeq}")
  }

  test("HLL merge property: union registers equal pairwise register max") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFns.hash60
    val a = (1L to 400L).map(i => ("a", i)).toDF("g", "v")
    val b = (200L to 600L).map(i => ("b", i)).toDF("g", "v")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegistersOf(df, "g", hash60(col("v").cast("string")))
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val ra = regs(a); val rb = regs(b)
    val ru = regs(a.unionAll(b).withColumn("g", lit("u")))
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
    assert(ru == merged)
  }

  test("survival hazard: hand-computed risk table with censoring") {
    // subjects: convert@0, censor@0, convert@2, censor@3
    val subj = Seq((0L, 1L), (0L, 0L), (2L, 1L), (3L, 0L)).toDF("k_end", "is_event")
    val got = Signals.survivalHazardOf(subj).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 1L, 262144L, 1L), (1L, 2L, 0L, 0L, 0L, 1L),
      (2L, 2L, 1L, 0L, 524288L, 2L), (3L, 1L, 0L, 1L, 0L, 2L)),
      s"got ${got.toSeq}")
  }

  test("chunk dedup: duplicated documents halve per-source unique bytes") {
    graft.functions.GraftFunctions.register(spark)
    val txt = "the quick brown fox jumps over the lazy dog again and again " * 4
    val docs = Seq((1L, "s1", txt), (2L, "s1", txt),
      (3L, "s2", "completely different content with its own words entirely " * 4))
      .toDF("doc_id", "source", "text")
    val got = Corpus.chunkDedupOf(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val (n1, d1, t1, u1) = got("s1")
    // two identical docs: every chunk occurs an even number of times
    assert(n1 == 2 * d1 && t1 == 2 * u1, s"s1 $got")
    val (_, _, t2, u2) = got("s2")
    val (_, _, ta, ua) = got("ALL")
    assert(ta == t1 + t2)
    assert(ua <= u1 + u2 && ua > 0)
  }

  test("prefix cache: shared prefixes count as hits per depth") {
    val base = (1 to 16).map(i => s"w$i")
    val docs = Seq(
      (1L, base), (2L, base.take(8) ++ (1 to 8).map(i => s"x$i")),
      (3L, (1 to 16).map(i => s"z$i")))
      .toDF("doc_id", "toks")
    val got = Batching.prefixCacheOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(got.toSeq == Seq(
      (4L, 3L, 2L, 1L, 2L), (8L, 3L, 2L, 1L, 2L), (16L, 3L, 3L, 0L, 1L)),
      s"got ${got.toSeq}")
  }

  test("context planner: hand-computed token economics at three lengths") {
    val lens = Seq(10L, 20L, 40L).toDF("n")
    val got = Batching.contextPlannerOf(lens).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(4), r.getLong(5)))
    // (ctx, n_trunc, tokens_lost, tokens_kept)
    assert(got.toSeq == Seq((16L, 2L, 28L, 42L), (32L, 1L, 8L, 62L),
      (64L, 0L, 0L, 70L)), s"got ${got.toSeq}")
  }

  test("sequence gaps: isolated and block gaps across range partitions") {
    // ids 0..999 minus {5} minus [300, 399]
    val ids = (0L to 999L).filterNot(i => i == 5L || (i >= 300L && i <= 399L))
      .toDF("id")
    val got = Maintenance.sequenceGapsOf(ids).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((5L, 5L, 1L), (300L, 399L, 100L)), s"got ${got.toSeq}")
  }

  test("sequence gaps: a dense sequence reports none") {
    assert(Maintenance.sequenceGapsOf((0L to 500L).toDF("id")).count() == 0L)
  }

  test("SAX motifs: rank-quartile symbols over a two-day series") {
    // day 0 segment sums (1,2,3,4), day 1 (5,6,7,8): ranks 1..8 over
    // the 8 segments → symbols aabb / ccdd
    val counts = (0 until 8).map(seg => ((seg / 4) * 24L + (seg % 4) * 6L, seg + 1L))
      .toDF("hr", "n")
    val got = Signals.saxMotifsOf(counts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("aabb", 1L, 0L, 0L), ("ccdd", 1L, 1L, 1L)),
      s"got ${got.toSeq}")
  }

  test("SAX motifs: a zero-filled gap day gets the all-low word") {
    // events on days 0, 2, 3 (equal counts); day 1 is a full gap.
    // 16 segments: the gap's 4 zeros rank 1-4 → all 'a'; the twelve
    // 9s rank 5-16 in (day, seg) order → bbbb / cccc / dddd
    val counts = Seq(0L, 2L, 3L).flatMap(day =>
      (0 until 4).map(seg => (day * 24L + seg * 6L, 9L))).toDF("hr", "n")
    val got = Signals.saxMotifsOf(counts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq.sortBy(_._1) == Seq(
      ("aaaa", 1L, 1L), ("bbbb", 1L, 0L), ("cccc", 1L, 2L), ("dddd", 1L, 3L)),
      s"got ${got.toSeq}")
  }
}
