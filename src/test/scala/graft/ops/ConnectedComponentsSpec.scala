package graft.ops

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("pointer jumping converges on a 500-node chain within 20 iterations") {
    // plain min-label propagation would need ~500 rounds here; the
    // label-of-label jump halves path lengths per round -> ~9 rounds
    val edges = (0L until 499L).map(i => (i, i + 1))
    // minLabelWithRounds is the distributed loop directly — minLabel
    // would take the size-gated local fast path for a graph this small
    val (df, _) = ConnectedComponents.minLabelWithRounds(edges.toDF("a", "b"))
    val got = df.collect()
    assert(got.length == 500)
    assert(got.forall(_.getLong(1) == 0L), "chain did not fully converge")
  }

  test("size-gated local fast path equals the distributed loop") {
    val rnd = new scala.util.Random(41)
    val edges = (1 to 300).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter { case (a, b) => a != b }.toDF("a", "b")
    val local = ConnectedComponents.minLabel(edges) // < LocalMaxEdges -> local
    val (dist, _) = ConnectedComponents.minLabelWithRounds(edges)
    val l = local.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d = dist.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(l == d, s"local/distributed divergence: ${(l diff d) ++ (d diff l)}")
  }

  test("escalating jumps converge a deep chain in fewer rounds") {
    // 2000-node chain: the extreme-diameter regime. With escalation
    // disabled (escalateAfter past maxIter) pointer jumping needs its
    // full ~log2(d) rounds; with the escape hatch the jump count
    // doubles per round past round 4, so label paths shrink by 2^jumps
    // per round and the loop converges strictly earlier. Labels must be
    // identical either way.
    val edges = (0L until 1999L).map(i => (i, i + 1)).toDF("a", "b")
    val (plainDf, plainRounds) =
      ConnectedComponents.minLabelWithRounds(edges, maxIter = 30, escalateAfter = 1000)
    val (escDf, escRounds) =
      ConnectedComponents.minLabelWithRounds(edges, maxIter = 30, escalateAfter = 4)
    assert(plainDf.collect().forall(_.getLong(1) == 0L))
    assert(escDf.collect().forall(_.getLong(1) == 0L))
    assert(escRounds < plainRounds,
      s"escalation did not reduce rounds: $escRounds vs $plainRounds")
  }

  test("escalation from round 0 is exponent-clamped, not shift-wrapped") {
    // escalateAfter = 0 drives the jump-count formula hardest: the
    // exponent i+1 must clamp at 3 (8 jumps) instead of feeding a raw
    // Int shift that goes negative/wraps past i = 30 — labels must
    // still be exactly the component minimum
    val edges = (0L until 299L).map(i => (i, i + 1)).toDF("a", "b")
    val (df, rounds) =
      ConnectedComponents.minLabelWithRounds(edges, maxIter = 40, escalateAfter = 0)
    assert(df.collect().forall(_.getLong(1) == 0L))
    assert(rounds <= 5, s"8-jump rounds should converge a 300-chain fast, took $rounds")
  }

  test("min-label propagation equals union-find on a random graph") {
    val rnd = new scala.util.Random(17)
    val edges = (1 to 200).map(_ => (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val got = ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = unionFind(edges)
    assert(got == want)
  }

  test("chain graph converges (worst-case diameter)") {
    val edges = (1L until 15L).map(i => (i, i + 1))
    val got = ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == (1L to 15L).map(_ -> 1L).toMap)
  }
}
