package graft.queries

import graft.SparkSpec

/** Property tests: the distributed triangle core against brute-force
  * enumeration on random graphs, and the distributed priority sample
  * against its sequential definition on random weights.
  */
class TrianglePropertySpec extends SparkSpec {
  import spark.implicits._

  test("property: triangle stats equal brute force on random graphs") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(2, 12)
      m <- Gen.choose(0, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield es.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct
    val prop = Prop.forAll(gen) { edges =>
      edges.isEmpty || {
        val got = Graph.triangleStatsOf(edges.toDF("a", "b"), topN = 100)
          .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        val eset = edges.toSet
        def adj(u: Long, v: Long) = eset.contains((math.min(u, v), math.max(u, v)))
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val deg = nodes.map(v => v -> edges.count(e => e._1 == v || e._2 == v).toLong).toMap
        val triOf = nodes.map { v =>
          val nb = nodes.filter(u => u != v && adj(u, v))
          v -> (for {
            i <- nb.indices; j <- (i + 1) until nb.length
            if adj(nb(i), nb(j))
          } yield 1).size.toLong
        }.toMap
        nodes.forall { v =>
          val (d, nt, lcc) = got(v)
          d == deg(v) && nt == triOf(v) &&
            lcc == (if (d > 1) 2 * nt * Graph.LccScale / (d * (d - 1)) else 0L)
        }
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: priority sample equals the sequential definition") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val gen = for {
      n <- Gen.choose(3, 20)
      ws <- Gen.listOfN(n, Gen.choose(0L, 100000L)) // 0 exercises the w>=1 clamp
      k <- Gen.choose(1, n - 1)
    } yield (ws.zipWithIndex.map { case (w, i) => (i.toLong, w) }, k)
    val prop = Prop.forAll(gen) { case (docs, k) =>
      val pri = docs.map { case (id, w0) =>
        val w = math.max(w0, 1L)
        (id, w, w.toDouble * 1.152921504606846976e18 / (h60(s"pri$id") + 1L).toDouble)
      }.sortBy { case (id, _, p) => (-p, id) }
      val tau = pri(k)._3
      val expect = pri.take(k).map { case (id, w, p) =>
        (id, w, p, math.max(w.toDouble, tau))
      }
      val got = Sampling.prioritySampleOf(docs.toDF("doc_id", "n_chars"), k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      got.toSeq == expect
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
