package graft.queries

import graft.SparkSpec

/** Property tests for the order-statistics operators: the distributed
  * prefix-sweep skyline against the quadratic NOT-EXISTS definition,
  * peak concurrency against a sequential sweep, and k-core peeling
  * against sequential round-by-round deletion — all on random inputs.
  */
class FrontierPropertySpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  test("property: skyline equals the quadratic domination definition") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // small value domains force dense x/y ties, the hard case
    val gen = for {
      n <- Gen.choose(1, 40)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0, 6); y <- Gen.choose(0L, 6L)
      } yield (x.toDouble, y))
    } yield pts.distinct
    val prop = Prop.forAll(gen) { pts =>
      val got = Frontier.skylineOf(pts.toDF("x", "y")).collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSet
      val exp = pts.filter { case (x, y) =>
        !pts.exists { case (qx, qy) =>
          qx <= x && qy >= y && (qx < x || qy > y)
        }
      }.toSet
      got == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: peak concurrency equals a sequential sweep") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val h = Frontier.HoldMs
    val gen = for {
      n <- Gen.choose(1, 30)
      // timestamps clustered around multiples of HoldMs to hit the
      // exactly-touching boundary case often
      ts <- Gen.listOfN(n, for {
        m <- Gen.choose(0L, 3L); off <- Gen.oneOf(-1L, 0L, 1L, 7L)
      } yield m * h + off)
      tp <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield tp.zip(ts)
    val prop = Prop.forAll(gen) { ev =>
      val got = Frontier.peakConcurrencyOf(ev.toDF("event_type", "ts_ms"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val exp = ev.groupBy(_._1).map { case (tp, rows) =>
        var active = List.empty[Long] // end times, kept sorted ascending
        var peak = 0L
        rows.map(_._2).sorted.foreach { t =>
          active = active.filter(_ > t) :+ (t + h)
          if (active.size > peak) peak = active.size.toLong
        }
        (tp, peak, rows.size.toLong)
      }.toSet
      got == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: k-core peel equals sequential round-by-round deletion") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      n <- Gen.choose(2, 10)
      m <- Gen.choose(0, 25)
      k <- Gen.choose(1L, 4L)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (es.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.distinct, k)
    val prop = Prop.forAll(gen) { case (edges, k) =>
      edges.isEmpty || {
        val rounds = 3
        val got = Graph.kcorePeelOf(edges.toDF("src", "dst"), k, rounds)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
          .toSeq
        // sequential reference on the undirected edge set
        var e = edges.toSet
        val exp = (1 to rounds).map { r =>
          val deg0 = e.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
          val keep = deg0.filter(_._2 >= k).keySet
          e = e.filter(p => keep(p._1) && keep(p._2))
          val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
            .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
          (r.toLong, deg.size.toLong, e.size.toLong,
            if (deg.isEmpty) 0L else deg.values.min,
            if (deg.isEmpty) 0L else deg.values.max)
        }
        got == exp
      }
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: trimmed-mean row selection equals the sequential trim") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // pin the TRIM SEMANTICS (which rows survive) on integer values —
    // the oracle covers the decimal mean; here the rank arithmetic is
    // the thing under test, including heavy ties
    val gen = for {
      n <- Gen.choose(1, 40)
      vs <- Gen.listOfN(n, Gen.choose(0L, 5L))
    } yield vs
    val prop = Prop.forAll(gen) { vs =>
      val rows = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong, 1L) }
      val df = rows.toDF("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
      val ranked = Sampling.rankDistributed(df, Seq("l_returnflag"),
        Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber")))
      val n = vs.size.toLong
      val t = n / 10
      val kept = ranked.filter(col("rk") > t && col("rk") <= n - t)
        .select("l_orderkey").collect().map(_.getLong(0)).toSet
      val exp = vs.zipWithIndex.sortBy { case (v, i) => (v, i) }
        .slice(t.toInt, (n - t).toInt).map(_._2.toLong).toSet
      kept == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: label propagation equals sequential majority rounds") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    val gen = for {
      np <- Gen.choose(1, 6)
      ns <- Gen.choose(1, 5)
      m <- Gen.choose(1, 15)
      es <- Gen.listOfN(m, for {
        p <- Gen.choose(0, np - 1); sp <- Gen.choose(0, ns - 1)
      } yield (p.toLong, sp.toLong))
      seeds <- Gen.listOfN(ns, Gen.choose(0L, 3L))
    } yield (es.distinct, seeds.zipWithIndex.map { case (l, i) => (i.toLong, l) })
    val prop = Prop.forAll(gen) { case (edges, seeds) =>
      val got = Graph.labelPropagationOf(
        edges.toDF("p", "s"), seeds.toDF("s", "seed"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap

      // sequential reference: majority with min-label tie-break
      def majority(votes: Seq[Long]): Long =
        votes.groupBy(identity).toSeq
          .maxBy { case (l, vs) => (vs.size, -l) }._1
      val seedMap = seeds.toMap
      val plabel = edges.groupBy(_._1).map { case (p, es) =>
        p -> majority(es.map(e => seedMap(e._2)))
      }
      val exp = edges.groupBy(_._2).map { case (sp, es) =>
        sp -> ((seedMap(sp), majority(es.map(e => plabel(e._1)))))
      }
      got == exp
    }
    val res = check(Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
