package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ArrayExprSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L

  test("minhash_sig matches the reference affine-permutation formula") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30).map(_ => Seq.fill(rnd.nextInt(60) + 1)(rnd.nextLong().abs % P))
    val got = rows.toDF("h").select(expr("minhash_sig(h)")).as[Seq[Long]].collect().toSeq
    val want = rows.map { hs =>
      (0 until graft.queries.Dedup.NumHashes).map { j =>
        hs.map(x => ((2L * j + 1) * x + 12345L * j + 6789L) % P).min
      }
    }
    assert(got.map(_.toSeq) == want.map(_.toSeq))
  }

  test("minhash_sig of empty input is all-p sentinel") {
    GraftFunctions.register(spark)
    val got = Seq(Seq.empty[Long]).toDF("h")
      .select(expr("minhash_sig(h)")).as[Seq[Long]].head()
    assert(got == Seq.fill(graft.queries.Dedup.NumHashes)(P))
  }

  test("simhash60 matches the majority-vote reference formula") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(19)
    val rows = (1 to 30).map(_ => Seq.fill(rnd.nextInt(50) + 1)(rnd.nextLong().abs % (1L << 60)))
    val got = rows.toDF("hs").select(expr("simhash60(hs)")).as[Long].collect().toSeq
    val want = rows.map { hs =>
      (0 until 60).map { b =>
        val votes = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) 1L << b else 0L
      }.sum
    }
    assert(got == want)
    // known example from the oracle probe: [5, 12, 5] -> 5
    val known = Seq(Seq(5L, 12L, 5L)).toDF("hs")
      .select(expr("simhash60(hs)")).as[Long].head()
    assert(known == 5L)
  }

  test("rolling_hashes: rolling update equals direct Horner formula") {
    GraftFunctions.register(spark)
    val P = 2147483647L
    def direct(s: String, w: Int): Seq[Long] = {
      val b = s.getBytes("UTF-8")
      if (b.length < w) Seq.empty
      else (0 to b.length - w).map { i =>
        (i until i + w).foldLeft(0L)((acc, j) => (acc * 257 + (b(j) & 0xff)) % P)
      }
    }
    val rnd = new scala.util.Random(23)
    val strs = (1 to 20).map(_ =>
      (0 until rnd.nextInt(80)).map(_ => ('a' + rnd.nextInt(27)).toChar).mkString)
    val got = strs.toDF("s").select(expr("rolling_hashes(s, 16)"))
      .as[Seq[Long]].collect().toSeq
    assert(got.map(_.toSeq) == strs.map(direct(_, 16)))
    // short input -> empty
    assert(Seq("abc").toDF("s").select(expr("rolling_hashes(s, 16)"))
      .as[Seq[Long]].head().isEmpty)
  }

  test("repetition_stats equals the HOF formulation on adversarial token arrays") {
    GraftFunctions.register(spark)
    // reference semantics = the interpreted pipeline q77 used to run:
    // distinct joined-string n-grams and the max single-token count
    def ref(toks: Seq[String]): Seq[Long] = {
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
      val top = if (toks.isEmpty) 0L
        else toks.groupBy(identity).values.map(_.size).max.toLong
      Seq(grams(2).distinct.size.toLong, grams(3).distinct.size.toLong, top)
    }
    // probe-path stress: two DISTINCT tokens whose UTF8String hashes
    // collide under the n=2 table mask (cap 8), so interning must fall
    // through to the byte comparison to keep them apart
    import org.apache.spark.unsafe.types.UTF8String
    def mh(s: String): Int = UTF8String.fromString(s).hashCode & 7
    val pool = (0 until 200).map(i => s"t$i")
    val (ca, cb) = pool.flatMap(a => pool.find(b => b != a && mh(b) == mh(a)).map((a, _))).head
    val rnd = new scala.util.Random(41)
    val tinyVocab = Vector("a", "b", "c") // dense repeats + masked collisions
    val rows: Seq[Seq[String]] =
      Seq(Seq.empty[String], Seq("x"), Seq("x", "x"), Seq("x", "y"),
        Seq(ca, cb, ca), Seq(ca, cb, ca, cb, ca)) ++
        (1 to 40).map(_ => Seq.fill(rnd.nextInt(30))(tinyVocab(rnd.nextInt(3)))) ++
        (1 to 20).map(_ => Seq.fill(rnd.nextInt(50) + 1)(pool(rnd.nextInt(200))))
    val got = rows.toDF("toks").select(expr("repetition_stats(toks)"))
      .as[Seq[Long]].collect().toSeq
    assert(got.map(_.toSeq) == rows.map(ref))
  }

  test("sorted_intersect_count equals set intersection size") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val rows = (1 to 50).map { _ =>
      val a = (1 to rnd.nextInt(80)).map(_ => rnd.nextInt(100).toLong).distinct.sorted
      val b = (1 to rnd.nextInt(80)).map(_ => rnd.nextInt(100).toLong).distinct.sorted
      (a, b)
    }
    val got = rows.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)")).as[Long].collect().toSeq
    val want = rows.map { case (a, b) => (a.toSet intersect b.toSet).size.toLong }
    assert(got == want)
  }
}
