package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private def cosRef(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosine_sim matches reference formula bit-for-bit (codegen path)") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (Seq.fill(64)(rnd.nextFloat() - 0.5f), Seq.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val got = rows.toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].collect().toSeq
    val want = rows.map { case (a, b) => cosRef(a, b) }
    assert(got == want) // bit-exact, not approx
  }

  test("srp_code matches an independent reference computation (codegen path)") {
    GraftFunctions.register(spark)
    val bits = graft.queries.Similarity.SrpBits
    val dim = graft.queries.Similarity.SrpDim
    val scale = graft.queries.Similarity.FixScale
    def ref(v: Seq[Float]): Long = {
      // independent formulation: BigDecimal HALF_UP quantization (the
      // Spark round() contract), BigInt dots — no shared code with the
      // expression's long/floor arithmetic
      val q = v.map(x => new java.math.BigDecimal(x.toDouble * scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact())
      (0 until bits).map { b =>
        val dot = q.indices.map { d =>
          val w = (BigInt(1103515245L) * (b * dim + d) + 12345L) % 2147483647L - 1073741823L
          w * q(d)
        }.sum
        if (dot >= 0) 1L << b else 0L
      }.sum
    }
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map(_ => Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val got = rows.toDF("v").select(expr("srp_code(v)")).as[Long].collect().toSeq
    assert(got == rows.map(ref))
    // opposite vectors get complementary codes (every hyperplane flips;
    // dot==0 would break the complement, so the draw avoids it)
    val v = rows.head
    val neg = v.map(x => -x)
    val Seq(c1, c2) = Seq(v, neg).toDF("v")
      .select(expr("srp_code(v)")).as[Long].collect().toSeq
    assert((c1 ^ c2) == (1L << bits) - 1, f"codes not complementary: $c1%x $c2%x")
  }

  test("cosine_sim nulls: zero vector, length mismatch, null input") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(0f, 0f), Seq(1f, 2f)), // zero norm -> null
      (Seq(1f, 2f, 3f), Seq(1f, 2f)) // length mismatch -> null
    ).toDF("a", "b")
    val got = df.select(expr("cosine_sim(a, b)")).collect().map(r => r.isNullAt(0)).toSeq
    assert(got == Seq(true, true))
    val withNull = spark.sql("SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("identical vectors give cosine 1.0") {
    GraftFunctions.register(spark)
    val df = Seq((Seq(1f, 2f, 3f), Seq(1f, 2f, 3f))).toDF("a", "b")
    val v = df.select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(math.abs(v - 1.0) < 1e-12)
  }
}
