package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native array expressions for the dedup hot loops.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`filter`)
  * evaluate INTERPRETED — per-element lambda dispatch with boxing and no
  * codegen — which made the MinHash signature and Jaccard-verify stages
  * the bottleneck of the whole bench (29 s / 99 s at sf0.1). These
  * expressions run the same math as fused primitive loops inside
  * whole-stage codegen; the arithmetic is identical to the DuckDB
  * oracle's `list_transform`/`list_intersect` formulation, so results
  * stay bit-exact.
  */

/** MinHash signature over a doc's shingle-hash array: component j is
  * min over shingles x of ((2j+1)·x + 12345j + 6789) mod p, p = 2^31-1
  * (empty input → p). All intermediates stay < 2^62: exact in int64 in
  * every engine. See graft.queries.Dedup for the LSH layout.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      val a = 2L * j + 1L
      val b = 12345L * j + 6789L
      var m = P
      var i = 0
      while (i < n) {
        val v = (a * xs.getLong(i) + b) % P
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $xs.numElements();
         |long[] $sig = new long[$numHashes];
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  long $a = 2L * $j + 1L;
         |  long $b = 12345L * $j + 6789L;
         |  long $m = ${P}L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ($a * $xs.getLong($i) + $b) % ${P}L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $sig[$j] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Rabin–Karp rolling hash: polynomial hash (base 257, mod 2^31−1)
  * of every `window`-byte substring of an ASCII string, computed with
  * O(1) work per shift — h' = (h·B − c_out·B^w + c_in) mod p — i.e. the
  * document-fingerprinting primitive (winnowing selects minima from
  * this array). The per-window value equals the direct formula
  * Σ c_j·B^(w−1−j) mod p, which is what the DuckDB oracle evaluates
  * independently per window (O(n·w), same numbers).
  * Empty array when the input is shorter than the window.
  */
case class RollingHashes(child: Expression, window: Int)
    extends UnaryExpression {

  private val P = 2147483647L
  private val B = 257L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects string, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < window) return new GenericArrayData(Array.emptyLongArray)
    // B^(w-1) mod p
    var bw = 1L
    var e = 0
    while (e < window - 1) { bw = bw * B % P; e += 1 }
    val out = new Array[Long](n - window + 1)
    var h = 0L
    var i = 0
    while (i < window) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
    out(0) = h
    while (i < n) {
      h = ((h - (bytes(i - window) & 0xffL) * bw % P + P) % P * B + (bytes(i) & 0xffL)) % P
      out(i - window + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val bw = ctx.freshName("bw")
      val e = ctx.freshName("e")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |int $n = $bytes.length;
         |long[] $out;
         |if ($n < $window) {
         |  $out = new long[0];
         |} else {
         |  $out = new long[$n - $window + 1];
         |  long $bw = 1L;
         |  for (int $e = 0; $e < $window - 1; $e++) $bw = $bw * ${B}L % ${P}L;
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $window; $i++) $h = ($h * ${B}L + ($bytes[$i] & 0xffL)) % ${P}L;
         |  $out[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = (($h - ($bytes[$i - $window] & 0xffL) * $bw % ${P}L + ${P}L) % ${P}L
         |          * ${B}L + ($bytes[$i] & 0xffL)) % ${P}L;
         |    $out[$i - $window + 1] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 60-bit SimHash over an array of (60-bit) token hashes WITH
  * multiplicity: bit i of the signature is set iff the majority of
  * token hashes have bit i set (strictly positive vote sum; ties
  * clear the bit — matching the oracle's `> 0`). Near-duplicate
  * documents differ in few tokens, so their signatures differ in few
  * bits; candidate pairs come from pigeonhole banding over 4×15-bit
  * chunks (hamming ≤ 3 ⇒ at least one chunk equal).
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash60 expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val acc = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = xs.getLong(i)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) sig |= 1L << b
      b += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $xs.numElements();
         |int[] $acc = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $xs.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $acc[$b]++; else $acc[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($acc[$b] > 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of common elements between two SORTED DISTINCT long arrays
  * (single merge pass). Drives exact Jaccard on hashed n-gram sets:
  * |A∩B| with |A∪B| = |A| + |B| − |A∩B|.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two array<bigint>, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = x.numElements(); val m = y.numElements()
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Long.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; long $c = 0L;
         |int $n = $x.numElements(); int $m = $y.numElements();
         |while ($i < $n && $j < $m) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
