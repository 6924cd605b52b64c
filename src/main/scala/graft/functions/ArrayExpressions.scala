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

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.SortedIntersectCount.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** When one side is this many times smaller than the other, switch
    * from the linear merge to per-element binary search of the big
    * side — O(k·log m) instead of O(n+m). The crossover matters for
    * membership-test workloads (q73's doc-vs-benchmark overlap, the
    * Bloom prefilter's 3-position probe against a ~10^3-entry bitset),
    * where the merge degenerates to scanning the whole big array per
    * row.
    */
  private final val SearchRatio = 16

  def compute(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements(); val m = y.numElements()
    if (n == 0 || m == 0) return 0L
    if (n.toLong * SearchRatio < m) return searched(x, n, y, m)
    if (m.toLong * SearchRatio < n) return searched(y, m, x, n)
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  /** Binary-search each small-side element in the big side's remaining
    * suffix (both sorted, so the window only shrinks). A match consumes
    * one big element — identical multiset-min duplicate semantics to
    * the merge path.
    */
  private def searched(small: ArrayData, sn: Int, big: ArrayData, bn: Int): Long = {
    var c = 0L; var lo = 0; var i = 0
    while (i < sn && lo < bn) {
      val v = small.getLong(i)
      var l = lo; var h = bn
      while (l < h) {
        val mid = (l + h) >>> 1
        if (big.getLong(mid) < v) l = mid + 1 else h = mid
      }
      if (l < bn && big.getLong(l) == v) { c += 1; lo = l + 1 } else lo = l
      i += 1
    }
    c
  }
}

/** One-pass repetition statistics over a document's token array:
  * `[distinct 2-gram count, distinct 3-gram count, max single-token
  * count]`. Exact set semantics with NO reliance on hash uniqueness:
  * tokens are interned to dense ids via an open-addressing table that
  * falls back to full byte comparison on probe, and an n-gram is the
  * id-tuple itself (packed into two longs — injective for any id
  * range), so the distinct counts equal distinct-of-joined-strings
  * exactly (the join separator cannot occur inside a token). Replaces
  * three interpreted HOF pipelines (transform + concat_ws +
  * array_distinct ×2 + a nested per-distinct-token filter scan) that
  * dominated q77's runtime. The hot loop lives in
  * [[RepetitionStats.compute]], called from both the interpreted and
  * the generated path (one static call per row inside
  * whole-stage codegen).
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(RepetitionStats.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.RepetitionStats.compute($xs));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** Smallest power of two >= 2·n (load factor <= 0.5).
    * Package-visible so specs can derive probe-collision masks from the
    * real sizing instead of hardcoding it. */
  private[functions] def tableCap(n: Int): Int =
    java.lang.Integer.highestOneBit(math.max(4, 2 * n - 1)) * 2

  def compute(xs: ArrayData): Array[Long] = {
    val n = xs.numElements()
    if (n == 0) return Array(0L, 0L, 0L)
    // intern tokens to dense ids; count occurrences per id. A null
    // element (the input array type may carry containsNull=true) interns
    // to one dedicated sentinel id — distinct from every real token,
    // equal to every other null — so user-facing SQL calls like
    // repetition_stats(array('a', NULL)) are total, not a crash.
    val cap = tableCap(n)
    val mask = cap - 1
    val keys = new Array[UTF8String](cap)
    val slotId = new Array[Int](cap)
    val tokId = new Array[Int](n)
    val counts = new Array[Int](n)
    var nid = 0
    var nullId = -1
    var i = 0
    while (i < n) {
      val s = xs.getUTF8String(i)
      var id = -1
      if (s == null) {
        if (nullId < 0) { nullId = nid; nid += 1 }
        id = nullId
      } else {
        var h = s.hashCode & mask
        while (id < 0) {
          val k = keys(h)
          if (k == null) { keys(h) = s; slotId(h) = nid; id = nid; nid += 1 }
          else if (k.equals(s)) id = slotId(h)
          else h = (h + 1) & mask
        }
      }
      tokId(i) = id
      counts(id) += 1
      i += 1
    }
    var top = 0L
    var j = 0
    while (j < nid) { if (counts(j) > top) top = counts(j); j += 1 }

    // distinct n-grams: the gram IS its id-tuple, packed exactly into
    // (hi, lo); hi == -1 marks an empty slot (ids are non-negative)
    def distinctGrams(order: Int): Long = {
      val m = n - (order - 1)
      if (m <= 0) return 0L
      val c = tableCap(m)
      val msk = c - 1
      val his = new Array[Long](c)
      val los = new Array[Long](c)
      java.util.Arrays.fill(his, -1L)
      var cnt = 0L
      var p = 0
      while (p < m) {
        val hi = if (order == 2) tokId(p).toLong
          else (tokId(p).toLong << 32) | tokId(p + 1).toLong
        val lo = tokId(p + order - 1).toLong
        var h = (java.lang.Long.hashCode(
          (hi * 31 + lo) * -7046029254386353131L)) & msk
        var done = false
        while (!done) {
          if (his(h) == -1L) { his(h) = hi; los(h) = lo; cnt += 1; done = true }
          else if (his(h) == hi && los(h) == lo) done = true
          else h = (h + 1) & msk
        }
        p += 1
      }
      cnt
    }
    Array(distinctGrams(2), distinctGrams(3), top)
  }
}

/** Per-n-gram portable 60-bit hashes over a token array: element i is
  * hash60(concat_ws(" ", toks[i..i+n-1])) — md5 of the UTF-8 bytes of
  * the space-joined n-gram, top 15 hex chars as an unsigned integer —
  * optionally reduced mod `mod` (pass 0 for no reduction). Exactly the
  * arithmetic of the HOF formulation
  * `transform(indices, i -> hash60(concat_ws(...)))`, which evaluates
  * INTERPRETED per element; this runs the whole array as one compiled
  * loop with an incrementally-fed MessageDigest (no joined-string
  * allocation). Null elements are skipped like concat_ws. Empty output
  * when fewer than n tokens.
  */
case class NGramHash60(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {

  require(n >= 1, s"ngram_hash60: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_hash60 expects array<string>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hash60"

  override def nullSafeEval(input: Any): Any =
    NGramHash60.compute(input.asInstanceOf[ArrayData], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, xs =>
      s"${ev.value} = graft.functions.NGramHash60.compute($xs, $n, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramHash60 {
  private val Space = Array(' '.toByte)

  /** Static so generated code can call it: one compiled loop per row. */
  def compute(xs: ArrayData, n: Int, mod: Long): ArrayData = {
    val total = xs.numElements()
    val cnt = total - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      md.reset()
      var first = true
      var j = 0
      while (j < n) {
        if (!xs.isNullAt(i + j)) {
          if (!first) md.update(Space)
          md.update(xs.getUTF8String(i + j).getBytes)
          first = false
        }
        j += 1
      }
      val d = md.digest()
      // top 15 hex chars of the digest = first 7 bytes + high nibble of
      // byte 7, exactly conv(substr(md5(s), 1, 15), 16, 10)
      var acc = 0L
      var k = 0
      while (k < 7) { acc = (acc << 8) | (d(k) & 0xffL); k += 1 }
      acc = (acc << 4) | ((d(7) >> 4) & 0xfL)
      out(i) = if (mod > 0) acc % mod else acc
      i += 1
    }
    new GenericArrayData(out)
  }
}
