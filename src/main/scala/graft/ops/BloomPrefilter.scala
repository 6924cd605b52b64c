package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed aggregate packing Bloom bit positions into a DENSE word array:
  * the buffer is a zeroed Array[Long](words), reduce sets one bit,
  * merge ORs word-wise. Partial aggregation applies map-side, so the
  * build side contributes one `words`-sized buffer per task to the
  * final merge — never a shuffle of the positions themselves. The dense
  * array is what makes the PROBE O(1) per hash (GetArrayItem on a
  * primitive array), where the sorted-position-array representation
  * ([[BloomPrefilter.bitset]]) pays a merge-intersect per row — fine
  * for small bitsets, wrong when the probe side is wedge-count-sized.
  */
class BloomWordsAgg(words: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](words)
  def reduce(b: Array[Long], pos: Long): Array[Long] = {
    b((pos >>> 6).toInt) |= 1L << (pos & 63); b
  }
  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** Bloom-filter semi-join prefilter: build a deterministic Bloom bitset
  * over the build side's keys, cut the probe side to rows whose k bit
  * positions are all set, then let an exact join remove the false
  * positives. The final result is EXACTLY the semi-join — the Bloom
  * stage only prunes — which is what makes the operator oracle-checkable
  * (the oracle is the plain `IN` subquery) while the pruning behavior is
  * pinned separately by SketchesSpec.
  *
  * Scale shape: this is the pattern for "semi-join a 100 TB probe
  * against a build side too big to broadcast raw but whose BITSET
  * fits": the bitset is O(m bits) regardless of build cardinality, the
  * probe passes in one scan with a codegen'd merge-intersect per row,
  * and the expensive exact join runs over only the pre-filtered
  * survivors (Spark's own InjectRuntimeFilter plays the same trick with
  * its BloomFilterAggregate). The bitset is represented as a sorted
  * array of set positions — exact same semantics as a bitmap, portable
  * arithmetic (md5-based key hash, mod-p affine position hashes), and
  * probe-able by the existing codegen SortedIntersectCount.
  */
object BloomPrefilter {

  val P = 2147483647L

  /** Working-column names must not collide with the probe's own schema
    * (withColumn silently REPLACES an existing column, corrupting the
    * output) — suffix until free. Shared by both prefilter paths.
    */
  private def fresh(base: String, taken: Set[String]): String =
    Iterator.from(0).map(i => if (i == 0) base else s"${base}_$i")
      .find(n => !taken.contains(n)).get

  /** Sorted distinct bit positions (k affine hashes of `keyHash`,
    * mod m). Distinct because two of a key's hashes may collide — the
    * membership test compares against the array's own size.
    */
  def positions(keyHash: Column, k: Int, m: Int): Column =
    array_sort(array_distinct(array((0 until k).map { i =>
      ((lit((2 * i + 1).toLong) * keyHash + lit(7919L * i)) % P) % m
    }: _*)))

  /** One-row DataFrame holding the Bloom bitset as a sorted distinct
    * position array (column `bloom_bits`, at most m entries) — built
    * fully in-plan, no driver collect, broadcast-joined to the probe.
    */
  def bitset(build: DataFrame, keyHash: Column, k: Int, m: Int): DataFrame =
    build.select(keyHash.as("__h"))
      .select(explode(positions(col("__h"), k, m)).as("pos"))
      .agg(array_sort(array_distinct(collect_list(col("pos")))).as("bloom_bits"))

  /** Probe rows whose k positions are all present in the bitset: the
    * Bloom hits (every true match plus the false positives the caller's
    * exact join removes).
    */
  def prefilter(probe: DataFrame, keyHash: Column, bits: DataFrame,
      k: Int, m: Int): DataFrame = {
    graft.functions.GraftFunctions.register(probe.sparkSession)
    val taken = probe.columns.toSet
    val pposCol = fresh("__ppos", taken)
    val bitsCol = fresh("__bloom_bits", taken + pposCol)
    probe.withColumn(pposCol, positions(keyHash, k, m))
      .crossJoin(broadcast(bits.select(col("bloom_bits").as(bitsCol))))
      .filter(expr(s"sorted_intersect_count($pposCol, $bitsCol)") === size(col(pposCol)))
      .drop(pposCol, bitsCol)
  }

  /** Order-sensitive hash of a 2-long key into [0, P): pure codegen
    * arithmetic, ANSI-safe by construction — each operand is reduced
    * mod P (< 2^31) BEFORE the multiply, so every product stays under
    * 2^52 (ANSI mode makes a wrapping Long multiply an error, not a
    * hash). Plan-internal, never oracle-visible; distinct keys that
    * collide here only add Bloom false positives the exact join
    * removes.
    */
  def pairHash(a: Column, b: Column): Column =
    pmod(pmod(a, lit(P)) * lit(1000003L) + pmod(b, lit(P)) * lit(69061L), lit(P))

  /** Bloom size for `n` build keys at ~16 bits/key: 64-aligned, at
    * least 2^20, capped at 2^27 bits (16 MB of words — a bounded
    * broadcast at ANY build cardinality; past the cap the filter's
    * false-positive rate degrades gracefully and the exact join still
    * removes every false positive).
    */
  def sizeBits(n: Long): Int = {
    val target = math.min(math.max(1L << 20, 16L * n), 1L << 27)
    (((target + 63) / 64) * 64).toInt
  }

  /** One-row DataFrame holding the Bloom bitset as a DENSE word array
    * (column `bloom_words`, exactly m/64 longs) — built fully in-plan
    * by [[BloomWordsAgg]], no driver collect, broadcast to the probe.
    */
  def packedBitset(build: DataFrame, keyHash: Column, k: Int, m: Int): DataFrame = {
    require(m % 64 == 0, s"m must be 64-aligned, got $m")
    val spark = build.sparkSession
    import spark.implicits._
    val agg = new BloomWordsAgg(m / 64)
    build.select(explode(positions(keyHash, k, m)).as("pos")).as[Long]
      .select(agg.toColumn).toDF("bloom_words")
  }

  /** Probe rows whose k positions are all set in the packed bitset —
    * every true match plus the false positives the caller's exact join
    * removes. Per row: k hash computations + k O(1) primitive-array
    * reads, fully codegen (the broadcast word array is read in place;
    * it is dropped before any downstream exchange, so it is never
    * copied into shuffle rows). This is the map-side stage that cuts a
    * wedge-sized exchange down to (closing rows + fp) before the
    * shuffle happens.
    */
  def prefilterPacked(probe: DataFrame, keyHash: Column, words: DataFrame,
      k: Int, m: Int): DataFrame = {
    val taken = probe.columns.toSet
    val hCol = fresh("__bh", taken)
    val bitsCol = fresh("__bloom_words", taken + hCol)
    val allSet = (0 until k).map { i =>
      val pos = ((lit((2 * i + 1).toLong) * col(hCol) + lit(7919L * i)) % P) % m
      val word = element_at(col(bitsCol), shiftright(pos, 6).cast("int") + lit(1))
      call_function("shiftright", word, pos.bitwiseAND(lit(63L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ and _)
    probe.withColumn(hCol, keyHash)
      .crossJoin(broadcast(words.select(col("bloom_words").as(bitsCol))))
      .filter(allSet)
      .drop(hCol, bitsCol)
  }
}
