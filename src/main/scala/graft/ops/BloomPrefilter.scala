package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    // Working-column names must not collide with the probe's own schema
    // (withColumn silently REPLACES an existing column, corrupting the
    // output) — suffix until free.
    def fresh(base: String, taken: Set[String]): String =
      Iterator.from(0).map(i => if (i == 0) base else s"${base}_$i")
        .find(n => !taken.contains(n)).get
    val taken = probe.columns.toSet
    val pposCol = fresh("__ppos", taken)
    val bitsCol = fresh("__bloom_bits", taken + pposCol)
    probe.withColumn(pposCol, positions(keyHash, k, m))
      .crossJoin(broadcast(bits.select(col("bloom_bits").as(bitsCol))))
      .filter(expr(s"sorted_intersect_count($pposCol, $bitsCol)") === size(col(pposCol)))
      .drop(pposCol, bitsCol)
  }
}
