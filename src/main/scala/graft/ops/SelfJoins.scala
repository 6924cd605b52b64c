package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed all-pairs-within-block self-joins.
  *
  * A blocked self-join (`a.join(b, blockKeys)` + `a.id < b.id`) puts
  * every pair of a block on the ONE task owning that block's key — a
  * single hot block is a straggler, and broadcasting one side instead
  * is O(corpus) memory. The triangle decomposition fixes both: rows of
  * a block are hashed into `split` row-groups, and the join key is
  * extended with the group pair (p, q), p <= q, so a block's C(m,2)
  * pairs spread over split·(split+1)/2 tasks of ~(m/split)² pairs each.
  *
  * Replication cost is (split+1)/2 per row — asymptotically √(2T) for
  * T-way task spread, the known lower bound for distributing an
  * all-pairs join (each of T tasks must hold 2m/split rows), and
  * strictly better than key-salting, which pays T× replication for a
  * T-way spread. Size `split` ≈ √(2 · target parallelism per block).
  */
object SelfJoins {

  /** One output row per unordered pair of distinct rows sharing all
    * `blockKeys`. Non-key columns come out twice, suffixed `_l` / `_r`;
    * `idCol` must be pair-unique. Orientation is arbitrary for pairs
    * spanning row-groups (canonicalize with least/greatest if needed);
    * within a group it is id-ordered. `split` is evaluated per row
    * (pass `lit(k)` for a fixed fan-out, or a conditional for adaptive
    * splitting of hot blocks only — replication is 1 where it is 1).
    * Columns named `__*` are treated as internal (available to `split`,
    * excluded from the output).
    *
    * CONTRACT: `split` must be functionally dependent on `blockKeys` —
    * if two rows of one block evaluate to different values, the (p, q)
    * tilings disagree and pairs are SILENTLY lost. `lit(k)` and
    * broadcast-joined per-block flags (the hot-block pattern) satisfy
    * this by construction; anything row-dependent does not. Pass
    * `validateSplit = true` to enforce the contract with a pre-pass
    * aggregation that fails fast on a violating block (costs one extra
    * scan + job — a debug/CI mode, not for the hot path).
    */
  def pairsWithinBlocks(
      df: DataFrame,
      blockKeys: Seq[String],
      idCol: String,
      split: Column,
      validateSplit: Boolean = false): DataFrame = {
    val payload = df.columns.toSeq
      .filterNot(c => blockKeys.contains(c) || c == idCol || c.startsWith("__"))
    val graded = df
      .withColumn("__r", split)
      .withColumn("__g", pmod(hash(col(idCol)), col("__r")))
    if (validateSplit) {
      val bad = graded.groupBy(blockKeys.map(col): _*)
        .agg(countDistinct(col("__r")).as("__nr"))
        .filter(col("__nr") > 1)
        .limit(1).collect()
      require(bad.isEmpty,
        s"pairsWithinBlocks: split is not functionally dependent on block keys " +
          s"(${blockKeys.mkString(", ")}) — block ${bad.headOption.orNull} evaluates to " +
          "multiple __r values; pairs would be silently lost")
    }
    def side(tag: String, prep: DataFrame => DataFrame) = {
      val renamed = (Seq(idCol) ++ payload).map(c => col(c).as(s"${c}_$tag"))
      prep(graded).select(
        blockKeys.map(col) ++ Seq(col("__p"), col("__q")) ++ renamed: _*)
    }
    // row with group g: "low" member of blocks (g, q >= g), "high"
    // member of blocks (p <= g, g) — every pair in exactly one block
    val aSide = side("l",
      _.withColumn("__q", explode(sequence(col("__g"), col("__r") - 1)))
        .withColumn("__p", col("__g")))
    val bSide = side("r",
      _.withColumn("__p", explode(sequence(lit(0), col("__g"))))
        .withColumn("__q", col("__g")))
    // SHUFFLE_HASH instead of the default sort-merge: pair rows carry
    // the callers' wide array payloads (gram sets, signatures), and
    // sorting both sides on (blockKeys, p, q) is pure overhead when the
    // join only needs bucket equality. The build side is bounded BY
    // CONSTRUCTION: the split sizes each (block, p, q) bucket to
    // ~√pairsPerTask rows, so per-task hash maps stay small at any
    // corpus size (measured: q33 4.9 → 2.6 s, q32 1.9 → 1.4 s at
    // sf0.1).
    aSide.join(bSide.hint("SHUFFLE_HASH"), blockKeys ++ Seq("__p", "__q"))
      .filter(col("__p") =!= col("__q") || col(s"${idCol}_l") < col(s"${idCol}_r"))
      .drop("__p", "__q")
  }

  /** [[pairsWithinBlocks]] with the split factor DERIVED per block from
    * an exact count prepass instead of a caller-guessed constant: a
    * block of m rows gets R = ceil(m / √pairsPerTask), so every task
    * holds ≈ (m/R)² ≤ pairsPerTask pairs — big blocks spread wide,
    * small blocks keep replication 1 — and R is block-constant by
    * construction (it is a function of the broadcast-joined count).
    * `maxSplit` caps replication at (maxSplit+1)/2 per row.
    *
    * The count frame is broadcast, so this fits LOW-cardinality block
    * keys (language × length-bucket style blocking — bounded by schema,
    * not data). High-cardinality keys (LSH buckets) should keep the
    * hot-bucket pattern instead: broadcast only the few blocks over
    * threshold (graft.queries.Dedup.candidatePairsFrom).
    */
  def adaptivePairsWithinBlocks(
      df: DataFrame,
      blockKeys: Seq[String],
      idCol: String,
      pairsPerTask: Long = 1L << 18,
      maxSplit: Int = 64,
      validateSplit: Boolean = false): DataFrame = {
    val counts = df.groupBy(blockKeys.map(col): _*)
      .agg(count(lit(1)).as("__m"))
    val graded = df.join(broadcast(counts), blockKeys)
    val split = least(lit(maxSplit),
      greatest(lit(1), ceil(col("__m") / lit(math.sqrt(pairsPerTask.toDouble))))).cast("int")
    pairsWithinBlocks(graded, blockKeys, idCol, split, validateSplit)
  }
}
