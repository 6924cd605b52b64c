package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient equi-join by key salting.
  *
  * At 100 TB a handful of hot keys (the null customer, the default
  * partition, the viral document) concentrate a shuffle partition onto
  * one executor. AQE's skew-join splitting handles sort-merge joins
  * automatically (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default); this utility is the explicit form for the cases AQE cannot
  * rewrite (e.g. aggregation-after-join pipelines where the exchange is
  * reused, or non-SMJ plans): the big side's key is salted into
  * `saltFactor` sub-keys and the small side is replicated
  * `saltFactor`×, so each hot key spreads over `saltFactor` tasks.
  *
  * Cost model: small side shuffle volume × saltFactor — use only when
  * `small` is orders of magnitude below the big side.
  */
object SkewedJoins {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: Column,
      smallKey: Column,
      saltFactor: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt: spread rows of one key by a hash of the whole
    // row, not rand() (repeatable plans, no RNG divergence on retry)
    val salted = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated,
        bigKey === smallKey && salted("__salt") === replicated("__salt"), joinType)
      .drop("__salt")
  }

  /** Multi-key `USING`-style variant: inner join on `keys` with the big
    * side salted and the small side replicated `saltFactor`×. Use when
    * the equi-join has FEW distinct key values (a blocked self-join, a
    * low-cardinality dimension): a plain shuffle would put each key on
    * one task, a broadcast would ship the whole small side to every
    * executor (O(N) driver/executor memory — the 100 TB failure mode).
    * Salting keeps the shuffle but spreads each key over `saltFactor`
    * tasks at a bounded `saltFactor`× replication cost of the small
    * side's shuffle volume — size `saltFactor` ≈ cluster parallelism /
    * distinct-key count.
    */
  def saltedEquiJoinUsing(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    val salted = big.withColumn("__salt",
      pmod(hash(struct(big.columns.map(col).toIndexedSeq: _*)), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
