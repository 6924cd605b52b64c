package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.functions.TextFns

/** Storage-maintenance algebra: incremental view maintenance for JOIN
  * views (the delta-rule identity that extends q187's aggregate
  * maintenance) and Merkle-style replica reconciliation (the
  * anti-entropy primitive a 100 TB multi-region corpus store runs
  * nightly). Both are algebraic identities checked against a direct
  * recompute, which is exactly what makes them safe to trust at scales
  * where the direct recompute is unaffordable.
  */
object Maintenance {

  // q202 — incremental JOIN-view maintenance: the revenue-by-priority
  // view V = γ(orders ⋈ lineitem) is maintained from PARTITIONED
  // inputs: orders split hist/delta on o_orderkey parity, lineitem
  // split on l_suppkey parity. Because the splits partition the rows,
  // the join factors into four disjoint quadrants
  //   V = γ(Ah⋈Bh) ⊕ γ(Ah⋈Bd) ⊕ γ(Ad⋈Bh) ⊕ γ(Ad⋈Bd)
  // (the classic delta rule Δ(A⋈B) = ΔA⋈B ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, with
  // each quadrant aggregated to partials that MERGE by decimal
  // addition — order-independent, so the identity is exact). At
  // production scale three quadrants are delta-sized and the
  // hist⋈hist quadrant is a stored table; the oracle recomputes the
  // view directly from the full inputs, proving the maintenance path
  // bit-equal to the rebuild.
  //
  // Scale shape: four shuffled joins on o_orderkey, each aggregated
  // map-side to |priorities| partials before the tiny merge. Revenue
  // follows the q01 decimal discipline (scale-4 partial sums, one
  // round(2) at the merge).
  private def q202(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    val l = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
      (col("l_extendedprice").cast(DecimalType(14, 2)) *
        (lit(1).cast(DecimalType(4, 2)) - col("l_discount").cast(DecimalType(4, 2))))
        .as("rev4"))
    def quadrant(op: Int, lp: Int): DataFrame =
      o.filter(pmod(col("o_orderkey"), lit(2)) === op)
        .join(l.filter(pmod(col("l_suppkey"), lit(2)) === lp),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("rev4")).as("srev"), count(lit(1)).as("cnt"))
    quadrant(0, 0).unionAll(quadrant(0, 1))
      .unionAll(quadrant(1, 0)).unionAll(quadrant(1, 1))
      .groupBy(col("o_orderpriority"))
      .agg(round(sum(col("srev")), 2).cast("double").as("revenue"),
        sum(col("cnt")).as("n_items"))
      .orderBy(col("o_orderpriority"))
  }

  private val q202Sql =
    """SELECT o_orderpriority,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(14,2))
      |    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
      |    AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // q203 — Merkle-style replica reconciliation: replica A is the full
  // documents table; replica B simulates independent loss (doc_id ≡ 13
  // mod 97 dropped) and bitrot (doc_id ≡ 7 mod 101 has its text
  // altered). Each replica folds its rows into 256 bucket digests —
  // Σ hash60(doc_id:text) mod (2^61−1), a commutative, associative,
  // order-independent fold — and ONLY the digest tables are compared.
  // The report lists exactly the buckets that need repair, with the
  // row-count delta separating loss from corruption. At 100 TB the
  // digests are a few KB per replica crossing the WAN instead of the
  // corpus; mismatched buckets then recurse (here one level suffices).
  //
  // Scale shape: two scans (in production: one per replica, local to
  // it), each a 256-group hash aggregate with map-side combine; the
  // comparison joins two 256-row tables. Nothing row-sized ever
  // shuffles or crosses replicas.
  private def q203(s: SparkSession, d: String): DataFrame = {
    val mod = lit(2305843009213693951L) // 2^61 - 1
    def digests(df: DataFrame): DataFrame =
      df.select(pmod(col("doc_id"), lit(256)).as("bucket"),
          TextFns.hash60(concat_ws(":", col("doc_id"), col("text"))).as("h"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          pmod(sum(col("h").cast(DecimalType(38, 0))), mod.cast(DecimalType(38, 0)))
            .cast("long").as("dig"))
    val a = documents(s, d).select(col("doc_id"), col("text"))
    val b = documents(s, d)
      .filter(pmod(col("doc_id"), lit(97)) =!= 13)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(101)) === 7, concat(col("text"), lit("X")))
          .otherwise(col("text")).as("text"))
    digests(a).as("a")
      .join(digests(b).as("b"), Seq("bucket"), "full_outer")
      .filter(col("a.dig").isNull || col("b.dig").isNull ||
        col("a.dig") =!= col("b.dig"))
      .select(col("bucket"),
        coalesce(col("a.n"), lit(0L)).as("n_a"),
        coalesce(col("b.n"), lit(0L)).as("n_b"),
        coalesce(col("a.dig"), lit(-1L)).as("dig_a"),
        coalesce(col("b.dig"), lit(-1L)).as("dig_b"))
      .orderBy(col("bucket"))
  }

  private val q203Sql = {
    val h = TextFns.hash60Sql("doc_id || ':' || text")
    """WITH a AS (
      |  SELECT doc_id % 256 AS bucket, count(*) AS n,
      |    CAST(sum(CAST(HEXPR AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM documents GROUP BY 1),
      |b0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 101 = 7 THEN text || 'X' ELSE text END AS text
      |  FROM documents WHERE doc_id % 97 <> 13),
      |b AS (
      |  SELECT doc_id % 256 AS bucket, count(*) AS n,
      |    CAST(sum(CAST(HEXPR AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM b0 GROUP BY 1)
      |SELECT coalesce(a.bucket, b.bucket) AS bucket,
      |  coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
      |  coalesce(a.dig, -1) AS dig_a, coalesce(b.dig, -1) AS dig_b
      |FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
      |WHERE a.dig IS NULL OR b.dig IS NULL OR a.dig <> b.dig
      |ORDER BY bucket""".stripMargin.replace("HEXPR", h)
  }

  // q233 — rendezvous-hashing rebalance audit: how much data moves
  // when the shard ring grows from [[RvBefore]] to [[RvAfter]] nodes?
  // Each document's owner is the shard maximizing the 60-bit hash of
  // "rv<shard>:<doc_id>" (highest-random-weight / HRW hashing —
  // Thaler & Ravishankar), the assignment scheme whose defining
  // property this query PROVES on the corpus: a document relocates
  // only when the NEW shard wins it, so expected movement is
  // 1/(n+1) of the corpus instead of the (n−1)/n a modulo
  // re-partition would force. The report is the per-shard movement
  // matrix a storage operator reads before a ring resize.
  //
  // Scale shape: owner election is IN-ROW — an array_max over the
  // n+1 per-shard (hash, shard) structs, no explode, no shuffle —
  // so the whole query is one corpus scan plus a |shards|-row
  // aggregate. Ties would need a 60-bit md5 collision between two
  // shard draws of one document; the struct max's shard tiebreak
  // makes even that deterministic in both engines.
  val RvBefore = 8
  val RvAfter = 9

  private def rvOwner(n: Int): org.apache.spark.sql.Column = {
    val cands = (0 until n).map { s =>
      struct(
        TextFns.hash60(concat(lit(s"rv$s:"), col("doc_id").cast("string"))).as("h"),
        lit(s.toLong).as("s"))
    }
    array_max(array(cands: _*)).getField("s")
  }

  /** Core: per-document (before, after) HRW owners over any frame with
    * a `doc_id` column. Fixture-testable.
    */
  private[graft] def rendezvousOwnersOf(ids: DataFrame): DataFrame =
    ids.select(col("doc_id"),
      rvOwner(RvBefore).as("before_shard"), rvOwner(RvAfter).as("after_shard"))

  private def q233(s: SparkSession, d: String): DataFrame =
    rendezvousOwnersOf(documents(s, d))
      .groupBy(col("before_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("after_shard") =!= col("before_shard"), 1L).otherwise(0L))
          .as("n_moved"))
      .select(col("before_shard"), col("n_docs"), col("n_moved"),
        expr("n_moved * 1048576 DIV n_docs").as("moved_fp"))
      .orderBy(col("before_shard"))

  private val q233Sql = {
    val hv = TextFns.hash60Sql("'rv' || CAST(s AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)")
    s"""WITH h AS (
      |  SELECT doc_id, s, $hv AS hv
      |  FROM documents, range($RvAfter) t(s)),
      |o AS (
      |  SELECT doc_id,
      |    max(CASE WHEN s < $RvBefore THEN {'h': hv, 's': s} END)['s'] AS before_shard,
      |    max({'h': hv, 's': s})['s'] AS after_shard
      |  FROM h GROUP BY doc_id)
      |SELECT before_shard, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN after_shard <> before_shard THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_moved,
      |  CAST(CAST(sum(CASE WHEN after_shard <> before_shard THEN 1 ELSE 0 END) AS BIGINT)
      |    * 1048576 // count(*) AS BIGINT) AS moved_fp
      |FROM o GROUP BY before_shard
      |ORDER BY before_shard""".stripMargin
  }

  // q237 — IBLT set reconciliation (Eppstein/Goodrich/Uyeda's "what's
  // the difference?" / invertible Bloom lookup tables): where q203
  // LOCATES mismatched buckets, this DECODES the exact differing
  // doc_ids from constant-size sketches alone. Each replica folds its
  // id set into [[IbHashes]] banks of [[IbBank]] cells — per cell a
  // (count, idSum, hashSum) triple, all commutative sums — and the
  // CELL-WISE SUBTRACTION of the two sketches depends only on the
  // symmetric difference: shared ids cancel. Peeling then recovers
  // the difference: a cell with count ±1 whose hashSum matches its
  // idSum's value-hash holds exactly one id; remove it from its banks
  // and repeat. Replica B simulates q203's loss (doc_id ≡ 13 mod 97)
  // plus foreign inserts (shifted ids for doc_id ≡ 41 mod 101), so
  // the decode exercises both directions.
  //
  // Scale shape: each sketch is one distributed scan into a
  // 3·[[IbBank]]-cell aggregate (map-side combined; sums staged
  // through DECIMAL(38,0) so a hot cell can absorb any number of
  // 2^60-magnitude value hashes exactly); only the ≤513-row subtracted
  // sketch reaches the driver, and peeling is O(cells) per pass over
  // it. Cells must be sized ~1.5× the expected difference (production
  // reads that from q203's count deltas; 513 cells decode the ~100-id
  // diff at sf0.1 with headroom) — an undecodable residue means
  // "resize and resend", never a wrong answer, and determinism makes
  // the outcome identical in every run at a given SF.
  val IbBank = 171
  val IbHashes = 3

  private def ibltH60(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15),
      16)

  /** The signed-cell aggregate of an id stream: pure sums, so the SAME
    * plan incrementally maintains the sketch under Structured Streaming
    * (StreamingSketchSpec pins stream-built cells to this batch form).
    */
  private[graft] def ibltCellsOf(signed: DataFrame,
      bank: Int = IbBank): DataFrame =
    signed
      .select(col("doc_id"), col("sign"),
        TextFns.hash60(concat(lit("ibv:"), col("doc_id").cast("string"))).as("hv"),
        explode(array((0 until IbHashes).map { j =>
          (lit(j.toLong * bank) +
            pmod(TextFns.hash60(concat(lit(s"ib$j:"), col("doc_id").cast("string"))),
              lit(bank))).as(s"c$j")
        }: _*)).as("cell"))
      .groupBy(col("cell"))
      .agg(sum(col("sign")).as("cnt"),
        sum((col("sign") * col("doc_id")).cast(DecimalType(38, 0))).as("ids"),
        sum((col("sign").cast(DecimalType(38, 0)) * col("hv"))).as("hs"))

  /** Driver peel over collected (cell, cnt, ids, hs) rows. */
  private[graft] def ibltDecode(
      cells: Array[org.apache.spark.sql.Row],
      bank: Int = IbBank): Seq[(String, Long)] = {
    val cls = scala.collection.mutable.Map[Long, (Long, BigInt, BigInt)]()
    cells.foreach { r =>
      cls(r.getLong(0)) = (r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger), BigInt(r.getDecimal(3).toBigInteger))
    }
    val out = Seq.newBuilder[(String, Long)]
    var progress = true
    while (progress) {
      progress = false
      cls.keys.toSeq.sorted.foreach { c =>
        val (cnt, ism, hsm) = cls(c)
        if (cnt == 1L || cnt == -1L) {
          val id = (ism * cnt).toLong
          if (id > 0 && hsm * cnt == BigInt(ibltH60(s"ibv:$id"))) {
            out += ((if (cnt == 1L) "a_only" else "b_only", id))
            val hv = BigInt(ibltH60(s"ibv:$id"))
            (0 until IbHashes).foreach { j =>
              val cc = j.toLong * bank + java.lang.Math.floorMod(ibltH60(s"ib$j:$id"), bank.toLong)
              val (c2, i2, h2) = cls.getOrElse(cc, (0L, BigInt(0), BigInt(0)))
              cls(cc) = (c2 - cnt, i2 - BigInt(cnt) * id, h2 - BigInt(cnt) * hv)
            }
            progress = true
          }
        }
      }
    }
    // "resize and resend, never a wrong answer" is only honest if a
    // stalled peel is DETECTED: when the symmetric difference outgrows
    // ~IbBank·IbHashes/1.5 the loop above stops making progress with
    // undecoded ids still folded into the cells. Any cell left with a
    // nonzero (cnt, idSum, hashSum) triple is that residue (a cnt = 0
    // cell can still hold a colliding ± pair, so all three are
    // checked); returning the partial set silently would diverge from
    // the exact EXCEPT contract.
    val residue = cls.valuesIterator.count {
      case (cnt, ism, hsm) => cnt != 0L || ism != 0 || hsm != 0
    }
    if (residue > 0)
      throw new IllegalStateException(
        s"IBLT peel stalled: $residue residual cells of ${cls.size} — " +
          s"symmetric difference exceeds the ${IbHashes}x$bank sketch " +
          "capacity; resize the sketch (IbBank ~ 1.5x expected diff, " +
          "e.g. from q203's count deltas) and resend")
    out.result().sorted
  }

  /** Core: decode the symmetric difference of two id frames via
    * subtracted IBLT sketches. Returns (side, doc_id) rows.
    * Fixture-testable.
    */
  private[graft] def ibltReconcileOf(idsA: DataFrame, idsB: DataFrame,
      bank: Int = IbBank): DataFrame = {
    val s = idsA.sparkSession
    import s.implicits._
    val signed = idsA.select(col("doc_id"), lit(1L).as("sign"))
      .unionAll(idsB.select(col("doc_id"), lit(-1L).as("sign")))
    ibltDecode(ibltCellsOf(signed, bank).collect(), bank)
      .toDF("side", "doc_id").orderBy(col("side"), col("doc_id"))
  }

  private def q237(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"))
    val b = docs.filter(pmod(col("doc_id"), lit(97)) =!= 13)
      .unionAll(docs.filter(pmod(col("doc_id"), lit(101)) === 41)
        .select((col("doc_id") + 1000000000L).as("doc_id")))
    ibltReconcileOf(docs, b)
  }

  private val q237Sql =
    """WITH a AS (SELECT doc_id FROM documents),
      |b AS (
      |  SELECT doc_id FROM documents WHERE doc_id % 97 != 13
      |  UNION ALL
      |  SELECT doc_id + 1000000000 FROM documents WHERE doc_id % 101 = 41)
      |SELECT 'a_only' AS side, doc_id
      |FROM (SELECT doc_id FROM a EXCEPT SELECT doc_id FROM b) x
      |UNION ALL
      |SELECT 'b_only' AS side, doc_id
      |FROM (SELECT doc_id FROM b EXCEPT SELECT doc_id FROM a) y
      |ORDER BY side, doc_id""".stripMargin


  // q245 — sequence-completeness audit: find every missing-id RANGE in
  // what should be a dense event_id sequence — the "did my CDC/ingest
  // stream drop offsets" check every log pipeline runs against its
  // Kafka/changefeed offsets. Replica loss is simulated two ways
  // (isolated ids ≡ 13 mod 1009; whole 100-id blocks whose index ≡ 7
  // mod 83) so the report shows both single-record drops and
  // lost-batch ranges.
  //
  // Scale shape: a naive `lag` over the whole sequence is a
  // single-partition window — instead the ids range-partition, each
  // partition lags LOCALLY, and a partition-count-sized carry (each
  // partition's running max) closes the boundaries — the
  // rankDistributed/q153 distributed-prefix shape, immune to empty
  // range partitions because the carry is the running max over ALL
  // earlier partitions, not just the adjacent one.
  /** Core: missing-range report over an (id) frame. Fixture-testable. */
  private[graft] def sequenceGapsOf(ids: DataFrame): DataFrame =
    // the generic single-pass carry operator (r18), max/exclusive mode:
    // in ascending-id order, max(id) over strictly-preceding rows IS
    // the previous id (what the inline copy built from a local lag plus
    // a preceding-partition running-max carry), null for the first row
    graft.ops.PrefixSum.prefixMaxExclusive(
        ids, Seq.empty, Seq(col("id")), col("id"))
      .withColumnRenamed("cum", "p")
      .filter(col("p").isNotNull && col("id") - col("p") > 1)
      .select((col("p") + 1L).as("gap_start"), (col("id") - 1L).as("gap_end"),
        (col("id") - col("p") - 1L).as("n_missing"))
      .orderBy(col("gap_start"))

  private def q245(s: SparkSession, d: String): DataFrame =
    sequenceGapsOf(events(s, d).select(col("event_id").as("id"))
      .filter(pmod(col("id"), lit(1009)) =!= 13 &&
        pmod(expr("id div 100"), lit(83)) =!= 7))

  private val q245Sql =
    """WITH ids AS (
      |  SELECT event_id AS id FROM events
      |  WHERE id % 1009 != 13 AND (id // 100) % 83 != 7),
      |l AS (
      |  SELECT id, lag(id) OVER (ORDER BY id) AS p FROM ids)
      |SELECT p + 1 AS gap_start, id - 1 AS gap_end, id - p - 1 AS n_missing
      |FROM l WHERE p IS NOT NULL AND id - p > 1
      |ORDER BY gap_start""".stripMargin

  /** q250: docs per "file" (shard granularity of the simulated LSM). */
  val CompactShardDocs = 32L
  /** q250: size-tiered trigger — compact when a tier holds ≥ this many
    * files (RocksDB universal / Cassandra STCS default = 4).
    */
  val CompactFanIn = 4

  // q250 — size-tiered compaction planner: the documents corpus is
  // sharded into "files" (doc_id DIV 32), each file's byte size is its
  // summed n_chars, and files bucket into SIZE TIERS by the integer
  // log2 of their byte size (bit-length, never floating log). The
  // size-tiered policy (Cassandra STCS / RocksDB universal): any tier
  // holding ≥ 4 files schedules one compaction of its 4 SMALLEST files
  // (ties broken by shard id — fully deterministic), producing a
  // merged file whose tier is the bit-length of the summed bytes. The
  // report is the per-tier plan: file census, what got selected, the
  // bytes rewritten, and the destination tier — from which write
  // amplification and tier migration are read directly.
  //
  // Scale shape: files aggregate from the corpus scan (map-side
  // combine to |shards| rows); tiers are a ~60-row domain; selection
  // is a row_number window PARTITIONED BY TIER (bounded partitions —
  // each holds one tier's file census, never rows). Nothing
  // corpus-sized shuffles twice.
  private def q250(s: SparkSession, d: String): DataFrame = {
    val files = documents(s, d)
      .groupBy(expr(s"doc_id DIV $CompactShardDocs").as("shard"))
      .agg(sum(col("n_chars")).as("bytes"))
      .withColumn("tier", (length(bin(col("bytes"))) - 1).cast("long"))
    val sel = files
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("tier"))
          .orderBy(col("bytes"), col("shard"))))
      .withColumn("nf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("tier"))))
      .withColumn("picked", col("nf") >= CompactFanIn && col("rn") <= CompactFanIn)
    sel.groupBy(col("tier"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("tier_bytes"),
        sum(when(col("picked"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("picked"), col("bytes")).otherwise(lit(0L))).as("sel_bytes"),
        coalesce(min(when(col("picked"), col("shard"))), lit(-1L)).as("sel_min_shard"),
        coalesce(max(when(col("picked"), col("shard"))), lit(-1L)).as("sel_max_shard"))
      .withColumn("est_out_tier",
        when(col("n_selected") > 0, (length(bin(col("sel_bytes"))) - 1).cast("long"))
          .otherwise(lit(-1L)))
      .orderBy(col("tier"))
  }

  private val q250Sql =
    s"""WITH files AS (
      |  SELECT doc_id // $CompactShardDocs AS shard,
      |    CAST(sum(n_chars) AS BIGINT) AS bytes
      |  FROM documents GROUP BY 1),
      |tiered AS (
      |  SELECT shard, bytes,
      |    CAST(length(printf('%b', bytes)) - 1 AS BIGINT) AS tier
      |  FROM files),
      |sel AS (
      |  SELECT tier, shard, bytes,
      |    row_number() OVER (PARTITION BY tier ORDER BY bytes, shard) AS rn,
      |    count(*) OVER (PARTITION BY tier) AS nf
      |  FROM tiered),
      |agg AS (
      |  SELECT tier, count(*) AS n_files,
      |    CAST(sum(bytes) AS BIGINT) AS tier_bytes,
      |    CAST(sum(CASE WHEN nf >= $CompactFanIn AND rn <= $CompactFanIn
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
      |    CAST(sum(CASE WHEN nf >= $CompactFanIn AND rn <= $CompactFanIn
      |      THEN bytes ELSE 0 END) AS BIGINT) AS sel_bytes,
      |    coalesce(min(CASE WHEN nf >= $CompactFanIn AND rn <= $CompactFanIn
      |      THEN shard END), -1) AS sel_min_shard,
      |    coalesce(max(CASE WHEN nf >= $CompactFanIn AND rn <= $CompactFanIn
      |      THEN shard END), -1) AS sel_max_shard
      |  FROM sel GROUP BY tier)
      |SELECT tier, n_files, tier_bytes, n_selected, sel_bytes,
      |  sel_min_shard, sel_max_shard,
      |  CASE WHEN n_selected > 0
      |    THEN CAST(length(printf('%b', sel_bytes)) - 1 AS BIGINT)
      |    ELSE -1 END AS est_out_tier
      |FROM agg ORDER BY tier""".stripMargin

  /** q254: Merkle tree depth (leaves = 2^depth) and probe payload bytes. */
  val MerkleDepth = 8
  private val ProbeBytes = 16L // digest (8) + row count (8) per probed node

  // q254 — hierarchical Merkle sync-cost audit: q203 compares the two
  // replicas' 256 leaf digests FLAT; this builds the full binary
  // digest tree above them (internal digest = sum of child digests
  // mod 2^61−1 — the additive fold is associative, so every level is
  // one aggregate over the leaves, no actual recursion) and replays
  // the top-down anti-entropy descent: a node is DIRTY iff its
  // subtrees differ, and the protocol probes both children of every
  // dirty node. Reported per level: live node slots, dirty nodes,
  // probes issued (2·dirty(parent level), 1 at the root), and the
  // cumulative probe payload — the number a WAN-sync planner actually
  // budgets, showing the O(dirty·depth) localization win over
  // shipping all 256 leaf digests when few subtrees diverge.
  //
  // Scale shape: two 256-group scans (one per replica, local to it in
  // production), then everything downstream is arithmetic on ≤2·256
  // digest rows — a 9-way level explode of the leaf frames, per-level
  // aggregates, and a 9-row window for the descent recurrence. The
  // corpus never shuffles; depth and leaf count are constants
  // independent of row count.
  private def q254(s: SparkSession, d: String): DataFrame = {
    val modL = 2305843009213693951L // 2^61 - 1
    val nb = 1 << MerkleDepth
    def leaves(df: DataFrame): DataFrame =
      df.select(pmod(col("doc_id"), lit(nb.toLong)).as("leaf"),
          TextFns.hash60(concat_ws(":", col("doc_id"), col("text"))).as("h"))
        .groupBy(col("leaf"))
        .agg(pmod(sum(col("h").cast(DecimalType(38, 0))),
          lit(modL).cast(DecimalType(38, 0))).cast("long").as("dig"))
    val a = documents(s, d).select(col("doc_id"), col("text"))
    val b = documents(s, d)
      .filter(pmod(col("doc_id"), lit(97)) =!= 13)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(101)) === 7, concat(col("text"), lit("X")))
          .otherwise(col("text")).as("text"))
    def tree(df: DataFrame): DataFrame =
      leaves(df)
        .select(explode(sequence(lit(0), lit(MerkleDepth))).as("lvl"),
          col("leaf"), col("dig"))
        .withColumn("node", expr(s"leaf DIV CAST(pow(2, $MerkleDepth - lvl) AS BIGINT)"))
        .groupBy(col("lvl"), col("node"))
        .agg(pmod(sum(col("dig").cast(DecimalType(38, 0))),
          lit(modL).cast(DecimalType(38, 0))).cast("long").as("dig"))
    val dirty = tree(a).as("ta")
      .join(tree(b).as("tb"), Seq("lvl", "node"), "full_outer")
      .groupBy(col("lvl").as("level"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(col("ta.dig").isNull || col("tb.dig").isNull ||
          col("ta.dig") =!= col("tb.dig"), 1L).otherwise(0L)).as("n_dirty"))
    val wl = org.apache.spark.sql.expressions.Window.orderBy(col("level"))
    dirty
      .withColumn("probes",
        when(col("level") === 0, 1L)
          .otherwise(lag(col("n_dirty"), 1).over(wl) * 2))
      .withColumn("cum_probe_bytes",
        sum(col("probes") * ProbeBytes)
          .over(wl.rowsBetween(Long.MinValue, 0)))
      .orderBy(col("level"))
  }

  private val q254Sql = {
    val h = TextFns.hash60Sql("doc_id || ':' || text")
    val nb = 1 << MerkleDepth
    s"""WITH la AS (
      |  SELECT doc_id % $nb AS leaf,
      |    CAST(sum(CAST($h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM documents GROUP BY 1),
      |b0 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 101 = 7 THEN text || 'X' ELSE text END AS text
      |  FROM documents WHERE doc_id % 97 <> 13),
      |lb AS (
      |  SELECT doc_id % $nb AS leaf,
      |    CAST(sum(CAST($h AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM b0 GROUP BY 1),
      |lv AS (SELECT lvl FROM generate_series(0, $MerkleDepth) AS t(lvl)),
      |ta AS (
      |  SELECT lvl, leaf // CAST(pow(2, $MerkleDepth - lvl) AS BIGINT) AS node,
      |    CAST(sum(CAST(dig AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM la CROSS JOIN lv GROUP BY 1, 2),
      |tb AS (
      |  SELECT lvl, leaf // CAST(pow(2, $MerkleDepth - lvl) AS BIGINT) AS node,
      |    CAST(sum(CAST(dig AS HUGEINT)) % 2305843009213693951 AS BIGINT) AS dig
      |  FROM lb CROSS JOIN lv GROUP BY 1, 2),
      |dirty AS (
      |  SELECT COALESCE(ta.lvl, tb.lvl) AS level, count(*) AS n_nodes,
      |    CAST(sum(CASE WHEN ta.dig IS NULL OR tb.dig IS NULL
      |      OR ta.dig <> tb.dig THEN 1 ELSE 0 END) AS BIGINT) AS n_dirty
      |  FROM ta FULL OUTER JOIN tb ON ta.lvl = tb.lvl AND ta.node = tb.node
      |  GROUP BY 1),
      |pr AS (
      |  SELECT level, n_nodes, n_dirty,
      |    CASE WHEN level = 0 THEN 1
      |      ELSE lag(n_dirty) OVER (ORDER BY level) * 2 END AS probes
      |  FROM dirty)
      |SELECT level, n_nodes, n_dirty, probes,
      |  CAST(sum(probes * $ProbeBytes)
      |    OVER (ORDER BY level ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    AS cum_probe_bytes
      |FROM pr ORDER BY level""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q202_delta_join_view", q202, Some(q202Sql)),
    Q("q203_replica_diff", q203, Some(q203Sql)),
    Q("q233_rendezvous_shards", q233, Some(q233Sql)),
    Q("q237_iblt_reconcile", q237, Some(q237Sql)),
    Q("q245_sequence_gaps", q245, Some(q245Sql)),
    Q("q250_compaction_plan", q250, Some(q250Sql)),
    Q("q254_merkle_sync", q254, Some(q254Sql)),
  )
}
