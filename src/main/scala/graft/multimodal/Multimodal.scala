package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction / frame-sampling run as BATCHED
  * per-partition transforms — the Spark-side architecture (schema,
  * partitioning, batch shape) is real; only the codec itself is a
  * deterministic STUB (no image/audio libraries exist in this
  * container, and none may be added).
  *
  * Scale design: payloads never shuffle unless a downstream op needs
  * them — metadata extraction happens scan-side so later filters
  * (`width > X`, `kind = 'image'`) prune before any exchange. The
  * batched mapPartitions mirrors the Arrow-batch shape a Pandas-UDF
  * (`mapInPandas`) pipeline would have on a Python stack: the decoder
  * is invoked once per batch of `DecodeBatchSize` records, not once per
  * record, which is what amortizes model/codec init cost at 100 TB.
  */
object Multimodal {

  val DecodeBatchSize = 64

  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** STUB codec =========================================================
    * Stands in for libjpeg/ffmpeg/soundfile. Deterministic on payload
    * bytes so tests are stable: "dimensions" are derived from the first
    * payload bytes, the "feature" is a byte checksum. The real system
    * would swap `decodeBatch` for a JNI/process-pool codec invocation —
    * the batch-shaped call site is the part that matters.
    */
  private[multimodal] def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val b = r.payload
      val len = b.length.toLong
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += (b(i) & 0xff); i += 1 }
      val w = if (b.length > 0) 16 + (b(0) & 0xff) % 240 else 0
      val h = if (b.length > 1) 16 + (b(1) & 0xff) % 240 else 0
      val frames = r.kind match {
        case "video" => 1 + (len % 24).toInt
        case "audio" => 1
        case _ => 1
      }
      MediaFeatures(r.media_id, r.kind, len, sum % 997, w, h, frames)
    }

  /** Batched decode/feature-extract over a media Dataset. */
  def extractFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(batch => decodeBatch(batch))
    }
  }

  /** Deterministic frame sampling for "video" payloads: every `stride`-th
    * DecodeBatchSize-byte chunk becomes a frame row (media_id, frame_no,
    * frame payload) — the explode-shaped stage of a video pipeline.
    */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): Dataset[(Long, Int, Array[Byte])] = {
    import ds.sparkSession.implicits._
    ds.filter((r: MediaRecord) => r.kind == "video").flatMap { r =>
      r.payload.grouped(DecodeBatchSize).zipWithIndex.collect {
        case (chunk, i) if i % stride == 0 => (r.media_id, i, chunk)
      }
    }
  }

  /** Build a deterministic media table from `documents` (the container
    * has no real media files): payload = UTF-8 bytes of the text, kind
    * assigned round-robin. The point is the column layout — binary
    * payload + typed metadata — not the bytes.
    */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        MediaRecord(id, kind, text.getBytes("UTF-8"))
      }
  }

  /** The registered query: metadata + features per media row. The stub
    * codec is pure byte arithmetic over the UTF-8 payload, so it IS
    * SQL-expressible — [[q70Sql]] recomputes it in DuckDB by decoding
    * the payload's hex dump byte-by-byte (DuckDB has no direct
    * get-byte, but `hex(encode(text))` + per-pair strpos arithmetic is
    * exact).
    */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy("media_id")
  }

  /** DuckDB oracle for [[mediaFeaturesQuery]]: byte values come from the
    * hex dump — byte i = 16·hexval(2i+1) + hexval(2i+2) with
    * hexval(c) = strpos('0123456789ABCDEF', c) − 1.
    */
  val q70Sql: String = {
    // byte value at 0-based position `i` of the hex string `hx`
    def byteAt(i: String): String =
      s"((strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    s"""WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents)
      |SELECT media_id, kind, CAST(len AS BIGINT) AS byte_len,
      |  CAST(coalesce(list_sum(list_transform(range(len), i -> ${byteAt("i")})), 0)
      |    % 997 AS BIGINT) AS checksum,
      |  CAST(CASE WHEN len > 0 THEN 16 + ${byteAt("0")} % 240 ELSE 0 END AS INT) AS width,
      |  CAST(CASE WHEN len > 1 THEN 16 + ${byteAt("1")} % 240 ELSE 0 END AS INT) AS height,
      |  CAST(CASE WHEN kind = 'video' THEN 1 + len % 24 ELSE 1 END AS INT) AS n_frames
      |FROM m
      |ORDER BY media_id""".stripMargin
  }

  /** Registered frame-sampling query: every 2nd chunk-frame of each
    * "video" payload, the explode-shaped stage of a video ingest
    * pipeline. The frame bytes are emitted hex-encoded so the DuckDB
    * oracle ([[q71Sql]]) can reproduce them as substrings of the
    * payload's hex dump — the chunk math and the bytes are both
    * oracle-checked without relying on cross-engine binary hashing.
    */
  def frameSamplesQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, sfDir), stride = 2)
      .toDF("media_id", "frame_no", "frame")
      .select(col("media_id"), col("frame_no"), hex(col("frame")).as("frame_hex"))
      .orderBy("media_id", "frame_no")

  /** pHash-style 60-bit perceptual fingerprint of a decoded payload:
    * the payload is divided into 60 contiguous byte blocks (block of
    * byte j = 60·j div len), and bit i is set iff block i's byte sum
    * exceeds the truncated mean block sum — the block-DCT-sign trick of
    * pHash reduced to the stub codec's byte domain. 60 bits (not 64)
    * keeps every shift/sum inside non-negative BIGINT range in both
    * engines. Deterministic on payload bytes; a real system computes
    * the same shape from decoded pixels.
    */
  private[multimodal] def pHash60(b: Array[Byte]): Long = {
    val len = b.length
    if (len == 0) return 0L
    val sums = new Array[Long](60)
    var j = 0
    while (j < len) { sums(((60L * j) / len).toInt) += (b(j) & 0xff); j += 1 }
    var total = 0L
    var i = 0
    while (i < 60) { total += sums(i); i += 1 }
    val mean = total / 60
    var h = 0L
    i = 0
    while (i < 60) { if (sums(i) > mean) h |= (1L << i); i += 1 }
    h
  }

  /** Batched perceptual-hash extraction (same batch shape as
    * [[extractFeatures]] — one codec invocation per batch).
    */
  def perceptualHashes(ds: Dataset[MediaRecord]): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap(_.map(r => (r.media_id, pHash60(r.payload))))
    }
  }

  /** Max hamming distance for the near-dup verdict. With 4 bands of 15
    * bits, hamming ≤ 3 forces at least one band to match EXACTLY
    * (pigeonhole: 3 differing bits cannot touch all 4 bands), so the
    * banded join finds the complete ≤3 pair set — the oracle checks
    * against a plain all-pairs filter and the results are provably
    * identical, not approximately so.
    */
  val PhashMaxHam = 3
  private val PhashBands = 4
  private val BandBits = 15 // 60 / 4

  /** q127 — media near-dup via perceptual hashing: the image-dedup
    * stage of a multimodal pipeline (pHash + banded LSH — near-
    * identical images differ in a few bits, verbatim copies in none).
    * Scale shape: the phash frame (8 bytes/media) materializes once
    * (payloads are decoded exactly once and never shuffle); candidates
    * come from a 4-band self-equi-join on 15-bit band values — band
    * buckets are bounded by duplicate-class sizes, the q32/q36
    * hot-bucket triangle split applies unchanged if a degenerate
    * corpus needs it — and the hamming verify runs inside codegen on
    * the 8-byte hashes.
    */
  def mediaNearDupQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ph = perceptualHashes(mediaFromDocuments(spark, sfDir))
      .toDF("media_id", "phash").localCheckpoint()
    val bands = ph.select(col("media_id"), col("phash"),
      explode(sequence(lit(0), lit(PhashBands - 1))).as("b"))
      .withColumn("bv", expr(s"shiftright(phash, b * $BandBits) & ${(1 << BandBits) - 1}"))
    bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        expr("bit_count(x.phash ^ y.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= PhashMaxHam)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** DuckDB oracle for [[mediaNearDupQuery]]: phash recomputed from the
    * hex dump, then a plain all-pairs hamming filter (exactly equal to
    * the banded join for hamming ≤ [[PhashMaxHam]] — see the pigeonhole
    * note).
    */
  val q127Sql: String = {
    def byteAt(i: String): String =
      s"((strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    s"""WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents),
      |b AS (
      |  SELECT media_id, (60*j)//len AS blk, ${byteAt("j")} AS v
      |  FROM (SELECT media_id, hx, len, unnest(range(len)) AS j FROM m)),
      |bs AS (
      |  SELECT media_id, blk, sum(v) AS s,
      |    sum(sum(v)) OVER (PARTITION BY media_id) AS total
      |  FROM b GROUP BY media_id, blk),
      |ph AS (
      |  SELECT media_id,
      |    sum(CASE WHEN s > total//60 THEN 1::BIGINT << blk ELSE 0 END) AS phash
      |  FROM bs GROUP BY media_id)
      |SELECT a.media_id AS id_a, b.media_id AS id_b,
      |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
      |FROM ph a JOIN ph b ON a.media_id < b.media_id
      |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashMaxHam
      |ORDER BY id_a, id_b""".stripMargin
  }

  /** Per-frame "energy" (byte sum) for every DecodeBatchSize-byte chunk
    * of the selected kind's payloads — the decode-adjacent feature pass
    * of an audio pipeline, batched like [[extractFeatures]].
    */
  def frameEnergies(ds: Dataset[MediaRecord], kind: String): Dataset[(Long, Int, Long)] = {
    import ds.sparkSession.implicits._
    ds.filter((r: MediaRecord) => r.kind == kind).flatMap { r =>
      r.payload.grouped(DecodeBatchSize).zipWithIndex.map { case (chunk, i) =>
        var e = 0L
        var k = 0
        while (k < chunk.length) { e += (chunk(k) & 0xff); k += 1 }
        (r.media_id, i, e)
      }
    }
  }

  /** q209 — VAD-style activity segmentation over "audio" payloads: each
    * payload decodes to frames (64-byte chunks), a frame is ACTIVE iff
    * its energy exceeds the payload's mean frame energy (exact integer
    * compare e·n > total), and maximal runs of consecutive active
    * frames become segments — the gaps-and-islands pass every
    * speech/music pipeline runs before transcription. Output is one row
    * per segment with its frame span and energy mass.
    *
    * Scale shape: payloads decode once (batched, scan-side) into
    * (media_id, frame_no, energy) rows — 1/64th the payload bytes —
    * and every later step is per-media windows over bounded per-key
    * frame counts (payload_len/64), partitioned by media_id. Payload
    * bytes never shuffle; the islands trick (frame_no − row_number)
    * needs no global sort.
    */
  def audioSegmentsQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = frameEnergies(mediaFromDocuments(spark, sfDir), "audio")
      .toDF("media_id", "frame_no", "energy")
    val tot = fr.groupBy(col("media_id"))
      .agg(sum(col("energy")).as("total"), count(lit(1)).as("nf"))
    val active = fr.join(tot, Seq("media_id"))
      .filter(col("energy") * col("nf") > col("total"))
    val wm = Window.partitionBy(col("media_id")).orderBy(col("frame_no"))
    val isl = active
      .withColumn("grp", col("frame_no") - row_number().over(wm))
      .groupBy(col("media_id"), col("grp"))
      .agg(min(col("frame_no")).as("start_frame"),
        max(col("frame_no")).as("end_frame"),
        count(lit(1)).cast("long").as("n_frames"),
        sum(col("energy")).as("energy"))
    isl.withColumn("seg_no",
        row_number().over(Window.partitionBy(col("media_id")).orderBy(col("start_frame")))
          .cast("long"))
      .select(col("media_id"), col("seg_no"), col("start_frame"),
        col("end_frame"), col("n_frames"), col("energy"))
      .orderBy(col("media_id"), col("seg_no"))
  }

  /** DuckDB oracle for [[audioSegmentsQuery]]: frame energies recomputed
    * from the hex dump (chunk i covers bytes [64i, min(64(i+1), len))),
    * then the same mean gate and islands grouping.
    */
  val q209Sql: String = {
    def byteAt(i: String): String =
      s"((strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    s"""WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents WHERE doc_id % 3 = 1),
      |f AS (
      |  SELECT media_id,
      |    CAST(i AS INT) AS frame_no,
      |    CAST(list_sum(list_transform(
      |      range(least($DecodeBatchSize, len - $DecodeBatchSize * i)),
      |      k -> ${byteAt(s"$DecodeBatchSize * i + k")})) AS BIGINT) AS energy
      |  FROM (SELECT media_id, hx, len,
      |      unnest(range(CAST(ceil(len / $DecodeBatchSize.0) AS BIGINT))) AS i
      |    FROM m)),
      |t AS (
      |  SELECT media_id, sum(energy) AS total, count(*) AS nf
      |  FROM f GROUP BY media_id),
      |a AS (
      |  SELECT f.media_id, f.frame_no, f.energy,
      |    f.frame_no - row_number() OVER (PARTITION BY f.media_id
      |      ORDER BY f.frame_no) AS grp
      |  FROM f JOIN t USING (media_id)
      |  WHERE f.energy * t.nf > t.total),
      |s AS (
      |  SELECT media_id, grp, min(frame_no) AS start_frame,
      |    max(frame_no) AS end_frame, count(*) AS n_frames,
      |    CAST(sum(energy) AS BIGINT) AS energy
      |  FROM a GROUP BY media_id, grp)
      |SELECT media_id,
      |  row_number() OVER (PARTITION BY media_id ORDER BY start_frame)
      |    AS seg_no,
      |  start_frame, end_frame, n_frames, energy
      |FROM s
      |ORDER BY media_id, seg_no""".stripMargin
  }

  // ======================================================================
  // q284 — cross-modal pair-integrity audit (the CLIP-style check):
  // verify that paired text/media columns actually belong together.
  // Each side embeds through its own modality path — text through the
  // token-bucket head directly, media through the stub cross-modal
  // encoder (a real system runs a trained image/audio tower; the
  // deterministic stand-in "captions" the payload via decode and shares
  // the text head — the seam where a model swaps in). Pair score is
  // EXACT integer cosine² in 2^20 fixed point (dot²·S div (‖a‖²·‖b‖²),
  // DECIMAL(38,0)-staged); with exact stub encoders a matched pair
  // scores exactly S with EQUAL squared norms, so the gate is
  // cos2 < S OR na <> nb. The two terms split the failure modes:
  // non-parallel content breaks the cosine; parallel-but-proportional
  // content ("alpha" vs "alpha alpha") scores exactly S and only the
  // norm term catches it (n_norm_flagged counts those). The one swap
  // no content-based check can see — CLIP-gate included — is genuinely
  // identical content under two ids: equal vectors on both sides are
  // indistinguishable by construction (pinned in PairIntegritySpec).
  // The audited manifest carries a
  // deterministic ingest corruption (docs with doc_id % 23 == 3 claim
  // media doc_id XOR 1 — the adjacent-shard off-by-one) so the audit
  // measures real mismatches, not a vacuous all-green table.
  //
  // Scale shape: one corpus scan per modality into (id, 32-bucket
  // count) frames — 33 longs per row, a tiny fraction of the payload
  // bytes, and payloads never shuffle; the audit is two id-keyed
  // equi-joins (manifest ⋈ textVec ⋈ mediaVec, all corpus-scale,
  // nothing broadcast — the q123 bipartite shape) and one combinable
  // per-kind aggregate. Docs whose claimed media id does not exist
  // drop at the join in both engines (dense ids here; a production
  // run would left-join and count them).
  // ======================================================================

  /** Cross-modal embedding head width (hashed token-count buckets). */
  val PairBuckets = 32

  /** Fixed-point scale for pair cosine² (2^20, the repo standard). */
  val PairFpScale = 1048576L

  private def bucketCols(prefix: String): Seq[org.apache.spark.sql.Column] =
    (0 until PairBuckets).map(i =>
      sum(when(col("bk") === i.toLong, 1L).otherwise(0L)).as(s"$prefix$i"))

  /** Shared embedding head: hashed-token-bucket counts per id. Extra
    * key columns (e.g. kind) ride through the groupBy.
    */
  private def bucketVecs(df: DataFrame, idCols: Seq[String], txtCol: String,
      prefix: String): DataFrame = {
    val keys = idCols.map(col)
    val cols = bucketCols(prefix)
    df.select(keys :+
        explode(graft.functions.TextFns.tokens(col(txtCol))).as("tok"): _*)
      .withColumn("bk",
        pmod(graft.functions.TextFns.hash60(col("tok")), lit(PairBuckets.toLong)))
      .groupBy(keys: _*)
      .agg(cols.head, cols.tail: _*)
  }

  /** Text-side vectors: (doc_id, t0..t31). */
  private[multimodal] def textVecsOf(docs: DataFrame): DataFrame =
    bucketVecs(docs, Seq("doc_id"), "text", "t")

  /** Media-side vectors through the stub cross-modal encoder:
    * (media_id, kind, m0..m31). Payloads decode ONCE, scan-side.
    */
  private[multimodal] def captionVecsOf(media: Dataset[MediaRecord]): DataFrame =
    bucketVecs(
      media.toDF().select(col("media_id"), col("kind"),
        decode(col("payload"), "UTF-8").as("caption")),
      Seq("media_id", "kind"), "caption", "m")

  /** The audit core over any (doc_id, media_id) manifest: per claimed
    * media kind — pair count, pairs below the exact-alignment gate,
    * and the min/avg cosine² distribution. Spec-driven with planted
    * swaps in PairIntegritySpec.
    */
  private[multimodal] def pairIntegrityOf(textVecs: DataFrame,
      mediaVecs: DataFrame, manifest: DataFrame): DataFrame = {
    val dot = (0 until PairBuckets)
      .map(i => s"t$i * m$i").mkString(" + ")
    val na = (0 until PairBuckets).map(i => s"t$i * t$i").mkString(" + ")
    val nb = (0 until PairBuckets).map(i => s"m$i * m$i").mkString(" + ")
    manifest.join(textVecs, "doc_id").join(mediaVecs, "media_id")
      .select(col("kind"), expr(dot).as("dot"),
        expr(na).as("na"), expr(nb).as("nb"))
      .select(col("kind"), expr(
        s"""CASE WHEN na = 0 OR nb = 0 THEN 0L
           |  ELSE CAST(CAST(dot AS DECIMAL(38,0)) * dot * $PairFpScale
           |    div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("cos2"),
        (col("na") =!= col("nb")).as("norm_mismatch"))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cos2") < PairFpScale || col("norm_mismatch"), 1L)
          .otherwise(0L)).as("n_flagged"),
        // the proportional-content catches only the norm term sees
        sum(when(col("cos2") >= PairFpScale && col("norm_mismatch"), 1L)
          .otherwise(0L)).as("n_norm_flagged"),
        min(col("cos2")).as("min_cos2_fp"),
        expr(s"sum(cos2) div count(1)").as("avg_cos2_fp"))
      .orderBy(col("kind"))
  }

  /** The registered query: audit the deterministically-corrupted
    * manifest over the documents-derived media table.
    */
  def pairIntegrityQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir)
    val manifest = docs.select(col("doc_id"),
      when(pmod(col("doc_id"), lit(23L)) === 3L, expr("doc_id ^ 1"))
        .otherwise(col("doc_id")).as("media_id"))
    pairIntegrityOf(
      textVecsOf(docs),
      captionVecsOf(mediaFromDocuments(spark, sfDir)),
      manifest)
  }

  /** DuckDB oracle for [[pairIntegrityQuery]]: both towers recomputed
    * from documents (the stub caption decode is the identity on the
    * UTF-8 round trip, so the media vectors are the text vectors keyed
    * by media id + kind), HUGEINT-staged cosine², same gate.
    */
  val q284Sql: String = {
    val h = graft.functions.TextFns.hash60Sql("tok")
    val tCols = (0 until PairBuckets)
      .map(i => s"sum(CASE WHEN bk = $i THEN 1 ELSE 0 END) AS t$i")
      .mkString(",\n    ")
    val mCols = (0 until PairBuckets).map(i => s"t$i AS m$i").mkString(", ")
    val dot = (0 until PairBuckets).map(i => s"t$i * m$i").mkString(" + ")
    val na = (0 until PairBuckets).map(i => s"t$i * t$i").mkString(" + ")
    val nb = (0 until PairBuckets).map(i => s"m$i * m$i").mkString(" + ")
    s"""WITH tv AS MATERIALIZED (
      |  SELECT doc_id,
      |    $tCols
      |  FROM (
      |    SELECT doc_id, $h % $PairBuckets AS bk
      |    FROM (SELECT doc_id,
      |            unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
      |          FROM documents))
      |  GROUP BY doc_id),
      |mv AS (
      |  SELECT doc_id AS media_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS kind,
      |    $mCols
      |  FROM tv),
      |mf AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 23 = 3 THEN xor(doc_id, 1) ELSE doc_id END
      |      AS media_id
      |  FROM documents),
      |j AS (
      |  SELECT kind, $dot AS dot, $na AS na, $nb AS nb
      |  FROM mf JOIN tv USING (doc_id) JOIN mv USING (media_id)),
      |c AS (
      |  SELECT kind,
      |    CASE WHEN na = 0 OR nb = 0 THEN 0
      |      ELSE CAST(CAST(dot AS HUGEINT) * dot * $PairFpScale
      |        // (CAST(na AS HUGEINT) * nb) AS BIGINT) END AS cos2,
      |    na <> nb AS norm_mismatch
      |  FROM j)
      |SELECT kind, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CASE WHEN cos2 < $PairFpScale OR norm_mismatch
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
      |  CAST(sum(CASE WHEN cos2 >= $PairFpScale AND norm_mismatch
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_norm_flagged,
      |  CAST(min(cos2) AS BIGINT) AS min_cos2_fp,
      |  CAST(sum(cos2) // count(*) AS BIGINT) AS avg_cos2_fp
      |FROM c
      |GROUP BY kind
      |ORDER BY kind""".stripMargin
  }

  /** DuckDB oracle for [[frameSamplesQuery]]: chunk i of the payload is
    * hex positions [2·64·i+1, 2·64·(i+1)] (substr clamps the tail).
    */
  val q71Sql: String =
    s"""WITH m AS (
      |  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
      |    octet_length(encode(text)) AS len
      |  FROM documents WHERE doc_id % 3 = 2),
      |f AS (
      |  SELECT media_id, hx,
      |    unnest(range(CAST(ceil(len / $DecodeBatchSize.0) AS BIGINT))) AS i
      |  FROM m)
      |SELECT media_id, CAST(i AS INT) AS frame_no,
      |  substr(hx, CAST(2*$DecodeBatchSize*i + 1 AS INT), ${2 * DecodeBatchSize}) AS frame_hex
      |FROM f WHERE i % 2 = 0
      |ORDER BY media_id, frame_no""".stripMargin
}
