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
