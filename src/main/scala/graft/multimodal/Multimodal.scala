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

  /** The registered query: metadata + features per media row (rows-only
    * check — the stub codec is not SQL-expressible; semantics are
    * pinned by MultimodalSpec instead).
    */
  def mediaFeaturesQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaFromDocuments(spark, sfDir))
      .toDF()
      .orderBy("media_id")
  }

  /** Registered frame-sampling query (rows-only check, like
    * [[mediaFeaturesQuery]]): every 2nd chunk-frame of each "video"
    * payload, the explode-shaped stage of a video ingest pipeline.
    */
  def frameSamplesQuery(spark: SparkSession, sfDir: String): DataFrame =
    sampleFrames(mediaFromDocuments(spark, sfDir), stride = 2)
      .toDF("media_id", "frame_no", "frame")
      .orderBy("media_id", "frame_no")
}
