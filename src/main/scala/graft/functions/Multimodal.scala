package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Stable._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`) — what is real and
  * tested is the Spark-side shape a production pipeline needs:
  * - schema: (id, media: binary, meta: struct(format, n_bytes)),
  * - batch processing via `mapPartitions` over a typed Dataset (the
  *   Scala analogue of arrow-batched pandas UDFs: one iterator per
  *   partition, amortizing per-batch setup like model/codec init),
  * - "frame sampling" that turns one blob into k feature rows
  *   (flatMap shape, output cardinality ≠ input cardinality),
  * - partition sizing: binary blobs make rows heavy, so the pipeline
  *   repartitions by id before the heavy stage — at 100 TB you size
  *   `maxPartitionBytes` so a partition of blobs fits executor memory.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  case class MediaRow(id: Long, media: Array[Byte], format: String)
  case class MediaFeatures(id: Long, format: String, n_bytes: Long,
      checksum: Long, n_frames: Int)
  case class Frame(id: Long, frame_idx: Int, frame_bytes: Long,
      frame_checksum: Long)

  /** STUB decode: a real build would invoke an image/audio codec here
    * (per-partition init, reused across the iterator). Deterministic
    * fake: byte-sum checksum. The ??? codec seam is this function. */
  def decodeStub(media: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < media.length) { acc = acc * 31 + (media(i) & 0xff); i += 1 }
    acc
  }

  /** Documents table lifted into the media shape: text bytes standing in
    * for an opaque blob (the plumbing doesn't care what the bytes are). */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("id"),
      col("text").cast("binary").as("media"),
      struct(lit("text/plain").as("format"),
        octet_length(col("text").cast("binary")).as("n_bytes")).as("meta"),
      col("source"))

  /** Batched feature extraction — mapPartitions so codec init happens
    * once per partition, not per row. */
  def extractFeatures(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .select(col("id"), col("media"), col("meta.format").as("format"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition "codec" init would go here
      rows.map { r =>
        MediaFeatures(r.id, r.format, r.media.length.toLong,
          decodeStub(r.media), n_frames = (r.media.length + 63) / 64)
      }
    }
  }

  case class Resized(id: Long, format: String, orig_bytes: Long,
      resized: Array[Byte], resized_bytes: Long)

  /** STUB resize: a real build would decode, scale, re-encode; the
    * deterministic fake keeps every 4th byte (stride decimation), so
    * output size is exactly ceil(n/4) — byte accounting stays
    * oracle-checkable while the blob transform itself is the stub. */
  def resizeStub(media: Array[Byte], stride: Int = 4): Array[Byte] = {
    val out = new Array[Byte]((media.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = media(i * stride); i += 1 }
    out
  }

  /** Batched resize — the blob-in/blob-out pipeline stage (thumbnailing,
    * audio downsampling): mapPartitions batch shape, binary column out. */
  def resize(spark: SparkSession, sfDir: String): Dataset[Resized] = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .select(col("id"), col("media"), col("meta.format").as("format"))
      .as[MediaRow]
    media.mapPartitions { rows =>
      // per-partition codec init would go here
      rows.map { r =>
        val rz = resizeStub(r.media)
        Resized(r.id, r.format, r.media.length.toLong, rz, rz.length.toLong)
      }
    }
  }

  /** Frame sampling: one row per 64-byte "frame" (flatMap shape). */
  def sampleFrames(spark: SparkSession, sfDir: String): Dataset[Frame] = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
      .select(col("id"), col("media"), col("meta.format").as("format"))
      .as[MediaRow]
    media.flatMap { r =>
      r.media.grouped(64).zipWithIndex.map { case (chunk, idx) =>
        Frame(r.id, idx, chunk.length.toLong, decodeStub(chunk))
      }
    }
  }

  // ---------------------------------------------------------------- q47
  /** Oracle-checkable slice of the pipeline: per-source media inventory
    * over the binary column + metadata struct (byte accounting is
    * portable; the checksum/frame stages are covered by unit tests). */
  def q47MultimodalInventory(spark: SparkSession, sfDir: String): DataFrame = {
    val m = mediaTable(spark, sfDir)
    m.groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        asLong(sum(octet_length(col("media")))).as("total_bytes"),
        asLong(max(col("meta.n_bytes"))).as("max_bytes"),
        (sum(octet_length(col("media"))).cast("double") / count(lit(1)))
          .as("avg_bytes"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q66
  /** Frame sampling on the oracle surface: the flatMap fan-out of
    * `sampleFrames` (one row per 64-byte frame), re-aggregated per doc so
    * DuckDB can reproduce it exactly with `generate_series` — per-frame
    * byte accounting is pure arithmetic. Only the checksum stub stays
    * unit-test-only (engine-specific). */
  def q66FrameSample(spark: SparkSession, sfDir: String): DataFrame = {
    sampleFrames(spark, sfDir).toDF()
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_frames"),
        asLong(sum(col("frame_bytes"))).as("total_bytes"),
        asLong(max(col("frame_idx"))).as("last_idx"),
        asLong(min(col("frame_bytes"))).as("min_frame_bytes"))
      .orderBy(col("id"))
  }

  // ---------------------------------------------------------------- q75
  /** Resize on the oracle surface: per-source byte accounting of the
    * blob-in/blob-out stage — resized size is exactly ceil(n/4), so
    * DuckDB reproduces the aggregate arithmetic; the blob contents are
    * pinned by a unit test. */
  def q75MultimodalResize(spark: SparkSession, sfDir: String): DataFrame = {
    val src = mediaTable(spark, sfDir).select(col("id"), col("source"))
    resize(spark, sfDir).toDF()
      .join(src, Seq("id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_media"),
        asLong(sum(col("orig_bytes"))).as("orig_total"),
        asLong(sum(col("resized_bytes"))).as("resized_total"),
        asLong(max(col("resized_bytes"))).as("max_resized"))
      .orderBy(col("source"))
  }

  lazy val defs: Map[String, Q] = Map(
    "q47_multimodal_inventory" -> q47MultimodalInventory,
    "q66_frame_sample" -> q66FrameSample,
    "q75_multimodal_resize" -> q75MultimodalResize,
  )

  lazy val sql: Map[String, String] = Map(
    "q47_multimodal_inventory" -> """
      SELECT source, count(1) AS n_media,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes,
        CAST(sum(octet_length(encode(text))) AS DOUBLE) / count(1) AS avg_bytes
      FROM documents
      GROUP BY source
      ORDER BY source""",
    "q66_frame_sample" -> """
      WITH d AS (
        SELECT doc_id AS id, octet_length(encode(text)) AS nb FROM documents),
      frames AS (
        SELECT id, i AS frame_idx,
          CASE WHEN (i + 1) * 64 <= nb THEN 64 ELSE nb - i * 64 END AS frame_bytes
        FROM d, unnest(generate_series(0, (nb + 63) // 64 - 1)) AS t(i))
      SELECT id, count(1) AS n_frames,
        CAST(sum(frame_bytes) AS BIGINT) AS total_bytes,
        CAST(max(frame_idx) AS BIGINT) AS last_idx,
        CAST(min(frame_bytes) AS BIGINT) AS min_frame_bytes
      FROM frames
      GROUP BY id
      ORDER BY id""",
    "q75_multimodal_resize" -> """
      SELECT source, count(1) AS n_media,
        CAST(sum(octet_length(encode(text))) AS BIGINT) AS orig_total,
        CAST(sum((octet_length(encode(text)) + 3) // 4) AS BIGINT)
          AS resized_total,
        CAST(max((octet_length(encode(text)) + 3) // 4) AS BIGINT)
          AS max_resized
      FROM documents
      GROUP BY source
      ORDER BY source""",
  )
}
