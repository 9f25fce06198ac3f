package graft.mm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media
  * rides as an opaque BINARY column with typed metadata; decode /
  * feature-extract / frame-sample run as mapPartitions-batched typed
  * transforms (the same shape real image/audio decoders need — batch
  * the bytes, call the codec, emit fixed-schema features).
  *
  * The codecs themselves are NOT in this container, so the decode step
  * is a clearly-marked DETERMINISTIC STUB (arithmetic over the bytes,
  * reproducible in ANSI SQL so the driver's oracle still verifies the
  * plumbing end-to-end: schema, batching, partitioning, row alignment).
  * Swap `stubDecode` for a real codec call to productionize.
  */
object MultimodalOps {

  /** Typed per-asset metadata a real decoder would emit. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      frame_hashes: Seq[String])

  val FrameCount = 4
  val FrameChars = 100

  /** STUB decoder — deterministic fake dimensions + frame hashes.
    * width/height derive from the payload length (a real decoder reads
    * them from the container header); frame sampling hashes fixed
    * character windows (a real sampler decodes frames and fingerprints
    * pixels). Replace with a codec call for production. */
  private def stubDecode(docId: Long, text: String): MediaMeta = {
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = java.security.MessageDigest.getInstance("MD5")
    val frames = (0 until FrameCount).map { i =>
      val s = text.substring(
        math.min(i * FrameChars, text.length),
        math.min(i * FrameChars + FrameChars, text.length))
      md.reset()
      md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(b => f"$b%02x").mkString
    }
    MediaMeta(
      doc_id = docId,
      byte_len = bytes.length.toLong,
      width = 32 + (bytes.length % 97).toInt,
      height = 32 + (bytes.length * 7 % 89).toInt,
      frame_hashes = frames)
  }

  /** Decode + feature-extract over the binary column, batched per
    * partition (reference embedding batch pattern, Base_Neo4j.py:203).
    * Input arrives as (doc_id, payload BINARY) — the `documents.text`
    * bytes stand in for media payloads in the sandbox. */
  def decodeMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    docs.as[(Long, Array[Byte])].mapPartitions { it =>
      // batch shape: drain the partition in fixed-size batches, the way
      // a real vectorized codec call would consume them
      it.grouped(64).flatMap { batch =>
        batch.map { case (id, payload) =>
          stubDecode(id, new String(payload, java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    }.toDF()
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        concat_ws(",", col("frame_hashes")).as("frames_joined"))
  }
}
