package graft.mm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed per-asset metadata a real decoder would emit. */
final case class MediaMeta(
    doc_id: Long,
    byte_len: Long,
    width: Int,
    height: Int,
    frame_hashes: Seq[String])

/** Pluggable media decoder. The Spark-side plumbing (schema, fixed-size
  * partition batches, row alignment) is codec-independent: a
  * codec-equipped deployment implements ONE method — decode a batch of
  * (doc_id, payload) into [[MediaMeta]] — and passes it to
  * [[MultimodalOps.decodeMeta]]; no query code changes. Must be
  * Serializable (ships inside the mapPartitions closure). */
trait FrameDecoder extends Serializable {
  /** One vectorized codec call: a partition batch of payloads in, one
    * metadata row per input (same order) out. */
  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta]
}

/** Sandbox [[FrameDecoder]]: the codecs are NOT in this container, so
  * decode is a clearly-marked DETERMINISTIC STUB — arithmetic over the
  * bytes, reproducible in ANSI SQL so the driver's oracle verifies the
  * plumbing end-to-end. width/height derive from the payload length (a
  * real decoder reads them from the container header); frame sampling
  * hashes fixed character windows (a real sampler decodes frames and
  * fingerprints pixels). */
object StubFrameDecoder extends FrameDecoder {
  import MultimodalOps.{FrameChars, FrameCount}

  def decodeBatch(batch: Seq[(Long, Array[Byte])]): Seq[MediaMeta] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { case (docId, payload) =>
      val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
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
        byte_len = payload.length.toLong,
        width = 32 + (payload.length % 97),
        height = 32 + (payload.length * 7 % 89),
        frame_hashes = frames)
    }
  }
}

/** Multimodal-column plumbing for the training-data pipeline: media
  * rides as an opaque BINARY column with typed metadata; decode /
  * feature-extract / frame-sample run as mapPartitions-batched typed
  * transforms (the same shape real image/audio decoders need — batch
  * the bytes, call the codec, emit fixed-schema features). The codec is
  * a [[FrameDecoder]] plug-point; [[StubFrameDecoder]] is the sandbox
  * implementation.
  */
object MultimodalOps {

  val FrameCount = 4
  val FrameChars = 100
  val BatchSize = 64

  /** Decode + feature-extract over the binary column, batched per
    * partition (reference embedding batch pattern, Base_Neo4j.py:203).
    * Input arrives as (doc_id, payload BINARY) — the `documents.text`
    * bytes stand in for media payloads in the sandbox. */
  def decodeMeta(spark: SparkSession, sfDir: String,
      decoder: FrameDecoder = StubFrameDecoder): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    docs.as[(Long, Array[Byte])].mapPartitions { it =>
      // batch shape: drain the partition in fixed-size batches, the way
      // a real vectorized codec call would consume them
      it.grouped(BatchSize).flatMap(decoder.decodeBatch)
    }.toDF()
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        concat_ws(",", col("frame_hashes")).as("frames_joined"))
  }
}
