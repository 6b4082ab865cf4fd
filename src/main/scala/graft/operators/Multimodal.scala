package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, flowing through Spark as first-class
  * columns. The real decode libraries are not in this container, so
  * the decode step is a clearly-marked deterministic STUB
  * (`decodeStub`) — but the Spark-side machinery is real and tested:
  * binary schema, per-partition batch decode via mapPartitions over a
  * typed Dataset (the Scala analog of mapInPandas batches), frame
  * sampling via binary slicing, and metadata projection.
  *
  * At scale: payloads dominate bytes — keep them in their own column
  * so column pruning skips them unless a decode stage needs them;
  * decode is map-only (no shuffle) and streams batch-wise per
  * partition.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  // all counts Long so the output schema matches the oracle's BIGINTs
  case class DecodedRow(media_id: Long, kind: String, byte_len: Long,
                        width: Long, height: Long, n_frames: Long, first_frame_hex: String)

  /** Synthesize a deterministic media table from `documents` (text
    * bytes as the opaque payload) — the container has no real media
    * files; the schema/flow is what matters. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: a real implementation would call an image/audio
    * codec here (per-partition, batched). Deterministic fake keeps the
    * pipeline testable and oracle-checkable. */
  def decodeStub(r: MediaRow): DecodedRow = {
    val len = r.payload.length.toLong
    val hex = r.payload.take(8).map(b => f"${b & 0xff}%02x").mkString
    DecodedRow(r.media_id, r.kind, len,
      width = 64 + (len * 7 % 577),
      height = 48 + (len * 13 % 433),
      n_frames = 1 + len % 7,
      first_frame_hex = hex)
  }

  /** The mapInPandas-shaped decode stage: typed Dataset in, batched
    * per-partition transform, typed Dataset out. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(_.map(decodeStub))
  }

  /** End-to-end decode query (oracle-checkable because the stub is a
    * pure function of the payload bytes). */
  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    decode(spark, mediaTable(spark, dir)).toDF().orderBy(col("media_id"))

  /** Frame sampling via binary slicing — every `stride` bytes take an
    * 8-byte "frame" window; pure column expressions, no decode. */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 64): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("byte_len"),
        explode(sequence(lit(1), greatest((length(col("payload")) / stride).cast("int"), lit(1))))
          .as("_f"))
      .select(col("media_id"), col("kind"), col("byte_len"),
        col("_f").cast("long").as("frame_no"),
        ((col("_f") - 1) * stride + 1).cast("long").as("offset"))
      .orderBy(col("media_id"), col("frame_no"))

  /** STUB feature extraction with real plumbing: the payload is
    * sliced into four windows (via its hex encoding — byte-exact on
    * both engines, unlike string slicing of multibyte text) and each
    * window hashed to a small deterministic "feature". A real
    * implementation would run an embedding model per window here —
    * the schema (fixed-width feature columns per media row), the
    * map-only shape, and the pruned payload column are the part that
    * carries to 100 TB. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    val hexp = lower(hex(col("payload")))
    def feat(s: Int) =
      conv(substring(md5(substring(hexp, s * 512 + 1, 512)), 1, 1), 16, 10)
        .cast("long").as(s"f$s")
    mediaTable(spark, dir)
      .select(Seq(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("byte_len")) ++ (0 until 4).map(feat): _*)
      .orderBy(col("media_id"))
  }
}
