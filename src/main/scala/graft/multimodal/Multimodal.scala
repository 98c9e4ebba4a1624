package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode /
  * frame-sample / feature-extract plumbing a training-data pipeline
  * runs over them.
  *
  * The pixel/feature decode is a clearly-marked deterministic STUB
  * (`decode` below) — no pixel codecs exist in this environment — but
  * container HEADER parsing is real: [[ImageHeaders]] extracts
  * width/height/depth/channels from genuine PNG/JPEG/GIF byte streams
  * (judged as q122 via the codegen'd `image_meta` expression). The
  * Spark-side shape is real and is what matters at scale: payloads
  * stay opaque binary (never parsed by Catalyst), metadata rides in
  * ordinary typed columns (filterable/prunable without touching
  * bytes), and feature extraction runs as `mapPartitions` over a typed
  * Dataset so a real decoder would amortize model/codec init once per
  * partition and stream record batches through it.
  */
object Multimodal {

  /** One media record: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte], format: String,
                         width: Int, height: Int, n_frames: Int)

  case class MediaFeatures(doc_id: Long, format: String, byte_len: Int,
                           features: Array[Double])

  val featureDim = 8

  /** Synthesize the media table from `documents`: the text bytes stand
    * in for encoded media; metadata is derived deterministically from
    * the payload length (so the DuckDB oracle can reproduce it).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4"), lit("image/jpeg")),
        pmod(regexp_extract(col("source"), "src(\\d+)", 1).cast("int"), lit(4)) + 1).as("format"),
      (lit(64) + pmod(octet_length(col("text")), lit(192))).as("width"),
      (lit(64) + pmod(octet_length(col("text")) * 7, lit(128))).as("height"),
      (lit(1) + pmod(octet_length(col("text")), lit(5))).as("n_frames"))

  /** STUB decoder: a real implementation would parse `payload` with a
    * codec; this derives a deterministic pseudo-feature vector from the
    * byte length alone. The signature and batching are the real
    * interface a codec would slot into.
    */
  private[multimodal] def decode(r: MediaRecord): MediaFeatures = {
    val len = r.payload.length
    val feats = Array.tabulate(featureDim)(i => ((len * 31 + i * 7) % 997) / 997.0)
    MediaFeatures(r.doc_id, r.format, len, feats)
  }

  /** Feature extraction over partition-streamed batches. Per-partition
    * setup cost (codec/model init in a real pipeline) is paid once per
    * partition, not per record.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real pipeline: val codec = Codec.open() — once per partition
      it.map(decode)
    }
  }

  /** Frame sampling for video-typed payloads: one row per sampled
    * frame with its byte offset — pure expression work (posexplode of a
    * sequence), no bytes touched until a downstream decode.
    */
  def sampleFrames(media: DataFrame): DataFrame =
    media
      .select(col("doc_id"), col("format"), length(col("payload")).as("byte_len"), col("n_frames"),
              posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("frame_id", "_f")))
      .select(col("doc_id"), col("format"), col("frame_id").cast("long").as("frame_id"),
              (col("frame_id") * expr("byte_len DIV n_frames")).as("frame_offset"))
}
