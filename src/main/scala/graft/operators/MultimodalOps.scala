package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryGroup, Tables}
import graft.multimodal.Multimodal

/** Judged queries over the multimodal column plumbing. The decode stub
  * derives everything deterministically from payload length, so even
  * the mapPartitions feature-extraction path is DuckDB-oracle-checked
  * (the oracle reproduces the formula; a real codec would obviously
  * not be oracle-able).
  */
object MultimodalOps extends QueryGroup {

  /** format CASE mirror shared by the oracles. */
  private val fmtSql =
    "['image/png','audio/wav','video/mp4','image/jpeg'][(regexp_extract(source,'src(\\d+)',1)::INTEGER % 4) + 1]"

  override protected val entries: Vector[(String, (SparkSession, String) => DataFrame, Option[String])] = Vector(

    ("q45_multimodal_meta", (s, d) => {
      Multimodal.mediaTable(Tables.documents(s, d))
        .select(col("doc_id"), col("format"),
                length(col("payload")).cast("long").as("byte_len"),
                col("width").cast("long").as("width"),
                col("height").cast("long").as("height"),
                col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")
    }, Some(s"""
      SELECT doc_id,
             $fmtSql AS format,
             strlen(text)                AS byte_len,
             64 + strlen(text) % 192     AS width,
             64 + (strlen(text) * 7) % 128 AS height,
             1 + strlen(text) % 5        AS n_frames
      FROM documents
      ORDER BY doc_id
    """)),

    ("q46_frame_sample", (s, d) => {
      Multimodal.sampleFrames(Multimodal.mediaTable(Tables.documents(s, d))
          .filter(col("format") === "video/mp4"))
        .orderBy("doc_id", "frame_id")
    }, Some(s"""
      WITH media AS (
        SELECT doc_id, $fmtSql AS format, strlen(text) AS byte_len,
               1 + strlen(text) % 5 AS n_frames
        FROM documents
      )
      SELECT doc_id, format, f.frame_id,
             f.frame_id * (byte_len // n_frames) AS frame_offset
      FROM media, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS frame_id) f
      WHERE format = 'video/mp4'
      ORDER BY doc_id, frame_id
    """)),

    ("q47_decode_features", (s, d) => {
      import s.implicits._
      val media = Multimodal.mediaTable(Tables.documents(s, d)).as[Multimodal.MediaRecord]
      Multimodal.extractFeatures(media).toDF()
        .select(col("doc_id") +: col("format") +: col("byte_len").cast("long").as("byte_len") +:
          (0 until Multimodal.featureDim).map(i => element_at(col("features"), i + 1).as(s"f$i")): _*)
        .orderBy("doc_id")
    }, Some {
      val feats = (0 until Multimodal.featureDim).map(i =>
        s"((strlen(text) * 31 + ${i * 7}) % 997) / 997.0 AS f$i").mkString(",\n             ")
      s"""
      SELECT doc_id,
             $fmtSql AS format,
             strlen(text) AS byte_len,
             $feats
      FROM documents
      ORDER BY doc_id
    """
    })
  )

}
