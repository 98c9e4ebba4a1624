package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

/** Specs for the multimodal plumbing: the payload must stay an opaque
  * binary column, metadata must be typed and usable without touching
  * bytes, and the decode stub must batch through mapPartitions with a
  * stable schema.
  */
class MultimodalSpec extends AnyFunSuite with SparkFixture {

  private lazy val media = Multimodal.mediaTable(Tables.documents(spark, sfDir))

  test("media table: opaque binary payload + typed metadata columns") {
    val schema = media.schema
    assert(schema("payload").dataType == BinaryType)
    assert(Seq("format", "width", "height", "n_frames").forall(schema.fieldNames.contains))
    val fmts = media.select("format").distinct().collect().map(_.getString(0)).toSet
    assert(fmts == Set("image/png", "audio/wav", "video/mp4", "image/jpeg"))
  }

  test("metadata predicates prune without decoding payloads") {
    // filter + count on metadata only — payload column must not appear in the scan
    val q = media.filter(col("format") === "video/mp4").select("doc_id", "n_frames")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload leaked into metadata-only plan:\n$plan")
    assert(q.count() > 0)
  }

  test("decode stub: fixed feature dim, deterministic, batched per partition") {
    import spark.implicits._
    val ds = media.as[Multimodal.MediaRecord]
    val feats = Multimodal.extractFeatures(ds).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == Multimodal.featureDim)
      assert(f.features.forall(v => v >= 0.0 && v < 1.0))
    }
    // deterministic: same input → same features
    val again = Multimodal.extractFeatures(ds).collect().map(f => f.doc_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.doc_id) == f.features.toSeq))
  }

  test("frame sampling emits exactly n_frames rows per video") {
    val frames = Multimodal.sampleFrames(media.filter(col("format") === "video/mp4"))
    val perDoc = frames.groupBy("doc_id").count()
    val meta = media.filter(col("format") === "video/mp4").select("doc_id", "n_frames")
    val joined = perDoc.join(meta, "doc_id")
      .filter(col("count") =!= col("n_frames")).count()
    assert(joined == 0, "frame count mismatch with n_frames metadata")
  }
}
