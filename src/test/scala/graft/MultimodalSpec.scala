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

  // ------------------------------------------------------------ real header codec
  import graft.multimodal.ImageHeaders

  test("PNG round-trip: IHDR fields survive encode → decode, including 16-bit depth and alpha") {
    for ((w, h, depth, ct, ch) <- Seq((1, 1, 8, 0, 1), (640, 480, 8, 2, 3),
                                      (255, 191, 16, 6, 4), (65535, 1, 8, 3, 1))) {
      val m = ImageHeaders.decodePng(ImageHeaders.encodePng(w, h, depth, ct))
      assert(m.contains(ImageHeaders.ImageMeta("png", w, h, depth, ch)), s"w=$w h=$h ct=$ct")
    }
  }

  test("JPEG round-trip: SOF0 parsed through skipped APP0/COM segments; big-endian dims") {
    for ((w, h, ch) <- Seq((1, 1, 1), (320, 240, 3), (65535, 65535, 3))) {
      val m = ImageHeaders.decodeJpeg(ImageHeaders.encodeJpeg(w, h, ch))
      assert(m.contains(ImageHeaders.ImageMeta("jpeg", w, h, 8, ch)), s"w=$w h=$h")
    }
  }

  test("GIF round-trip: little-endian u16 dims from the Logical Screen Descriptor") {
    for ((w, h) <- Seq((1, 1), (300, 200), (65535, 257))) {
      val m = ImageHeaders.decodeGif(ImageHeaders.encodeGif(w, h))
      assert(m.contains(ImageHeaders.ImageMeta("gif", w, h, 8, 3)), s"w=$w h=$h")
    }
  }

  test("decode dispatch sniffs magic bytes; garbage, truncation, and empty input yield None") {
    assert(ImageHeaders.decode(ImageHeaders.encodePng(2, 3, 8, 2)).exists(_.format == "png"))
    assert(ImageHeaders.decode(ImageHeaders.encodeJpeg(2, 3, 3)).exists(_.format == "jpeg"))
    assert(ImageHeaders.decode(ImageHeaders.encodeGif(2, 3)).exists(_.format == "gif"))
    assert(ImageHeaders.decode(null).isEmpty)
    assert(ImageHeaders.decode(Array.emptyByteArray).isEmpty)
    assert(ImageHeaders.decode("not an image at all".getBytes("UTF-8")).isEmpty)
    // valid signatures, truncated bodies
    assert(ImageHeaders.decode(ImageHeaders.encodePng(9, 9, 8, 2).take(12)).isEmpty)
    assert(ImageHeaders.decode(ImageHeaders.encodeJpeg(9, 9, 3).take(6)).isEmpty)
    assert(ImageHeaders.decode(ImageHeaders.encodeGif(9, 9).take(7)).isEmpty)
    // JPEG with EOI but no SOF (no frame header to report)
    assert(ImageHeaders.decodeJpeg(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)).isEmpty)
  }

  test("image_meta expression: SQL surface, codegen'd plan, NULL for non-images") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, ImageHeaders.encodePng(100, 50, 8, 2)),
      (2L, ImageHeaders.encodeJpeg(31, 17, 3)),
      (3L, ImageHeaders.encodeGif(12, 34)),
      (4L, "plain text bytes".getBytes("UTF-8"))).toDF("id", "payload")
    df.createOrReplaceTempView("imgs")
    val rows = spark.sql(
      """SELECT id, image_meta(payload).format AS f, image_meta(payload).width AS w,
                image_meta(payload).height AS h
         FROM imgs ORDER BY id""").collect()
    assert(rows.map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).toSeq ==
      Seq((1L, "png"), (2L, "jpeg"), (3L, "gif"), (4L, null)))
    assert(rows.take(3).map(r => (r.getInt(2), r.getInt(3))).toSeq ==
      Seq((100, 50), (31, 17), (12, 34)))
    // the parse must stay inside a whole-stage-codegen span (real
    // doGenCode). A plain local Seq would constant-fold to a
    // LocalTableScan (ConvertToLocalRelation) with no codegen at all —
    // repartition pins a distributed plan like a real scan's.
    val q = df.repartition(2)
      .select(expr("image_meta(payload).width").as("w")).filter(col("w") > 0)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).nonEmpty, s"no codegen span:\n$plan")
  }

  test("q166 digest dedup: sha2 matches the FIPS-180 vector; digests biject with payload params") {
    import spark.implicits._
    // FIPS 180-2 appendix B.1: sha256("abc")
    val vec = Seq(Tuple1("abc".getBytes("US-ASCII"))).toDF("b")
      .select(sha2(col("b"), 256)).collect()(0).getString(0)
    assert(vec == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    // The q166 oracle equates digest-groups with parameter-groups; that
    // only holds if the encoder is a pure function of its params (same
    // params ⇒ same bytes ⇒ same digest) and distinct params never
    // produce colliding bytes. Assert the bijection directly on the
    // judged query's inputs: one distinct digest per (format, w, h,
    // depth, channels) tuple and one tuple per digest.
    GraftFunctions.register(spark)
    val fixtures = SparkEntry.queries("q166_media_digest_dedup")(spark, sfDir)
    val params = fixtures.select("format", "width", "height", "bit_depth", "channels")
      .distinct().count()
    assert(fixtures.count() == params,
      "distinct parameter tuples and digest groups must be 1:1")
    // and the digest really covers the WHOLE payload: flipping one byte
    // past the header changes it
    val png = graft.multimodal.ImageHeaders.encodePng(64, 64, 8, 2)
    val mutated = png.clone(); mutated(png.length - 1) = (mutated(png.length - 1) ^ 1).toByte
    val two = Seq(Tuple1(png), Tuple1(mutated)).toDF("b")
      .select(sha2(col("b"), 256).as("d")).distinct().count()
    assert(two == 2L, "payload digest must be sensitive to non-header bytes")
  }

  test("WAV round-trip: fmt/data fields survive encode → decode for every parameter corner") {
    import graft.multimodal.AudioHeaders
    for {
      rate <- Seq(8000, 16000, 44100)
      ch <- Seq(1, 2)
      bits <- Seq(8, 16)
      n <- Seq(1L, 999L, 48001L)
    } {
      val m = AudioHeaders.decodeWav(AudioHeaders.encodeWav(rate, ch, bits, n))
      assert(m.contains(AudioHeaders.AudioMeta("wav", rate, ch, bits, n)),
        s"round-trip lost ($rate,$ch,$bits,$n): $m")
    }
  }

  test("WAV decode walks past unknown chunks (word-aligned) and rejects malformed input") {
    import graft.multimodal.AudioHeaders
    val base = AudioHeaders.encodeWav(16000, 2, 16, 1234L)
    // splice a JUNK chunk with an ODD size between WAVE and fmt  —
    // the RIFF pad byte must be honored or fmt  lands off by one
    val junkBody = Array[Byte](7, 7, 7)
    val spliced = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, 12)
      out.write("JUNK".getBytes("US-ASCII"))
      out.write(Array[Byte](3, 0, 0, 0)) // little-endian size 3 (odd)
      out.write(junkBody); out.write(0)  // pad to word boundary
      out.write(base, 12, base.length - 12)
      val b = out.toByteArray
      // RIFF size field is now stale — decoder must not rely on it
      b
    }
    assert(AudioHeaders.decodeWav(spliced)
      .contains(AudioHeaders.AudioMeta("wav", 16000, 2, 16, 1234L)),
      "JUNK chunk broke the walk")
    // malformed inputs: wrong magic, truncation, non-PCM format tag
    assert(AudioHeaders.decodeWav("not audio at all - plain text".getBytes).isEmpty)
    assert(AudioHeaders.decodeWav(base.take(20)).isEmpty)
    val nonPcm = base.clone(); nonPcm(20) = 3 // wFormatTag = IEEE float
    assert(AudioHeaders.decodeWav(nonPcm).isEmpty, "non-PCM must be rejected")
    assert(AudioHeaders.decodeWav(Array.emptyByteArray).isEmpty)
  }

  test("audio_meta expression: SQL surface, codegen'd plan, NULL for non-audio") {
    import graft.multimodal.AudioHeaders
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      Tuple1(AudioHeaders.encodeWav(44100, 2, 16, 44100L)), // 1 s stereo
      Tuple1("RIFFxxxx but not wave".getBytes),
      Tuple1(Array.emptyByteArray))
    rows.toDF("payload").createOrReplaceTempView("audio_probe")
    val got = spark.sql(
      """SELECT audio_meta(payload).sample_rate AS r, audio_meta(payload).n_samples AS n
         FROM audio_probe WHERE audio_meta(payload) IS NOT NULL""").collect()
    assert(got.length == 1 && got(0).getInt(0) == 44100 && got(0).getLong(1) == 44100L,
      s"audio_meta SQL surface wrong: ${got.toSeq}")
    // the parse must stay inside a whole-stage-codegen span (real
    // doGenCode) — repartition pins a distributed plan so the local
    // Seq can't constant-fold to a LocalTableScan (image_meta test's
    // trick)
    val q = rows.toDF("payload").repartition(2)
      .select(expr("audio_meta(payload).sample_rate").as("r")).filter(col("r") > 0)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(plan).nonEmpty, s"no codegen span:\n$plan")
  }
}
