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

  /** Header-complete PNG/JFIF/GIF byte-stream fixtures (doc_id, payload)
    * deterministically derived from each document's length and source —
    * shared by q122 (header decode) and q166 (digest dedup). Two
    * documents with equal derivation parameters produce byte-identical
    * payloads, which is what makes exact media dedup testable without
    * external files.
    */
  private def imageFixtures(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.multimodal.ImageHeaders
    Tables.documents(s, d)
      .select(col("doc_id"),
              octet_length(col("text")).as("len"),
              pmod(regexp_extract(col("source"), "src(\\d+)", 1).cast("int"), lit(3)).as("fmt"))
      .as[(Long, Int, Int)]
      .map { case (id, len, fmt) =>
        val w = 64 + len % 192
        val h = 64 + (len * 7) % 128
        val payload = fmt match {
          case 0 => ImageHeaders.encodePng(w, h, if (len % 2 == 0) 8 else 16,
                                           if ((len / 2) % 2 == 0) 2 else 6)
          case 1 => ImageHeaders.encodeJpeg(w, h, 3)
          case _ => ImageHeaders.encodeGif(w, h)
        }
        (id, payload)
      }.toDF("doc_id", "payload")
  }

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

    // ------------------------------------------------------------ real header decode (round 7)
    // The honest end of the multimodal story: REAL container parsing,
    // not the q47 stub. Fixture payloads are constructed as genuine
    // header-complete PNG / JFIF / GIF byte streams (signatures, chunk
    // layout, CRCs — ImageHeaders.encode*) with dimensions derived
    // from doc length, then parsed back by the codegen'd image_meta
    // expression reading ONLY header bytes. The oracle knows the
    // dimension formulas, so a hash match proves the byte-level
    // round-trip: big-endian PNG ints, JPEG marker-segment scan (the
    // encoder plants a COM segment the parser must skip), little-
    // endian GIF u16s. At 100 TB this is the scan shape for media
    // triage — the payload column never inflates, the parse touches
    // ~32 bytes per record inside whole-stage codegen, and bad blobs
    // surface as ordinary NULLs.
    ("q122_image_header_decode", (s, d) => {
      val fixtures = imageFixtures(s, d)
      val meta = org.apache.spark.sql.GraftSqlBridge.column(
        graft.expressions.ImageMetaExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("payload"))))
      fixtures.select(col("doc_id"), meta.as("m"))
        .select(col("doc_id"), col("m.format").as("format"),
                col("m.width").cast("long").as("width"),
                col("m.height").cast("long").as("height"),
                col("m.bit_depth").cast("long").as("bit_depth"),
                col("m.channels").cast("long").as("channels"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
             ['png','jpeg','gif'][(regexp_extract(source,'src(\d+)',1)::INTEGER % 3) + 1] AS format,
             (64 + strlen(text) % 192)::BIGINT        AS width,
             (64 + (strlen(text) * 7) % 128)::BIGINT  AS height,
             (CASE WHEN regexp_extract(source,'src(\d+)',1)::INTEGER % 3 = 0
                   THEN CASE WHEN strlen(text) % 2 = 0 THEN 8 ELSE 16 END
                   ELSE 8 END)::BIGINT AS bit_depth,
             (CASE WHEN regexp_extract(source,'src(\d+)',1)::INTEGER % 3 = 0
                   THEN CASE WHEN (strlen(text) // 2) % 2 = 0 THEN 3 ELSE 4 END
                   ELSE 3 END)::BIGINT AS channels
      FROM documents
      ORDER BY doc_id
    """)),

    // ------------------------------------------------------------ exact media dedup (round 8)
    // Pixel-free media deduplication — the first dedup pass a crawl
    // pipeline runs on binary columns: SHA-256 the WHOLE payload,
    // group by (digest, header metadata), keep copy counts and the
    // canonical (min) doc_id. No codec needed: byte-identical blobs
    // are duplicates regardless of what they decode to, which is why
    // this runs before any pixel-level near-dup. Scale shape: the
    // digest is a codegen'd projection inside the scan stage, the
    // payload column drops BEFORE the shuffle (the exchange carries a
    // 32-byte digest + 4 small ints per record, not megabyte blobs),
    // and the aggregate is partial+final. The oracle can't hash bytes
    // it can't construct — instead it groups by the fixture's
    // generation parameters (format, w, h, depth, channels), which
    // determine the payload bytes exactly; a hash match therefore
    // proves digest-groups ≡ parameter-groups, i.e. the encoder is
    // deterministic, distinct params never collide, and the dedup
    // keyed the right blobs together. MultimodalSpec adds the
    // digest-side invariants (one digest per parameter tuple, FIPS
    // test vector for sha2).
    ("q166_media_digest_dedup", (s, d) => {
      val fixtures = imageFixtures(s, d)
      val meta = org.apache.spark.sql.GraftSqlBridge.column(
        graft.expressions.ImageMetaExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("payload"))))
      fixtures
        .select(col("doc_id"), sha2(col("payload"), 256).as("digest"),
                octet_length(col("payload")).cast("long").as("byte_len"), meta.as("m"))
        .groupBy(col("digest"), col("m.format").as("format"),
                 col("m.width").cast("long").as("width"),
                 col("m.height").cast("long").as("height"),
                 col("m.bit_depth").cast("long").as("bit_depth"),
                 col("m.channels").cast("long").as("channels"),
                 col("byte_len"))
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("first_doc_id"))
        .drop("digest")
        .orderBy("first_doc_id")
    }, Some("""
      WITH params AS (
        SELECT doc_id,
               ['png','jpeg','gif'][(regexp_extract(source,'src(\d+)',1)::INTEGER % 3) + 1] AS format,
               (64 + strlen(text) % 192)::BIGINT       AS width,
               (64 + (strlen(text) * 7) % 128)::BIGINT AS height,
               (CASE WHEN regexp_extract(source,'src(\d+)',1)::INTEGER % 3 = 0
                     THEN CASE WHEN strlen(text) % 2 = 0 THEN 8 ELSE 16 END
                     ELSE 8 END)::BIGINT AS bit_depth,
               (CASE WHEN regexp_extract(source,'src(\d+)',1)::INTEGER % 3 = 0
                     THEN CASE WHEN (strlen(text) // 2) % 2 = 0 THEN 3 ELSE 4 END
                     ELSE 3 END)::BIGINT AS channels
        FROM documents)
      SELECT format, width, height, bit_depth, channels,
             -- fixture sizes are structural constants: PNG = signature 8
             -- + IHDR chunk 25 + IEND chunk 12; JFIF = SOI 2 + APP0 18 +
             -- COM 9 + SOF0 19 + EOI 2; GIF = header 6 + LSD 7 + trailer 1
             (CASE format WHEN 'png' THEN 45 WHEN 'jpeg' THEN 50
                          ELSE 14 END)::BIGINT AS byte_len,
             count(*)::BIGINT AS n_copies,
             min(doc_id) AS first_doc_id
      FROM params
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY first_doc_id
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
    }),

    // ------------------------------------------------------------ audio header decode (round 12)
    // The audio leg of the q122 pattern: header-complete PCM WAV
    // streams are derived deterministically from document length
    // (sample rate / channels / bit depth / frame count all functions
    // of strlen), encoded with real RIFF chunk structure
    // (multimodal.AudioHeaders), then parsed BACK by the codegen'd
    // `audio_meta` expression — so the oracle, which cannot construct
    // the bytes, recomputes the metadata from the same derivation and
    // a hash match proves encode→parse is the identity on every row.
    // duration_ms uses integer division on both engines. Scale shape:
    // one scan, the parse is a projection inside the scan stage, and
    // only ~50 header bytes of each (potentially huge) payload are
    // ever touched — the same first-pass economics as q122.
    ("q259_audio_header_decode", (s, d) => {
      import s.implicits._
      import graft.multimodal.AudioHeaders
      val fixtures = Tables.documents(s, d)
        .select(col("doc_id"), octet_length(col("text")).as("len"))
        .as[(Long, Int)]
        .map { case (id, len) =>
          val rate = Array(8000, 16000, 44100)(len % 3)
          val payload = AudioHeaders.encodeWav(
            rate, 1 + len % 2, if ((len / 3) % 2 == 0) 16 else 8,
            1000L + (len.toLong * 31) % 50000)
          (id, payload)
        }.toDF("doc_id", "payload")
      val meta = org.apache.spark.sql.GraftSqlBridge.column(
        graft.expressions.AudioMetaExpr(
          org.apache.spark.sql.GraftSqlBridge.expression(col("payload"))))
      fixtures.select(col("doc_id"), meta.as("m"))
        .select(col("doc_id"),
                col("m.sample_rate").cast("long").as("sample_rate"),
                col("m.channels").cast("long").as("channels"),
                col("m.bits_per_sample").cast("long").as("bits_per_sample"),
                col("m.n_samples").as("n_samples"))
        .withColumn("duration_ms", expr("n_samples * 1000 DIV sample_rate"))
        .orderBy("doc_id")
    }, Some("""
      WITH p AS (
        SELECT doc_id,
               [8000, 16000, 44100][(strlen(text) % 3) + 1] AS sample_rate,
               1 + strlen(text) % 2 AS channels,
               CASE WHEN (strlen(text) // 3) % 2 = 0 THEN 16 ELSE 8 END AS bits_per_sample,
               1000 + (strlen(text) * 31) % 50000 AS n_samples
        FROM documents)
      SELECT doc_id, sample_rate::BIGINT AS sample_rate, channels::BIGINT AS channels,
             bits_per_sample::BIGINT AS bits_per_sample, n_samples::BIGINT AS n_samples,
             (n_samples * 1000 // sample_rate)::BIGINT AS duration_ms
      FROM p
      ORDER BY doc_id
    """))
  )

}
