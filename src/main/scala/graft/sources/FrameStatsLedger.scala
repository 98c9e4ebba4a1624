package graft.sources

import java.io.File

/** Table-level statistics ledger (round 16, VERDICT r15 item 1) — the
  * scalable-planning-metadata layer: ONE `_stats.ledger.json` file per
  * table mirroring every live segment's stats sidecar (frame count,
  * per-field nulls/min/max, which fields carry a Bloom payload), so
  * query planning reads O(1) metadata files instead of opening one
  * sidecar per live segment.
  *
  * Why it exists: before this, every scan plan called
  * `AvroFrameStats.prune`, which opened and parsed one `.stats` file
  * per live segment on the DRIVER, per query — microseconds at 16
  * segments, but at 100 TB (10⁵–10⁶ segments) that is the classic
  * metadata wall Iceberg answers with manifest trees and Delta with
  * log checkpoints. The ledger is this format's log checkpoint: folded
  * forward at every publish, read once per plan.
  *
  * Consistency contract (what keeps a cache from becoming a lie):
  *
  *  - The ledger covers LIVE segments only, keyed by segment name.
  *    Segments are immutable and names are never reused (maintenance
  *    replacements always mint new `.c/.d/.z/.r` suffixed names), so an
  *    entry can never describe different bytes than its sidecar.
  *  - Every path that publishes or retires a live segment folds the
  *    ledger forward UNDER THE TABLE'S COMMIT LOCK — DSv2 batch /
  *    streaming / group-rewrite commits, compaction, deletes (CoW and
  *    MoR), clustered rewrites, delta commits, truncate. Entries are
  *    built from the very statsJson the task returned, so maintaining
  *    the ledger costs zero extra I/O at commit.
  *  - Sidecar REWRITES in place (CALL analyze; ALTER TABLE rename/drop
  *    re-keying) refresh the ledger in the same operation.
  *  - Reads are strictly FALLBACK-SAFE: a live segment missing from
  *    the ledger (foreign writer, pre-ledger table, crash between
  *    segment publish and ledger fold) falls back to its own sidecar —
  *    the pre-round-16 path — so the ledger can only remove work,
  *    never correctness. `CALL analyze` rebuilds it outright (the
  *    retrofit path for pre-ledger tables).
  *  - Bloom payloads deliberately stay OUT of the ledger (a per-column
  *    filter is ~100 KB; folding them in would turn the one-read plan
  *    back into a gigabyte parse). The ledger records which fields
  *    carry one; plan-time bloom pruning opens sidecars only for the
  *    min/max SURVIVORS that claim a bloom, and only up to
  *    [[FrameStatsView.MaxDriverBloomOpens]] — beyond that the
  *    residual pruning is skipped (strictly conservative; the pushed
  *    filters still drop rows executor-side).
  *
  * Executors never read the ledger: task-side logic (per-segment
  * sidecar aggregates, decode fallbacks) keeps using the sidecars,
  * which remain the per-segment source of truth.
  */
object FrameStatsLedger {

  val LedgerFile = "_stats.ledger.json"

  /** One live segment's planning stats: sidecar frame count, per-field
    * (nulls, min, max) in the stats value domain
    * (Long/Double/String/Boolean), and which fields carry a Bloom
    * payload in the sidecar.
    */
  case class Entry(frames: Long, fields: Map[String, (Long, Any, Any)],
                   bloomFields: Set[String])

  /** Build a ledger entry from a sidecar's JSON (the statsJson a write
    * task returned, or a sidecar file's contents). None if unparseable.
    */
  def entryFromJson(json: String): Option[Entry] =
    AvroFrameStats.parseStatsJson(json).map { case (frames, fields, blooms) =>
      Entry(frames, fields, blooms.keySet)
    }

  /** Read the table's ledger: segment name → entry. None when the
    * ledger file is absent (pre-ledger table) or unreadable (treated
    * as absent — every read then falls back to sidecars).
    */
  def read(dir: File): Option[Map[String, Entry]] = {
    val f = new File(dir, LedgerFile)
    if (!f.isFile) return None
    try {
      val p = new com.fasterxml.jackson.core.JsonFactory()
        .createParser(java.nio.file.Files.readString(f.toPath))
      import com.fasterxml.jackson.core.JsonToken._
      val out = Map.newBuilder[String, Entry]
      p.nextToken() // {
      while (p.nextToken() != END_OBJECT) {
        p.currentName() match {
          case "entries" =>
            p.nextToken() // {
            while (p.nextToken() != END_OBJECT) {
              val seg = p.currentName()
              var frames = 0L
              val fields = Map.newBuilder[String, (Long, Any, Any)]
              val bloomFields = Set.newBuilder[String]
              p.nextToken() // {
              while (p.nextToken() != END_OBJECT) {
                p.currentName() match {
                  case "frames" => p.nextToken(); frames = p.getLongValue
                  case "fields" =>
                    p.nextToken() // {
                    while (p.nextToken() != END_OBJECT) {
                      val name = p.currentName()
                      var nulls = 0L; var min: Any = null; var max: Any = null
                      p.nextToken() // {
                      while (p.nextToken() != END_OBJECT) {
                        val k = p.currentName()
                        val t = p.nextToken()
                        val v: Any = t match {
                          case VALUE_NUMBER_INT   => Long.box(p.getLongValue)
                          case VALUE_NUMBER_FLOAT => Double.box(p.getDoubleValue)
                          case VALUE_TRUE         => Boolean.box(true)
                          case VALUE_FALSE        => Boolean.box(false)
                          case _                  => p.getText
                        }
                        k match {
                          case "nulls" => nulls = v.asInstanceOf[java.lang.Long].longValue
                          case "min"   => min = v
                          case "max"   => max = v
                          case "bloom" => if (v == Boolean.box(true)) bloomFields += name
                          case _       => ()
                        }
                      }
                      fields += name -> ((nulls, min, max))
                    }
                  case _ => p.nextToken()
                }
              }
              out += seg -> Entry(frames, fields.result(), bloomFields.result())
            }
          case _ => p.nextToken()
        }
      }
      Some(out.result())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Atomic-swap write of the full ledger. Callers must hold the
    * table's commit lock (or be the only possible writer, e.g. inside
    * a catalog DDL).
    */
  def write(dir: File, entries: Map[String, Entry]): Unit = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeObjectFieldStart("entries")
    entries.toSeq.sortBy(_._1).foreach { case (seg, e) =>
      gen.writeObjectFieldStart(seg)
      gen.writeNumberField("frames", e.frames)
      gen.writeObjectFieldStart("fields")
      e.fields.toSeq.sortBy(_._1).foreach { case (name, (nulls, mn, mx)) =>
        gen.writeObjectFieldStart(name)
        gen.writeNumberField("nulls", nulls)
        def writeVal(k: String, v: Any): Unit = v match {
          case null                 => ()
          case l: java.lang.Long    => gen.writeNumberField(k, l.longValue)
          case d: java.lang.Double  => gen.writeNumberField(k, d.doubleValue)
          case b: java.lang.Boolean => gen.writeBooleanField(k, b.booleanValue)
          case s                    => gen.writeStringField(k, s.toString)
        }
        writeVal("min", mn); writeVal("max", mx)
        if (e.bloomFields.contains(name)) gen.writeBooleanField("bloom", true)
        gen.writeEndObject()
      }
      gen.writeEndObject() // fields
      gen.writeEndObject() // segment
    }
    gen.writeEndObject() // entries
    gen.writeEndObject(); gen.close()
    val tmp = new File(dir, "." + LedgerFile + ".tmp")
    java.nio.file.Files.writeString(tmp.toPath, sw.toString)
    java.nio.file.Files.move(tmp.toPath, new File(dir, LedgerFile).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Fold the ledger forward: drop `remove`d segment names, add/replace
    * `add` entries. A table with no ledger yet gains one holding just
    * the adds — correct, because reads only consult it for names it
    * HAS (everything else falls back to sidecars). Caller must hold
    * the table's commit lock.
    */
  def fold(dir: File, add: Map[String, Entry] = Map.empty,
           remove: Iterable[String] = Nil): Unit = {
    if (add.isEmpty && remove.isEmpty) return
    val cur = read(dir).getOrElse(Map.empty)
    write(dir, cur -- remove ++ add)
  }

  /** Drop the ledger outright (physical TRUNCATE starts a new lineage;
    * a corrupt ledger heals by deletion — sidecars remain authoritative).
    */
  def drop(dir: File): Unit = new File(dir, LedgerFile).delete()

  /** Rebuild the ledger from every live segment's sidecar — the
    * retrofit path for pre-ledger tables and the repair path after any
    * out-of-band sidecar surgery. O(live segments) sidecar reads, once;
    * every later plan is O(1) again. Returns entries written.
    */
  def rebuild(dir: File): Int = {
    val entries = AvroFrames.listSegments(dir.getAbsolutePath).flatMap { seg =>
      AvroFrameStats.readFull(seg).map { case (frames, fields, blooms) =>
        seg.getName -> Entry(frames, fields, blooms.keySet)
      }
    }.toMap
    write(dir, entries)
    entries.size
  }

  /** Re-key every ledger entry's field stats (ALTER TABLE RENAME/DROP
    * COLUMN — the ledger twin of
    * [[FrameMaintenance.rewriteSidecars]]): `transform` maps an old
    * field name to its new name, or None to strip it. No-op when no
    * ledger exists.
    */
  def rewriteFields(dir: File, transform: String => Option[String]): Unit =
    read(dir).foreach { cur =>
      write(dir, cur.map { case (seg, e) =>
        seg -> Entry(e.frames,
          e.fields.flatMap { case (n, st) => transform(n).map(_ -> st) },
          e.bloomFields.flatMap(transform(_)))
      })
    }
}

/** Plan-time view of a table's segment statistics: ledger-first (ONE
  * metadata file read per view), per-segment sidecar fallback for
  * names the ledger doesn't know. Instantiated once per scan / plan /
  * maintenance classification, so the whole plan costs O(1) metadata
  * opens on a ledgered table regardless of segment count.
  */
final class FrameStatsView(dir: File) {

  private lazy val ledger: Map[String, FrameStatsLedger.Entry] =
    FrameStatsLedger.read(dir).getOrElse(Map.empty)

  /** (frames, fields) for a segment — ledger entry if present, else
    * its sidecar. None = no stats anywhere (never prune, never claim).
    */
  def read(segment: File): Option[(Long, Map[String, (Long, Any, Any)])] =
    ledger.get(segment.getName) match {
      case Some(e) => Some((e.frames, e.fields))
      case None    => AvroFrameStats.read(segment)
    }

  /** Does the segment have stats at all (ledger or sidecar file)? The
    * complete-aggregate-pushdown gate — avoids one `.stats` existence
    * stat per segment on ledgered tables.
    */
  def has(segment: File): Boolean =
    ledger.contains(segment.getName) ||
      new File(segment.getParentFile, segment.getName + ".stats").isFile

  /** Segments surviving stat-pruning under ALL pushed filters —
    * min/max bounds from the ledger (zero file opens), then Bloom
    * residual pruning for survivors that carry payloads, each costing
    * one sidecar open, capped at [[FrameStatsView.MaxDriverBloomOpens]]
    * (beyond the cap the residual check is skipped — conservative; the
    * pushed filters still apply executor-side). Strictly the same
    * conservative semantics as the pre-ledger
    * [[AvroFrameStats.prune]].
    */
  def prune(segments: Array[File], pushed: Array[org.apache.spark.sql.sources.Filter]): Array[File] =
    if (pushed.isEmpty) segments
    else {
      val wantBloom = pushed.exists(AvroFrameStats.bloomRelevant)
      var bloomOpens = 0
      segments.filter { seg =>
        ledger.get(seg.getName) match {
          case Some(e) =>
            pushed.forall(AvroFrameStats.mayMatch(e.frames, e.fields, _)) && {
              !wantBloom || e.bloomFields.isEmpty ||
                bloomOpens >= FrameStatsView.MaxDriverBloomOpens || {
                  bloomOpens += 1
                  AvroFrameStats.readFull(seg) match {
                    case Some((_, _, b64)) if b64.nonEmpty =>
                      val bf = AvroFrameStats.blooms(b64)
                      pushed.forall(AvroFrameStats.bloomMayMatch(bf, _))
                    case _ => true
                  }
                }
            }
          case None =>
            // not in the ledger: the pre-ledger per-sidecar path
            AvroFrameStats.readFull(seg) match {
              case None => true
              case Some((frames, fields, bloomB64)) =>
                pushed.forall(AvroFrameStats.mayMatch(frames, fields, _)) && {
                  !wantBloom || bloomB64.isEmpty || {
                    val bf = AvroFrameStats.blooms(bloomB64)
                    pushed.forall(AvroFrameStats.bloomMayMatch(bf, _))
                  }
                }
            }
        }
      }
    }
}

object FrameStatsView {
  /** Driver-side Bloom residual-pruning budget per plan: each check
    * opens one sidecar, so a point lookup that min/max can't narrow on
    * a million-segment table must not reopen the metadata wall the
    * ledger just tore down. Past the cap, segments pass unpruned
    * (conservative) and the pushed filters drop their rows
    * executor-side.
    */
  val MaxDriverBloomOpens = 512
}
