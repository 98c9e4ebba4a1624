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
  *    residual pruning moves EXECUTOR-side ([[AvroFrameStats
  *    .bloomBlocked]]: each task consults its own segment's bloom
  *    before opening the data file), so it is distributed, never lost.
  *
  * Executors never read the ledger: task-side logic (per-segment
  * sidecar aggregates, decode fallbacks) keeps using the sidecars,
  * which remain the per-segment source of truth.
  */
object FrameStatsLedger {

  val LedgerFile = "_stats.ledger.json"

  /** Append-log of folds since the last base checkpoint — the
    * Delta-log half of the checkpoint+log design: a plain append
    * commit writes O(its own delta) bytes here instead of rewriting
    * the whole base (which at 10⁵–10⁶ segments would be the metadata
    * wall again, on the WRITE side). One JSON line per fold
    * (`{"add":{…},"remove":[…]}`), replayed in order over the base at
    * read; once the log reaches [[CheckpointEveryDeltas]] lines the
    * next fold compacts everything into a fresh base. Appends happen
    * under the table's commit lock, so lines never interleave; a crash
    * can only tear the LAST line, which replay tolerates (a lost add =
    * an unledgered segment = sidecar fallback; a lost remove = a stale
    * entry for a retired name, which planning never consults because
    * it keys off the live listing).
    */
  val DeltaFile = "_stats.ledger.delta.jsonl"

  /** Base-rewrite cadence: read cost stays O(base + ≤64 lines), write
    * cost O(delta) per commit + O(table)/64 amortized.
    */
  val CheckpointEveryDeltas = 64

  /** Driver-side parse cache keyed by both files' (length, mtime) —
    * repeated plans against an unchanged table skip the parse
    * entirely. Staleness on a rare key alias is SAFE by the same
    * arguments as crash-consistency: a missed add falls back to the
    * sidecar, a missed remove names a retired segment the live
    * listing never presents.
    */
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, ((Long, Long, Long, Long), Map[String, Entry])]()

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

  /** Read the table's ledger: segment name → entry (base checkpoint +
    * delta-log replay, parse-cached on both files' length/mtime). None
    * when no base exists (pre-ledger table) or it is unreadable
    * (treated as absent — every read then falls back to sidecars).
    */
  def read(dir: File): Option[Map[String, Entry]] = {
    val base = new File(dir, LedgerFile)
    if (!base.isFile) return None
    val delta = new File(dir, DeltaFile)
    val key = (base.length(), base.lastModified(), delta.length(), delta.lastModified())
    val hit = cache.get(dir.getAbsolutePath)
    if (hit != null && hit._1 == key) return Some(hit._2)
    val out = readBase(dir).map { b =>
      val folded = replayDeltas(delta, b)
      cache.put(dir.getAbsolutePath, (key, folded))
      folded
    }
    out
  }

  /** Parse the base checkpoint file alone. */
  private def readBase(dir: File): Option[Map[String, Entry]] = {
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

  /** Serialize an entries map to the ledger object form (shared by the
    * base checkpoint and each delta line's `add` field).
    */
  private def writeEntries(gen: com.fasterxml.jackson.core.JsonGenerator,
                           entries: Map[String, Entry]): Unit = {
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
  }

  /** Atomic-swap write of the FULL ledger as a fresh base checkpoint
    * (the delta log resets with it). Callers must hold the table's
    * commit lock (or be the only possible writer, e.g. a catalog DDL).
    */
  def write(dir: File, entries: Map[String, Entry]): Unit = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeObjectFieldStart("entries")
    writeEntries(gen, entries)
    gen.writeEndObject() // entries
    gen.writeEndObject(); gen.close()
    val tmp = new File(dir, "." + LedgerFile + ".tmp")
    java.nio.file.Files.writeString(tmp.toPath, sw.toString)
    java.nio.file.Files.move(tmp.toPath, new File(dir, LedgerFile).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    new File(dir, DeltaFile).delete()
    cache.remove(dir.getAbsolutePath)
  }

  /** Fold the ledger forward: drop `remove`d segment names, add/replace
    * `add` entries. A table with no ledger yet gains a base holding
    * just the adds — correct, because reads only consult it for names
    * it HAS (everything else falls back to sidecars). With a base
    * present, the fold APPENDS one delta line — O(delta) bytes, never
    * O(table) — and compacts into a fresh base once the log reaches
    * [[CheckpointEveryDeltas]] lines. Caller must hold the table's
    * commit lock.
    */
  def fold(dir: File, add: Map[String, Entry] = Map.empty,
           remove: Iterable[String] = Nil): Unit = {
    if (add.isEmpty && remove.isEmpty) return
    if (!new File(dir, LedgerFile).isFile) {
      write(dir, add)
      return
    }
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeObjectFieldStart("add")
    writeEntries(gen, add)
    gen.writeEndObject()
    gen.writeArrayFieldStart("remove")
    remove.toSeq.sorted.foreach(gen.writeString)
    gen.writeEndArray()
    gen.writeEndObject(); gen.close()
    val delta = new File(dir, DeltaFile)
    // heal a torn tail (crash mid-append): if the file doesn't end in a
    // newline, terminate the torn line first so this fold's line stays
    // parseable — the torn line alone is skipped at replay
    val needsNewline = delta.isFile && delta.length() > 0 && {
      val raf = new java.io.RandomAccessFile(delta, "r")
      try { raf.seek(delta.length() - 1); raf.read() != '\n' }
      finally raf.close()
    }
    val out = new java.io.FileOutputStream(delta, true)
    try out.write(((if (needsNewline) "\n" else "") + sw.toString + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    cache.remove(dir.getAbsolutePath)
    // checkpoint: compact base + log into a fresh base
    val lines = {
      val st = java.nio.file.Files.lines(delta.toPath)
      try st.count() finally st.close()
    }
    if (lines >= CheckpointEveryDeltas) read(dir).foreach(write(dir, _))
  }

  /** Replay the delta log over a base state. A torn line (crash
    * mid-append, healed-and-terminated by the next fold) is SKIPPED:
    * missing its adds means those segments read from their sidecars,
    * missing its removes leaves stale entries for retired names the
    * live listing never presents — under-apply is safe both ways.
    */
  private def replayDeltas(delta: File, base: Map[String, Entry]): Map[String, Entry] = {
    if (!delta.isFile) return base
    var state = base
    val src = scala.io.Source.fromFile(delta)(scala.io.Codec.UTF8)
    try {
      for (line <- src.getLines() if line.nonEmpty) {
        parseDeltaLine(line).foreach { case (add, remove) =>
          state = state -- remove ++ add
        }
      }
      state
    } finally src.close()
  }

  private def parseDeltaLine(line: String): Option[(Map[String, Entry], Seq[String])] =
    try {
      val p = new com.fasterxml.jackson.core.JsonFactory().createParser(line)
      import com.fasterxml.jackson.core.JsonToken._
      val add = Map.newBuilder[String, Entry]
      val remove = Seq.newBuilder[String]
      p.nextToken() // {
      while (p.nextToken() != END_OBJECT) {
        p.currentName() match {
          case "add" =>
            p.nextToken() // {
            while (p.nextToken() != END_OBJECT) {
              val seg = p.currentName()
              parseEntry(p).foreach(e => add += seg -> e)
            }
          case "remove" =>
            p.nextToken() // [
            while (p.nextToken() != END_ARRAY) remove += p.getText
          case _ => p.nextToken()
        }
      }
      Some((add.result(), remove.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse one segment's entry object (parser positioned at the field
    * name; consumes through its END_OBJECT).
    */
  private def parseEntry(p: com.fasterxml.jackson.core.JsonParser): Option[Entry] = {
    import com.fasterxml.jackson.core.JsonToken._
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
    Some(Entry(frames, fields.result(), bloomFields.result()))
  }

  /** Drop the ledger outright (physical TRUNCATE starts a new lineage;
    * a corrupt ledger heals by deletion — sidecars remain authoritative).
    */
  def drop(dir: File): Unit = {
    new File(dir, LedgerFile).delete()
    new File(dir, DeltaFile).delete()
    cache.remove(dir.getAbsolutePath)
  }

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
    * ledger just tore down. Past the cap, segments pass unpruned here
    * and the EXECUTOR-side gate takes over
    * ([[AvroFrameStats.bloomBlocked]]): each task consults its own
    * segment's bloom before opening the data file, so the residual
    * pruning is distributed rather than lost.
    */
  val MaxDriverBloomOpens = 512
}
