package graft.sources

import java.io.File

/** Table-level statistics + LIVE-SET ledger — the scalable-planning
  * metadata layer.
  *
  * Round 16 introduced the ledger as a stats CACHE: one
  * `_stats.ledger.json` mirroring every live segment's sidecar so a
  * plan reads O(1) metadata files instead of one sidecar per segment.
  * Round 17 (VERDICT r16 item 1) promotes it to the AUTHORITATIVE
  * live-set record: a scan plan derives the segment universe, the
  * active deletion vectors, and every publish instant from the ledger
  * alone — `File.listFiles()` of the data directory is no longer on
  * the per-query planning path at all (it remains the bootstrap /
  * `CALL analyze` repair path). At 10⁵–10⁶ segments (100 TB), a
  * directory LIST per query is tens of seconds of driver time / ~1000
  * paginated object-store round trips; the ledger read is one small
  * root file plus only the shards a partition-pruned plan needs.
  *
  * v2 layout (v1 monoliths remain readable, as stats-cache only):
  *
  *  - root `_stats.ledger.json`:
  *    `{"v":2,"live":true,"shards":["T19000",…],"entries":{…}}` —
  *    `live` marks the ledger authoritative for the live set;
  *    `entries` holds segments with no time-partition token;
  *    `shards` names per-partition shard files.
  *  - shards `_stats.ledger.d/T<pv>.json`: `{"entries":{…}}`, one per
  *    hidden-time-partition value ([[FrameTimePart]] `-T` name token).
  *    A plan whose pushed filters prune to a time window parses ONLY
  *    the in-window shards — planning metadata is O(live partition),
  *    not O(table).
  *  - delta `_stats.ledger.delta.jsonl`: one line per fold
  *    (`{"add":{…},"remove":[…],"dvset":{…},"dvclear":[…]}`),
  *    replayed in order over the loaded base; compacted into fresh
  *    base + shards every [[CheckpointEveryDeltas]] lines. Replay is
  *    IDEMPOTENT (adds upsert, removes/dvclears tolerate absence), so
  *    replaying the full log over a mid-checkpoint mixture of old and
  *    new shard bytes converges to the same state.
  *
  * Each entry records the segment's sidecar stats (`frames`,
  * per-field nulls/min/max, bloom fields — `frames:-1` = published
  * without parseable stats: listed, never pruned-by-stats), its
  * publish instant (`publishMs`, = the file's commit mtime, serving
  * `TIMESTAMP AS OF` cuts without per-file stat calls), and its
  * active deletion vector (`dv` + `dvMs`), if any.
  *
  * Consistency contract:
  *
  *  - Every path that publishes or retires a live segment or deletion
  *    vector folds the ledger UNDER THE TABLE'S COMMIT LOCK. For
  *    ledgered readers the fold IS the commit point: a crash
  *    mid-publish leaves the new files invisible (readers keep the
  *    pre-commit snapshot — strictly better than the old torn-listing
  *    window) until the job retries or `CALL analyze` reconciles.
  *  - The first fold on an unledgered table BOOTSTRAPS an
  *    authoritative base: one directory listing at commit time
  *    retrofits every pre-existing segment (sidecar stats or a
  *    stats-less entry) and live vector, then `live:true` is set.
  *    Pre-round-17 v1 ledgers read as NON-authoritative: they keep
  *    serving stats, and planning falls back to the directory listing
  *    for the live set until a rebuild upgrades them.
  *  - A FOREIGN file dropped directly into the directory of an
  *    authoritative table is NOT part of the table until
  *    `CALL analyze` registers it (the Delta-lake contract; the
  *    directory remains physical truth that analyze reconciles).
  *  - Torn delta tail (crash mid-append): the intact prefix replays;
  *    the lost line's operation re-runs or `analyze` heals. Readers
  *    racing a checkpoint retry on a root-stamp mismatch and fall
  *    back to the directory listing if the race persists — never a
  *    half-applied state.
  *  - Bloom payloads stay OUT of the ledger (size); it records which
  *    fields carry one, and residual bloom pruning opens only
  *    surviving sidecars, capped ([[FrameStatsView.MaxDriverBloomOpens]]).
  *
  * Executors never read the ledger: task-side logic keeps using the
  * per-segment sidecars, which remain the per-segment stats truth.
  */
object FrameStatsLedger {

  val LedgerFile = "_stats.ledger.json"
  val ShardDirName = "_stats.ledger.d"
  val DeltaFile = "_stats.ledger.delta.jsonl"

  /** Base-rewrite cadence: read cost stays O(loaded shards + ≤64
    * lines), write cost O(delta) per commit + O(table)/64 amortized.
    */
  val CheckpointEveryDeltas = 64

  /** One live segment's ledger record: sidecar frame count (-1 =
    * published without parseable stats — listed in the live set, never
    * stat-pruned), per-field (nulls, min, max) in the stats value
    * domain, which fields carry a Bloom payload, the publish instant
    * (commit mtime), and the active deletion vector, if any.
    */
  case class Entry(frames: Long, fields: Map[String, (Long, Any, Any)],
                   bloomFields: Set[String], publishMs: Long = 0L,
                   dv: Option[String] = None, dvMs: Long = 0L) {
    def hasStats: Boolean = frames >= 0L
  }

  /** A ledger read: the (possibly shard-pruned) live entries, whether
    * the ledger is authoritative for the live set (v2 `live:true`),
    * and whether every shard was loaded (`complete` — false only under
    * a shard-pruning predicate, in which case `entries` is a superset
    * of the in-window live set and a subset of the full one).
    */
  case class LiveSet(entries: Map[String, Entry], authoritative: Boolean,
                     complete: Boolean)

  /** Build a ledger entry from a sidecar's JSON. None if unparseable. */
  def entryFromJson(json: String): Option[Entry] =
    AvroFrameStats.parseStatsJson(json).map { case (frames, fields, blooms) =>
      Entry(frames, fields, blooms.keySet)
    }

  /** Like [[entryFromJson]] but total: an unparseable sidecar yields a
    * stats-less entry — with the ledger authoritative for the live
    * set, EVERY published segment must land in it, stats or not.
    */
  def entryFromJsonOrBare(json: String): Entry =
    entryFromJson(json).getOrElse(Entry(-1L, Map.empty, Set.empty))

  /** Shard key of a segment name: its hidden-time-partition token
    * (`T<pv>`), or "" for the root-inline group.
    */
  private def shardKeyOf(name: String): String =
    FrameTimePart.valueOf(name).map(v => s"T$v").getOrElse("")

  // ------------------------------------------------------------ caches
  // Parse caches keyed by file (length, lastModified). write() bumps
  // the root mtime STRICTLY above its predecessor, so every committed
  // root state has a distinct stamp — with the live set derived from
  // the ledger, a stale cache hit would lose segments, not just speed.

  private case class RootDoc(authoritative: Boolean, inline: Map[String, Entry],
                             shards: Vector[String], v2: Boolean)

  private case class DeltaLine(add: Map[String, Entry], remove: Seq[String],
                               dvSet: Map[String, (String, Long)], dvClear: Seq[String])

  private val rootCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), RootDoc)]()
  private val shardCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), Map[String, Entry])]()
  private val deltaCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((Long, Long), Vector[DeltaLine])]()

  private def purgeCaches(dir: File): Unit = {
    val prefix = dir.getAbsolutePath
    rootCache.remove(prefix)
    deltaCache.remove(prefix)
    val it = shardCache.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(prefix + "|")) it.remove()
  }

  // ------------------------------------------------------------ read

  /** Full ledger read: segment name → entry, every shard loaded. None
    * when no base exists or it is unreadable.
    */
  def read(dir: File): Option[Map[String, Entry]] =
    readLive(dir, None).map(_.entries)

  /** Ledger read with optional shard pruning: `keepPv` decides which
    * time-partition shards to parse (None = all). Root-inline entries
    * and delta-log adds are always included (conservative — downstream
    * partition pruning re-drops them by name token). Retries when a
    * concurrent checkpoint moves the root mid-read (the monotonic root
    * mtime makes the stamp check exact); persistent racing returns
    * None and the caller falls back to the directory listing.
    */
  def readLive(dir: File, keepPv: Option[Long => Boolean]): Option[LiveSet] = {
    val base = new File(dir, LedgerFile)
    var attempt = 0
    while (attempt < 5) {
      attempt += 1
      if (!base.isFile) return None
      val k1 = (base.length(), base.lastModified())
      val out = try {
        val root = loadRoot(dir, k1)
        val selected = root.shards.filter { k =>
          keepPv.isEmpty || (k match {
            case s if s.startsWith("T") =>
              scala.util.Try(s.drop(1).toLong).toOption.forall(keepPv.get)
            case _ => true
          })
        }
        var entries = root.inline
        selected.foreach { k => entries = entries ++ loadShard(dir, k, k1) }
        loadDeltas(dir).foreach { d => entries = applyLine(entries, d) }
        Some(LiveSet(entries, root.authoritative,
          complete = selected.length == root.shards.length))
      } catch { case scala.util.control.NonFatal(_) => None }
      val k2 = (base.length(), base.lastModified())
      // stamp stable across the read window ⇒ no checkpoint committed
      // mid-read: the delta log we saw pairs with the root we parsed
      if (k1 == k2) return out
    }
    None
  }

  private def loadRoot(dir: File, key: (Long, Long)): RootDoc = {
    val hit = rootCache.get(dir.getAbsolutePath)
    if (hit != null && hit._1 == key) return hit._2
    val doc = parseRoot(java.nio.file.Files.readString(
      new File(dir, LedgerFile).toPath))
    rootCache.put(dir.getAbsolutePath, (key, doc))
    doc
  }

  /** Shard FILE parses performed by this JVM — the round-17
    * observability hook: a partition-pruned plan must parse only the
    * in-window shards, however many partitions the table holds.
    */
  private[graft] val shardLoads = new java.util.concurrent.atomic.AtomicLong(0)

  private def loadShard(dir: File, shard: String, rootKey: (Long, Long)): Map[String, Entry] = {
    val ck = dir.getAbsolutePath + "|" + shard
    val hit = shardCache.get(ck)
    if (hit != null && hit._1 == rootKey) return hit._2
    shardLoads.incrementAndGet()
    val f = new File(new File(dir, ShardDirName), shard + ".json")
    val entries =
      if (!f.isFile) Map.empty[String, Entry]
      else parseEntriesDoc(java.nio.file.Files.readString(f.toPath))
    shardCache.put(ck, (rootKey, entries))
    entries
  }

  private def loadDeltas(dir: File): Vector[DeltaLine] = {
    val delta = new File(dir, DeltaFile)
    if (!delta.isFile) return Vector.empty
    val key = (delta.length(), delta.lastModified())
    val hit = deltaCache.get(dir.getAbsolutePath)
    if (hit != null && hit._1 == key) return hit._2
    val src = scala.io.Source.fromFile(delta)(scala.io.Codec.UTF8)
    val lines =
      try src.getLines().filter(_.nonEmpty).flatMap(parseDeltaLine).toVector
      finally src.close()
    deltaCache.put(dir.getAbsolutePath, (key, lines))
    lines
  }

  /** One delta line over a state map: removes, then adds (upsert),
    * then dv clears, then dv sets — the fixed order a rollback that
    * retires one vector and restores another depends on. dv ops on
    * absent entries are skipped (the entry lives in an unloaded shard
    * — whose segments this read never plans — or was removed).
    */
  private def applyLine(state: Map[String, Entry], d: DeltaLine): Map[String, Entry] = {
    var s = state -- d.remove ++ d.add
    d.dvClear.foreach { base =>
      s.get(base).foreach(e => s = s.updated(base, e.copy(dv = None, dvMs = 0L)))
    }
    d.dvSet.foreach { case (base, (dv, ms)) =>
      s.get(base).foreach(e => s = s.updated(base, e.copy(dv = Some(dv), dvMs = ms)))
    }
    s
  }

  // ------------------------------------------------------------ parse

  private def parseRoot(json: String): RootDoc = {
    val p = new com.fasterxml.jackson.core.JsonFactory().createParser(json)
    import com.fasterxml.jackson.core.JsonToken._
    var v = 1
    var live = false
    var inline = Map.empty[String, Entry]
    val shards = Vector.newBuilder[String]
    p.nextToken() // {
    while (p.nextToken() != END_OBJECT) {
      p.currentName() match {
        case "v"    => p.nextToken(); v = p.getIntValue
        case "live" => p.nextToken(); live = p.getBooleanValue
        case "shards" =>
          p.nextToken() // [
          while (p.nextToken() != END_ARRAY) shards += p.getText
        case "entries" =>
          p.nextToken() // {
          val b = Map.newBuilder[String, Entry]
          while (p.nextToken() != END_OBJECT) {
            val seg = p.currentName()
            parseEntry(p).foreach(e => b += seg -> e)
          }
          inline = b.result()
        case _ => p.nextToken()
      }
    }
    RootDoc(authoritative = v >= 2 && live, inline, shards.result(), v2 = v >= 2)
  }

  /** Parse a `{"entries":{…}}` document (shard file body). */
  private def parseEntriesDoc(json: String): Map[String, Entry] = {
    val p = new com.fasterxml.jackson.core.JsonFactory().createParser(json)
    import com.fasterxml.jackson.core.JsonToken._
    val b = Map.newBuilder[String, Entry]
    p.nextToken() // {
    while (p.nextToken() != END_OBJECT) {
      p.currentName() match {
        case "entries" =>
          p.nextToken() // {
          while (p.nextToken() != END_OBJECT) {
            val seg = p.currentName()
            parseEntry(p).foreach(e => b += seg -> e)
          }
        case _ => p.nextToken()
      }
    }
    b.result()
  }

  private def parseDeltaLine(line: String): Option[DeltaLine] =
    try {
      val p = new com.fasterxml.jackson.core.JsonFactory().createParser(line)
      import com.fasterxml.jackson.core.JsonToken._
      val add = Map.newBuilder[String, Entry]
      val remove = Seq.newBuilder[String]
      val dvSet = Map.newBuilder[String, (String, Long)]
      val dvClear = Seq.newBuilder[String]
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
          case "dvset" =>
            p.nextToken() // {
            while (p.nextToken() != END_OBJECT) {
              val base = p.currentName()
              var dv: String = null; var dvMs = 0L
              p.nextToken() // {
              while (p.nextToken() != END_OBJECT) {
                p.currentName() match {
                  case "dv"   => p.nextToken(); dv = p.getText
                  case "dvMs" => p.nextToken(); dvMs = p.getLongValue
                  case _      => p.nextToken()
                }
              }
              if (dv != null) dvSet += base -> ((dv, dvMs))
            }
          case "dvclear" =>
            p.nextToken() // [
            while (p.nextToken() != END_ARRAY) dvClear += p.getText
          case _ => p.nextToken()
        }
      }
      Some(DeltaLine(add.result(), remove.result(), dvSet.result(), dvClear.result()))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse one segment's entry object (parser positioned at the field
    * name; consumes through its END_OBJECT).
    */
  private def parseEntry(p: com.fasterxml.jackson.core.JsonParser): Option[Entry] = {
    import com.fasterxml.jackson.core.JsonToken._
    var frames = 0L
    var publishMs = 0L
    var dv: Option[String] = None
    var dvMs = 0L
    val fields = Map.newBuilder[String, (Long, Any, Any)]
    val bloomFields = Set.newBuilder[String]
    p.nextToken() // {
    while (p.nextToken() != END_OBJECT) {
      p.currentName() match {
        case "frames"    => p.nextToken(); frames = p.getLongValue
        case "publishMs" => p.nextToken(); publishMs = p.getLongValue
        case "dv"        => p.nextToken(); dv = Some(p.getText)
        case "dvMs"      => p.nextToken(); dvMs = p.getLongValue
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
    Some(Entry(frames, fields.result(), bloomFields.result(), publishMs, dv, dvMs))
  }

  // ------------------------------------------------------------ write

  /** Serialize an entries map (shared by root/shard bodies and each
    * delta line's `add` field).
    */
  private def writeEntries(gen: com.fasterxml.jackson.core.JsonGenerator,
                           entries: Map[String, Entry]): Unit = {
    entries.toSeq.sortBy(_._1).foreach { case (seg, e) =>
      gen.writeObjectFieldStart(seg)
      gen.writeNumberField("frames", e.frames)
      if (e.publishMs != 0L) gen.writeNumberField("publishMs", e.publishMs)
      e.dv.foreach { d =>
        gen.writeStringField("dv", d)
        gen.writeNumberField("dvMs", e.dvMs)
      }
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

  private def writeDoc(target: File)(body: com.fasterxml.jackson.core.JsonGenerator => Unit): Unit = {
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject(); body(gen); gen.writeEndObject(); gen.close()
    val tmp = new File(target.getParentFile, "." + target.getName + ".tmp")
    java.nio.file.Files.writeString(tmp.toPath, sw.toString)
    FrameCommitIo.impl.swap(tmp, target)
  }

  /** Atomic write of the FULL ledger as a fresh base checkpoint:
    * shards first, root last (its move is the visibility point — a
    * crash in between leaves the old root pairing shard bytes the
    * idempotent delta replay converges over), delta reset. The root
    * mtime is bumped STRICTLY above its predecessor so every committed
    * state has a distinct cache stamp. Callers must hold the table's
    * commit lock (or be the only possible writer).
    */
  def write(dir: File, entries: Map[String, Entry], authoritative: Boolean): Unit = {
    val byShard = entries.groupBy { case (name, _) => shardKeyOf(name) }
    val inline = byShard.getOrElse("", Map.empty)
    val shardKeys = (byShard.keySet - "").toVector.sorted
    val shardDir = new File(dir, ShardDirName)
    if (shardKeys.nonEmpty) {
      shardDir.mkdirs()
      shardKeys.foreach { k =>
        writeDoc(new File(shardDir, k + ".json")) { gen =>
          gen.writeObjectFieldStart("entries")
          writeEntries(gen, byShard(k))
          gen.writeEndObject()
        }
      }
    }
    // stale shard files from a previous checkpoint's partition set
    Option(shardDir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.getName.endsWith(".json") &&
        !shardKeys.contains(f.getName.stripSuffix(".json")))
      .foreach(_.delete())
    if (shardKeys.isEmpty) shardDir.delete() // no-op if non-empty/absent
    val root = new File(dir, LedgerFile)
    val prevMtime = if (root.isFile) root.lastModified() else 0L
    writeDoc(root) { gen =>
      gen.writeNumberField("v", 2)
      gen.writeBooleanField("live", authoritative)
      gen.writeArrayFieldStart("shards")
      shardKeys.foreach(gen.writeString)
      gen.writeEndArray()
      gen.writeObjectFieldStart("entries")
      writeEntries(gen, inline)
      gen.writeEndObject()
    }
    if (root.lastModified() <= prevMtime) root.setLastModified(prevMtime + 1)
    new File(dir, DeltaFile).delete()
    purgeCaches(dir)
  }

  // ------------------------------------------------------------ fold

  /** Fold the ledger forward: drop `remove`d segment names, add/replace
    * `add` entries (publish instants defensively stamped from the live
    * file when the caller left 0), clear then set deletion-vector
    * associations. With a base present this APPENDS one delta line —
    * O(delta) bytes, never O(table) — compacting into a fresh base
    * every [[CheckpointEveryDeltas]] lines. The FIRST fold on an
    * unledgered table bootstraps an authoritative base: one directory
    * listing retrofits every pre-existing segment (sidecar stats or a
    * stats-less entry) and live vector. Caller must hold the table's
    * commit lock.
    */
  def fold(dir: File, add: Map[String, Entry] = Map.empty,
           remove: Iterable[String] = Nil,
           dvSet: Map[String, (String, Long)] = Map.empty,
           dvClear: Iterable[String] = Nil): Unit = {
    if (add.isEmpty && remove.isEmpty && dvSet.isEmpty && dvClear.isEmpty) return
    val stampedAdd = add.map { case (name, e) =>
      name -> (if (e.publishMs != 0L) e
               else e.copy(publishMs = new File(dir, name).lastModified()))
    }
    val stampedDv = dvSet.map { case (base, (dv, ms)) =>
      base -> ((dv, if (ms != 0L) ms else new File(dir, dv).lastModified()))
    }
    if (!new File(dir, LedgerFile).isFile) {
      // bootstrap: retrofit everything already on disk, then the fold
      val dvs = AvroFrames.liveDvMap(dir.getAbsolutePath)
      val fromDisk = AvroFrames.listSegments(dir.getAbsolutePath).iterator
        .filterNot(f => stampedAdd.contains(f.getName))
        .map { f =>
          val base = AvroFrameStats.readFull(f) match {
            case Some((fr, fl, bl)) => Entry(fr, fl, bl.keySet, f.lastModified())
            case None               => Entry(-1L, Map.empty, Set.empty, f.lastModified())
          }
          val d = dvs.get(f.getName)
          f.getName -> base.copy(dv = d.map(_.getName),
            dvMs = d.fold(0L)(_.lastModified()))
        }.toMap
      write(dir, applyLine(fromDisk ++ stampedAdd,
        DeltaLine(Map.empty, remove.toSeq, stampedDv, dvClear.toSeq)),
        authoritative = true)
      return
    }
    val sw = new java.io.StringWriter()
    val gen = new com.fasterxml.jackson.core.JsonFactory().createGenerator(sw)
    gen.writeStartObject()
    gen.writeObjectFieldStart("add")
    writeEntries(gen, stampedAdd)
    gen.writeEndObject()
    gen.writeArrayFieldStart("remove")
    remove.toSeq.sorted.foreach(gen.writeString)
    gen.writeEndArray()
    if (stampedDv.nonEmpty) {
      gen.writeObjectFieldStart("dvset")
      stampedDv.toSeq.sortBy(_._1).foreach { case (base, (dv, ms)) =>
        gen.writeObjectFieldStart(base)
        gen.writeStringField("dv", dv)
        gen.writeNumberField("dvMs", ms)
        gen.writeEndObject()
      }
      gen.writeEndObject()
    }
    if (dvClear.nonEmpty) {
      gen.writeArrayFieldStart("dvclear")
      dvClear.toSeq.sorted.foreach(gen.writeString)
      gen.writeEndArray()
    }
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
    purgeCaches(dir)
    // checkpoint: compact base + log into a fresh base
    val lines = {
      val st = java.nio.file.Files.lines(delta.toPath)
      try st.count() finally st.close()
    }
    if (lines >= CheckpointEveryDeltas)
      readLive(dir, None).foreach(ls => write(dir, ls.entries, ls.authoritative))
  }

  /** Drop the ledger outright (physical TRUNCATE starts a new lineage;
    * a corrupt ledger heals by deletion — the directory listing and
    * sidecars take over until the next fold re-bootstraps).
    */
  def drop(dir: File): Unit = {
    new File(dir, LedgerFile).delete()
    new File(dir, DeltaFile).delete()
    val shardDir = new File(dir, ShardDirName)
    Option(shardDir.listFiles()).getOrElse(Array.empty[File]).foreach(_.delete())
    shardDir.delete()
    purgeCaches(dir)
  }

  /** Rebuild the ledger from the directory: every live segment
    * (sidecar stats or a stats-less entry), every live vector, every
    * publish mtime — the retrofit path for pre-ledger/v1 tables, the
    * repair path after out-of-band surgery, and how a FOREIGN file
    * dropped into an authoritative table's directory becomes part of
    * the table. O(live segments) metadata reads, once; every later
    * plan is O(loaded shards) again. Returns entries written.
    */
  def rebuild(dir: File): Int = {
    val dvs = AvroFrames.liveDvMap(dir.getAbsolutePath)
    val entries = AvroFrames.listSegments(dir.getAbsolutePath).map { seg =>
      val base = AvroFrameStats.readFull(seg) match {
        case Some((frames, fields, blooms)) =>
          Entry(frames, fields, blooms.keySet, seg.lastModified())
        case None => Entry(-1L, Map.empty, Set.empty, seg.lastModified())
      }
      val d = dvs.get(seg.getName)
      seg.getName -> base.copy(dv = d.map(_.getName), dvMs = d.fold(0L)(_.lastModified()))
    }.toMap
    write(dir, entries, authoritative = true)
    entries.size
  }

  /** Re-key every ledger entry's field stats (ALTER TABLE RENAME/DROP
    * COLUMN — the ledger twin of [[FrameMaintenance.rewriteSidecars]]):
    * `transform` maps an old field name to its new name, or None to
    * strip it. Authoritativeness and live-set/dv state are preserved.
    * No-op when no ledger exists.
    */
  def rewriteFields(dir: File, transform: String => Option[String]): Unit =
    readLive(dir, None).foreach { ls =>
      write(dir, ls.entries.map { case (seg, e) =>
        seg -> e.copy(
          fields = e.fields.flatMap { case (n, st) => transform(n).map(_ -> st) },
          bloomFields = e.bloomFields.flatMap(transform(_)))
      }, ls.authoritative)
    }
}

/** Plan-time view of a table's segment statistics: ledger-first (ONE
  * metadata read per view — or zero, when the scan hands over its
  * already-loaded live-set entries), per-segment sidecar fallback for
  * names the ledger doesn't know or records stats-less. Instantiated
  * once per scan / plan / maintenance classification, so the whole
  * plan costs O(1) metadata opens on a ledgered table regardless of
  * segment count.
  */
final class FrameStatsView(dir: File,
                           preloaded: Option[Map[String, FrameStatsLedger.Entry]] = None) {

  private lazy val ledger: Map[String, FrameStatsLedger.Entry] =
    preloaded.getOrElse(FrameStatsLedger.read(dir).getOrElse(Map.empty))

  // segments whose bloom payloads the driver's residual pass already
  // evaluated against the pushed filters and found may-match — the
  // executor-side gate would reach the same verdict, so their splits
  // carry probeBloom = false and the task skips the sidecar re-read
  private val driverVerified = scala.collection.mutable.Set.empty[String]

  /** Split-level probe hint (round 17): should this segment's TASK
    * consult its own sidecar blooms before opening the data file
    * ([[AvroFrameStats.bloomBlocked]])? False when the ledger proves
    * no bloom payload exists on any column the pushed filters probe,
    * or when the driver's residual pass already evaluated this exact
    * segment. Conservative-true for segments the ledger doesn't know
    * (their sidecar may carry blooms the driver never saw). Purely an
    * I/O hint — a wrong `true` costs one small sidecar read, a `false`
    * only skips an optimization; row output is identical either way.
    */
  def probeBloom(segment: File, pushed: Array[org.apache.spark.sql.sources.Filter]): Boolean = {
    if (!pushed.exists(AvroFrameStats.bloomRelevant)) return false
    if (driverVerified.contains(segment.getName)) return false
    ledger.get(segment.getName) match {
      case Some(e) if e.hasStats =>
        e.bloomFields.nonEmpty && {
          val cols = pushed.iterator.flatMap(AvroFrameStats.bloomColumns).toSet
          e.bloomFields.exists(cols)
        }
      case _ => true
    }
  }

  /** (frames, fields) for a segment — ledger entry if present (with
    * stats), else its sidecar. None = no stats anywhere (never prune,
    * never claim).
    */
  def read(segment: File): Option[(Long, Map[String, (Long, Any, Any)])] =
    ledger.get(segment.getName) match {
      case Some(e) if e.hasStats => Some((e.frames, e.fields))
      case _                     => AvroFrameStats.read(segment)
    }

  /** Does the segment have stats at all (ledger or sidecar file)? The
    * complete-aggregate-pushdown gate — avoids one `.stats` existence
    * stat per segment on ledgered tables.
    */
  def has(segment: File): Boolean =
    ledger.get(segment.getName).exists(_.hasStats) ||
      new File(segment.getParentFile, segment.getName + ".stats").isFile

  /** Segments surviving stat-pruning under ALL pushed filters —
    * min/max bounds from the ledger (zero file opens), then Bloom
    * residual pruning for survivors that carry payloads, each costing
    * one sidecar open, capped at [[FrameStatsView.MaxDriverBloomOpens]]
    * (beyond the cap the residual check is skipped — conservative; the
    * pushed filters still apply executor-side). Strictly the same
    * conservative semantics as the pre-ledger [[AvroFrameStats.prune]].
    */
  def prune(segments: Array[File], pushed: Array[org.apache.spark.sql.sources.Filter]): Array[File] =
    if (pushed.isEmpty) segments
    else {
      val wantBloom = pushed.exists(AvroFrameStats.bloomRelevant)
      var bloomOpens = 0
      segments.filter { seg =>
        ledger.get(seg.getName).filter(_.hasStats) match {
          case Some(e) =>
            pushed.forall(AvroFrameStats.mayMatch(e.frames, e.fields, _)) && {
              !wantBloom || e.bloomFields.isEmpty ||
                bloomOpens >= FrameStatsView.MaxDriverBloomOpens || {
                  bloomOpens += 1
                  AvroFrameStats.readFull(seg) match {
                    case Some((_, _, b64)) if b64.nonEmpty =>
                      val bf = AvroFrameStats.blooms(b64)
                      val ok = pushed.forall(AvroFrameStats.bloomMayMatch(bf, _))
                      // driver evaluated THESE filters against THESE
                      // blooms: the executor gate need not repeat it
                      if (ok) driverVerified += seg.getName
                      ok
                    case _ => true
                  }
                }
            }
          case None =>
            // not in the ledger (or stats-less): the per-sidecar path
            AvroFrameStats.readFull(seg) match {
              case None => true
              case Some((frames, fields, bloomB64)) =>
                pushed.forall(AvroFrameStats.mayMatch(frames, fields, _)) && {
                  !wantBloom || bloomB64.isEmpty || {
                    val bf = AvroFrameStats.blooms(bloomB64)
                    val ok = pushed.forall(AvroFrameStats.bloomMayMatch(bf, _))
                    if (ok) driverVerified += seg.getName
                    ok
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
    * ledger tore down. Past the cap, segments pass unpruned here and
    * the EXECUTOR-side gate takes over ([[AvroFrameStats.bloomBlocked]]):
    * each task consults its own segment's bloom before opening the
    * data file, so the residual pruning is distributed rather than lost.
    */
  val MaxDriverBloomOpens = 512
}
