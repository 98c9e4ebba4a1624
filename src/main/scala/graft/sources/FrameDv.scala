package graft.sources

import java.io.File

/** Deletion vectors (round 15) — the merge-on-read half of row-level
  * DELETE: instead of rewriting a whole segment to drop a few rows
  * (copy-on-write, O(segment bytes) per touched segment), a DELETE
  * writes a tiny position sidecar `<segment>.dv<gen>` naming the
  * deleted frame ordinals, and every scan filters against it. The
  * Iceberg-v2 position-delete pattern on the frame log: DELETE cost
  * becomes O(deleted rows) + O(touched segments' decode for the
  * predicate), and at 100 TB a sparse DELETE touching 1% of rows in
  * every segment stops rewriting the table.
  *
  * Format: `GDV1` magic, BE int count, `count` strictly-increasing BE
  * int frame ordinals (0-based positions within the segment, the same
  * ordinal space as the `_frame_offset` metadata column). Vectors are
  * CUMULATIVE — gen k holds every position deleted so far — so a scan
  * consults exactly ONE vector per segment, and a second DELETE
  * replaces the vector rather than chaining. Vectors are versioned
  * like every other maintenance artifact: minting one is a `dv`
  * manifest entry (one DELETE = one version), the prior vector retires
  * to `_history/` for time travel, and compaction folds vectors into
  * the rewritten bytes (the replaced set includes the folded vector,
  * so snapshot substitution stays exact).
  *
  * Segment positions are those of DECODABLE frames only by
  * construction (a position enters a vector because the predicate
  * matched the decoded record), so `sidecar frames − |dv|` is the
  * segment's exact live row count.
  */
object FrameDv {

  private val Magic = 0x47445631 // "GDV1"

  val NameRe = "^(.*)\\.dv(\\d+)$".r

  def isDvName(name: String): Boolean = NameRe.matches(name)

  /** Base segment name a vector applies to (`a.bin.dv3` → `a.bin`). */
  def baseOf(dvName: String): String = dvName match {
    case NameRe(base, _) => base
    case other => throw new IllegalArgumentException(s"not a deletion vector name: $other")
  }

  def nameFor(segmentName: String, gen: Int): String = s"$segmentName.dv$gen"

  /** Write a vector (sorted distinct positions) via temp + atomic
    * rename.
    */
  def write(target: File, positions: Array[Int]): Unit = {
    require(positions.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "deletion vector positions must be strictly increasing")
    val tmp = new File(target.getParentFile, "." + target.getName + ".tmp")
    val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(tmp), 1 << 16))
    try {
      out.writeInt(Magic)
      out.writeInt(positions.length)
      positions.foreach(out.writeInt)
    } finally out.close()
    FrameCommitIo.impl.swap(tmp, target)
  }

  /** Read a vector's positions (sorted). Fails loudly on corruption —
    * a scan silently ignoring a vector would resurrect deleted rows.
    */
  def read(f: File): Array[Int] = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      AvroFrames.openWithHistoryFallback(f.getAbsolutePath), 1 << 16))
    try {
      require(in.readInt() == Magic, s"bad deletion vector magic in ${f.getName}")
      val n = in.readInt()
      require(n >= 0, s"negative deletion vector count in ${f.getName}")
      Array.fill(n)(in.readInt())
    } finally in.close()
  }

  /** Cardinality from the 8-byte header alone — the cheap driver-side
    * count the planner's row statistics and limit-truncation proof
    * subtract.
    */
  def count(f: File): Int = {
    val in = new java.io.DataInputStream(
      AvroFrames.openWithHistoryFallback(f.getAbsolutePath))
    try {
      require(in.readInt() == Magic, s"bad deletion vector magic in ${f.getName}")
      in.readInt()
    } finally in.close()
  }

  /** Sequential membership tester over sorted positions — O(1) per
    * probe for a reader walking frame ordinals in order (the only
    * access pattern the scan has).
    */
  final class Cursor(positions: Array[Int]) {
    private var i = 0
    def contains(pos: Long): Boolean = {
      while (i < positions.length && positions(i) < pos) i += 1
      i < positions.length && positions(i) == pos
    }
    def isEmpty: Boolean = positions.length == 0
  }

  def cursor(path: String): Cursor = new Cursor(read(new File(path)))

  /** The live vector for a segment, if any: exactly one per base in
    * the live directory by the retire discipline (a new gen retires
    * its predecessor); max-gen wins defensively if a crash left two.
    */
  def liveDvOf(dir: File, segmentName: String): Option[String] = {
    val prefix = segmentName + ".dv"
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(prefix) &&
        f.getName.substring(prefix.length).forall(_.isDigit) &&
        f.getName.length > prefix.length)
      .sortBy(f => f.getName.substring(prefix.length).toInt)
      .lastOption.map(_.getName)
  }

  /** Split a mixed file list (as a time-travel snapshot resolves it)
    * into data segments and their vectors, paired by base NAME (the
    * vector may live in `_history/` while the base is live, or vice
    * versa).
    */
  def split(files: Array[File]): (Array[File], Map[String, File]) = {
    val (dvs, data) = files.partition(f => isDvName(f.getName))
    (data, dvs.map(f => baseOf(f.getName) -> f).toMap)
  }
}
