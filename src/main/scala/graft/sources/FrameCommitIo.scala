package graft.sources

import java.io.File

/** The commit protocol's filesystem primitives, isolated (round 17,
  * VERDICT r16 item 3). Everything transactional in the engine — the
  * table mutex, manifest/ledger/descriptor swaps, segment publishes,
  * history retirement, zero-copy clones — reduces to FIVE primitives,
  * and every call site routes through [[FrameCommitIo.impl]] so a
  * non-POSIX object store can supply its own implementation without
  * touching the protocol logic:
  *
  *  1. `tryLock` / `unlock` — mutual exclusion via atomic
  *     create-if-absent. POSIX: `File.createNewFile`. S3: conditional
  *     `PUT If-None-Match: *` of a lock object (strong consistency
  *     since 2020); GCS: precondition `ifGenerationMatch=0`. Stale
  *     detection stays age-based in the caller (`lastModified` maps to
  *     the lock object's creation time header).
  *  2. `publish(tmp, target)` — make a finished temp file visible
  *     under its final name, atomically, failing if the name is
  *     already taken (the exactly-once replay guard: first commit
  *     wins). POSIX: `renameTo` (fails on existing target on the same
  *     mount for our flow — commit sites check the target first
  *     anyway). S3/GCS: server-side COPY to the final key with an
  *     if-absent precondition, then DELETE the temp — visibility is
  *     the copy's atomic PUT.
  *  3. `swap(tmp, target)` — atomically REPLACE a metadata document
  *     (manifest, stats ledger, table descriptor, matview state,
  *     deletion vector). POSIX: `Files.move(REPLACE_EXISTING)`
  *     (rename(2) replaces atomically). S3/GCS: a plain PUT of the
  *     new body IS the atomic replace (readers see old or new, never
  *     torn bytes); the generation/etag takes the role the root-stamp
  *     race check plays locally.
  *  4. `move(src, dst, replace)` — retire a file (live → `_history/`),
  *     preserving its modification instant, which event replay orders
  *     on. POSIX: `Files.move` + explicit mtime restamp. S3/GCS:
  *     server-side copy + delete; the publish instant must travel as
  *     object METADATA (`x-amz-meta-publish-ms`) because object-store
  *     mtimes are write times — which is also why this engine already
  *     records publish instants in the manifest and ledger rather than
  *     trusting the filesystem (`MaintEntry.replacedMs`,
  *     `Entry.publishMs`): on an object store those records become the
  *     ONLY source of ordering truth, and they are already sufficient.
  *  5. `link(src, dst)` — zero-copy snapshot of a segment into a clone
  *     (`CALL clone`). POSIX: `Files.createLink`; returns false where
  *     hardlinks are unsupported and the caller falls back to a copy.
  *     S3/GCS: server-side COPY (no byte movement through the client —
  *     the same "zero egress" property hardlinks give locally).
  *
  * `renameDir` (table RENAME) is the one operation with NO atomic
  * object-store equivalent — a prefix rename is O(objects). The local
  * impl uses directory rename; an object-store impl would either
  * copy-sweep under the catalog lock or (better) indirect table names
  * through the catalog so RENAME is a metadata update. Recorded here
  * so the gap is a documented design decision, not a surprise.
  *
  * The default [[FrameCommitIo.Local]] preserves today's behavior
  * bit-for-bit; `impl` is process-global (executors in this engine
  * only ever write TEMP files — every visibility-granting primitive
  * runs on the driver at commit time, except the deletion-vector
  * swap, which is idempotent per generation).
  */
trait FrameCommitIo {

  /** Atomically create the lock file iff absent; true = acquired. */
  def tryLock(lock: File): Boolean

  /** Release a held lock (delete the lock object). */
  def unlock(lock: File): Unit

  /** Make `tmp` visible as `target` (same directory), atomically.
    * Callers guarantee `target` does not exist (they check first and
    * treat an existing target as a completed prior commit).
    */
  def publish(tmp: File, target: File): Boolean

  /** Atomically replace `target` with `tmp` — metadata documents only
    * (readers must see the old or the new doc, never torn bytes).
    */
  def swap(tmp: File, target: File): Unit

  /** Move `src` to `dst`, preserving `src`'s modification instant.
    * `replace` permits overwriting an existing `dst` (sidecar
    * re-retirement after a repair).
    */
  def move(src: File, dst: File, replace: Boolean = false): Unit

  /** Zero-copy snapshot `src` as `dst`; false = unsupported here,
    * caller falls back to a byte copy.
    */
  def link(src: File, dst: File): Boolean

  /** Rename a table directory (catalog RENAME). */
  def renameDir(src: File, dst: File): Boolean
}

object FrameCommitIo {

  /** POSIX local-filesystem implementation — the engine's default and
    * the reference semantics every alternative must match.
    */
  object Local extends FrameCommitIo {
    override def tryLock(lock: File): Boolean = lock.createNewFile()
    override def unlock(lock: File): Unit = lock.delete()
    override def publish(tmp: File, target: File): Boolean = tmp.renameTo(target)
    override def swap(tmp: File, target: File): Unit =
      java.nio.file.Files.move(tmp.toPath, target.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    override def move(src: File, dst: File, replace: Boolean): Unit = {
      val mtime = src.lastModified()
      if (replace)
        java.nio.file.Files.move(src.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else java.nio.file.Files.move(src.toPath, dst.toPath)
      java.nio.file.Files.setLastModifiedTime(dst.toPath,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    override def link(src: File, dst: File): Boolean =
      try { java.nio.file.Files.createLink(dst.toPath, src.toPath); true }
      catch { case _: UnsupportedOperationException | _: java.io.IOException => false }
    override def renameDir(src: File, dst: File): Boolean = src.renameTo(dst)
  }

  /** Active implementation. Swapped by tests (and, one day, by an
    * object-store deployment's session bootstrap); always restored to
    * [[Local]].
    */
  @volatile var impl: FrameCommitIo = Local
}
