package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import com.fasterxml.jackson.databind.ObjectMapper

/** Manifest commit protocol for the durable on-disk indexes (the minhash
  * index's four parquet tables, the LSH index's three, the pair table's
  * one). An increment's partitions become reader-visible ONLY when a
  * single `_manifest.json` naming the committed appendIds is atomically
  * republished — so a reader can never observe a HALF-APPENDED increment
  * (e.g. bands without sizes, whose inner join would silently drop the
  * half-appended docs' pairs), no matter where a writer crashed.
  *
  * Protocol per append (single writer, the owning stream/job):
  *   1. write every table's `append=<id>` partition (any order; a crash
  *      here leaves partitions invisible — the manifest does not name
  *      the id yet);
  *   2. republish the manifest with the id added — one staged write +
  *      ATOMIC_MOVE, the txn-log publish discipline.
  *
  * Replay of a fully committed append is a NO-OP (the id is already in
  * the manifest and its partitions are intact); rewriting would
  * transiently empty the partitions under a concurrent out-of-band
  * reader. Replay of a crashed append overwrites partitions no reader
  * could list, then commits.
  *
  * Loaders resolve the visible partition set FROM the manifest: committed
  * ids minus the caller's `excludeAppends` (the replay-safety primitive —
  * a replaying increment must probe the pre-increment corpus). A missing
  * manifest means the initial save never completed and loading fails
  * loudly rather than exposing a torn base.
  *
  * The underscore-prefixed manifest and dot-prefixed staging temp are
  * both invisible to Spark's file listing, so they coexist with the
  * parquet partitions at the same root.
  */
object DurableIndex {

  /** Crash-seam hook for the append-protocol specs (the
    * [[graft.sources.TxnLog.crashSeam]] pattern): a spec installs a
    * handler that throws — or a forked child `halt(9)`s — at a named
    * boundary between table commits. Production never sets it; each seam
    * costs one volatile null read.
    */
  @volatile private[graft] var crashSeam: String => Unit = null
  @inline private[operators] def seam(name: String): Unit = {
    val h = crashSeam
    if (h != null) h(name)
  }

  private val mapper = new ObjectMapper()

  private def manifestPath(path: String) = Paths.get(path, "_manifest.json")

  /** The committed append set, or None when no manifest exists (initial
    * save incomplete, or a pre-manifest directory). Order is commit
    * order: the LAST entry is the newest increment.
    */
  def committed(path: String): Option[Seq[String]] = {
    val p = manifestPath(path)
    if (!Files.exists(p)) None
    else {
      val node = mapper.readTree(Files.readAllBytes(p))
      import scala.jdk.CollectionConverters._
      Some(node.get("appends").elements().asScala.map(_.asText()).toSeq)
    }
  }

  /** AppendIds whose rows were folded into the current base by an index
    * compaction ([[commitFold]]). Kept in the manifest so a LATE retry
    * of an already-folded increment no-ops instead of re-appending rows
    * the base already contains.
    */
  def foldedIds(path: String): Seq[String] = {
    val p = manifestPath(path)
    if (!Files.exists(p)) Nil
    else {
      val node = mapper.readTree(Files.readAllBytes(p))
      val f = node.get("folded")
      if (f == null) Nil
      else {
        import scala.jdk.CollectionConverters._
        f.elements().asScala.map(_.asText()).toSeq
      }
    }
  }

  /** Committed appendIds a loader should expose: manifest order minus the
    * caller's exclusions. Fails loudly when no manifest has ever been
    * published — a torn initial save must not read as an empty index.
    */
  def visible(path: String, excludeAppends: Seq[String]): Seq[String] =
    committed(path)
      .getOrElse(sys.error(s"index at $path has no committed manifest — " +
        "the initial save did not complete (or predates the manifest " +
        "protocol); rebuild with save*Index"))
      .filterNot(excludeAppends.contains)

  /** True when the id is live-committed OR already folded into the base
    * — either way its rows are in the index and a retry must no-op.
    */
  def isCommitted(path: String, appendId: String): Boolean =
    committed(path).exists(_.contains(appendId)) ||
      foldedIds(path).contains(appendId)

  /** Atomically publish the committed set (and the folded-id record):
    * staged temp + ATOMIC_MOVE over the previous manifest.
    */
  private def publish(path: String, ids: Seq[String],
      folded: Seq[String]): Unit = {
    val node = mapper.createObjectNode()
    val arr = node.putArray("appends")
    ids.distinct.foreach(arr.add)
    if (folded.nonEmpty) {
      val fa = node.putArray("folded")
      folded.distinct.foreach(fa.add)
    }
    val tmp = Files.createTempFile(Paths.get(path), ".manifest", ".tmp")
    Files.write(tmp, mapper.writeValueAsString(node)
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestPath(path), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** First publish after an initial save: exactly the base partitions. */
  def initManifest(path: String): Unit = publish(path, Seq("base"), Nil)

  /** Commit one append: republish the manifest with the id added
    * (idempotent — republishing an already-present id rewrites the same
    * set). The folded-id record carries through unchanged.
    */
  def commitAppend(path: String, appendId: String): Unit = {
    seam(s"manifest:pre-commit:$appendId")
    publish(path, committed(path).getOrElse(Seq("base")) :+ appendId,
      foldedIds(path))
  }

  /** Commit an index compaction: the visible set becomes the freshly
    * folded base plus the KEPT (unfolded) newest appends, and every
    * folded non-base id is recorded so late retries no-op. Enforces the
    * single-writer contract loudly: the manifest must still equal what
    * the compactor read at entry — an append that committed mid-fold
    * would otherwise silently vanish from visibility.
    */
  def commitFold(path: String, entryAppends: Seq[String],
      newBaseId: String, kept: Seq[String]): Unit = {
    seam(s"manifest:pre-fold:$newBaseId")
    val now = committed(path)
    require(now.contains(entryAppends),
      s"index at $path changed during compaction (manifest $now vs entry " +
        s"$entryAppends) — compaction must run from the single writer, " +
        "quiescent between appends")
    val newlyFolded = entryAppends.filterNot(kept.contains)
      .filterNot(_.startsWith("base"))
    publish(path, newBaseId +: kept, foldedIds(path) ++ newlyFolded)
  }

  /** Deferred deletion for index compaction (the quote-state/vacuum
    * retention discipline): remove `append=<id>` partitions that the
    * manifest no longer references once they are older than
    * `retentionMs` — folded history and orphans of crashed folds. The
    * retention window is what lets a reader that pinned the
    * pre-compaction manifest keep scanning intact files; an in-flight
    * (not yet committed) append is likewise protected by its youth.
    * Stale manifest staging temps are swept on the same clock.
    */
  def sweepUnreferenced(path: String, tableDirs: Seq[String],
      retentionMs: Long): Unit = {
    val liveOpt = committed(path)
    if (liveOpt.isEmpty) return // no manifest: nothing is safely sweepable
    val live = liveOpt.get.toSet
    val cutoff = System.currentTimeMillis() - math.max(0L, retentionMs)
    import scala.jdk.CollectionConverters._
    def old(p: java.nio.file.Path): Boolean =
      Files.getLastModifiedTime(p).toMillis <= cutoff
    tableDirs.foreach { sub =>
      val root = if (sub.isEmpty) Paths.get(path) else Paths.get(path, sub)
      if (Files.isDirectory(root)) {
        val s = Files.list(root)
        val doomed =
          try s.iterator().asScala.filter { p =>
            val n = p.getFileName.toString
            Files.isDirectory(p) && n.startsWith("append=") &&
              !live.contains(n.stripPrefix("append=")) && old(p)
          }.toList
          finally s.close()
        doomed.foreach { d =>
          val w = Files.walk(d)
          try w.sorted(java.util.Comparator.reverseOrder())
            .forEach(f => Files.deleteIfExists(f))
          finally w.close()
        }
      }
    }
    val s = Files.list(Paths.get(path))
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(".manifest") &&
        p.getFileName.toString.endsWith(".tmp") && old(p))
      .toList.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
