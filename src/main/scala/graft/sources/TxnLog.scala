package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Delta-style transaction log (SURVEY.md §2.1 S11/S13; the reference
  * declares but does not implement this layer — README.md:43,50,136).
  *
  * Layout: `<root>/_txn_log/v%08d.json`, one JSON commit per version:
  * `{version, timestampMs, added: [relative paths], removed: [...],
  *   batchId?: "streamId-batchId"}`.
  *
  * Snapshot(v) = replay of commits 0..v: union of `added` minus `removed`.
  * Atomicity: commits are written to a temp file then moved with
  * ATOMIC_MOVE + CREATE-exclusive semantics — a concurrent writer racing to
  * the same version loses the rename and retries at the next version
  * (single-driver scope matches the reference, SURVEY §7.4-3). Readers only
  * ever see fully-written commit files.
  *
  * Scale note: the log stores *relative file paths*, not data; replay cost
  * is O(commits). Production-scale variants add checkpoints every N
  * commits — straightforward here because snapshots are pure folds.
  */
final class TxnLog(root: String, checkpointInterval: Int = 10) {
  private val mapper = new ObjectMapper()
  private val logDir: Path = Paths.get(root, "_txn_log")

  final case class Commit(
      version: Long,
      timestampMs: Long,
      added: Seq[String],
      removed: Seq[String],
      batchId: Option[String])

  private def versionPath(v: Long): Path = logDir.resolve(f"v$v%08d.json")

  /** Directory listing with the stream closed (called per commit — an
    * unclosed Files.list leaks a directory fd each call).
    */
  private def listNames(): Seq[String] =
    if (!Files.isDirectory(logDir)) Nil
    else {
      val s = Files.list(logDir)
      try s.iterator().asScala.map(_.getFileName.toString).toList
      finally s.close()
    }

  def currentVersion(): Long =
    listNames()
      .collect { case s if s.matches("v\\d{8}\\.json") => s.substring(1, 9).toLong }
      .foldLeft(-1L)(math.max)

  def commits(upTo: Long = Long.MaxValue): Seq[Commit] = {
    val cur = currentVersion()
    (0L to math.min(cur, upTo)).map(read)
  }

  private def read(v: Long): Commit = {
    val node = mapper.readTree(Files.readAllBytes(versionPath(v)))
    def arr(name: String): Seq[String] =
      Option(node.get(name)).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Nil)
    Commit(
      node.get("version").asLong(),
      node.get("timestampMs").asLong(),
      arr("added"),
      arr("removed"),
      Option(node.get("batchId")).filter(!_.isNull).map(_.asText()))
  }

  /** Append a commit; returns the committed version. Retries on version
    * collision (optimistic concurrency via exclusive file creation).
    */
  def commit(added: Seq[String], removed: Seq[String] = Nil,
      batchId: Option[String] = None): Long = {
    Files.createDirectories(logDir)
    var attempt = 0
    while (true) {
      val v = currentVersion() + 1
      val node: ObjectNode = mapper.createObjectNode()
      node.put("version", v)
      node.put("timestampMs", System.currentTimeMillis())
      val a: ArrayNode = node.putArray("added"); added.foreach(a.add)
      val r: ArrayNode = node.putArray("removed"); removed.foreach(r.add)
      batchId.foreach { b => node.put("batchId", b); knownBatches += b }
      val tmp = Files.createTempFile(logDir, ".commit", ".tmp")
      Files.write(tmp, mapper.writerWithDefaultPrettyPrinter()
        .writeValueAsString(node).getBytes(StandardCharsets.UTF_8))
      try {
        // CREATE_NEW semantics: move fails if the target exists.
        Files.move(tmp, versionPath(v), StandardCopyOption.ATOMIC_MOVE)
        maybeCheckpoint(v)
        return v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.FileSystemException =>
          Files.deleteIfExists(tmp)
          attempt += 1
          if (attempt > 100) sys.error(s"txn log contention at version $v")
      }
    }
    -1L // unreachable
  }

  /** Has a streaming micro-batch already committed? (T6 exactly-once:
    * foreachBatch replays become no-ops.) Batch ids are cached after one
    * log read — a full replay per micro-batch would make a long-lived
    * stream quadratic in its own commit count. Valid under the
    * single-writer scope (this process sees every commit it makes).
    */
  private lazy val knownBatches: scala.collection.mutable.Set[String] = {
    val s = scala.collection.mutable.Set.empty[String]
    commits().foreach(_.batchId.foreach(s += _))
    s
  }

  def hasBatch(batchId: String): Boolean = knownBatches.contains(batchId)

  // ---- checkpoints: O(commits) replay → O(interval) snapshot resolution.
  // Every `checkpointInterval` commits the full live file list is written
  // to checkpoint-v%08d.json; snapshot(v) replays only the tail after the
  // newest checkpoint <= v. At 100 ms flush cadence (864k commits/day,
  // README.md:37) unbounded replay would dominate query planning.

  private def checkpointPath(v: Long): Path =
    logDir.resolve(f"checkpoint-v$v%08d.json")

  private def maybeCheckpoint(v: Long): Unit =
    if (checkpointInterval > 0 && v > 0 && v % checkpointInterval == 0) {
      val node: ObjectNode = mapper.createObjectNode()
      node.put("version", v)
      val a: ArrayNode = node.putArray("files")
      snapshotFiles(v).foreach(a.add)
      val tmp = Files.createTempFile(logDir, ".ckpt", ".tmp")
      Files.write(tmp, mapper.writeValueAsString(node)
        .getBytes(StandardCharsets.UTF_8))
      try Files.move(tmp, checkpointPath(v), StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileSystemException =>
        Files.deleteIfExists(tmp) // lost a race; that checkpoint exists
      }
    }

  /** Newest checkpoint at or below `v`, if any: (version, live files). */
  private def latestCheckpoint(v: Long): Option[(Long, Seq[String])] = {
    val best = listNames()
      .collect { case s if s.matches("checkpoint-v\\d{8}\\.json") =>
        s.substring(12, 20).toLong }
      .filter(_ <= v)
      .foldLeft(-1L)(math.max)
    if (best < 0) None
    else {
      val node = mapper.readTree(Files.readAllBytes(checkpointPath(best)))
      Some((best, node.get("files").elements().asScala.map(_.asText()).toSeq))
    }
  }

  /** Live file list (relative paths) at a version (default: latest).
    * Starts from the newest checkpoint <= version, replaying only the
    * commit tail.
    */
  def snapshotFiles(version: Long = Long.MaxValue): Seq[String] = {
    val cur = currentVersion()
    val upTo = math.min(cur, version)
    val (from, initial) = latestCheckpoint(upTo)
      .map { case (cv, files) => (cv + 1, files) }
      .getOrElse((0L, Seq.empty[String]))
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    live ++= initial
    (from to upTo).map(read).foreach { c =>
      live ++= c.added
      live --= c.removed
    }
    live.toSeq
  }

  /** Latest version whose commit timestamp is <= tsMs (time travel AS OF). */
  def versionAsOf(tsMs: Long): Long =
    commits().filter(_.timestampMs <= tsMs).map(_.version)
      .foldLeft(-1L)(math.max)
}
