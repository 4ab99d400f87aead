package graft

import java.nio.file.{Files, Paths}

import graft.sources.TxnLog

/** Forked-JVM worker for [[CrashRecoverySpec]]'s kill-mid-commit fuzz:
  * seeds a log with `nPre` commits (mixed payloads, so recovery has
  * schema/idempotence/checkpoint state to get wrong), then installs
  * `Runtime.halt(137)` at a named crash seam and runs ONE more commit
  * with a known payload, dying at that exact protocol point. A
  * `seam-fired` marker distinguishes a real mid-protocol kill from a
  * commit that never reached the seam (checkpoint seams only fire on
  * interval boundaries); `survived` marks a clean run.
  *
  * No Spark — like [[TxnRaceMain]], the log is pure file IO and the
  * claim under test (kill-anywhere durability) is a cross-process one.
  */
object TxnCrashMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val seamName = args(1)
    val nPre = args(2).toInt
    val ckptInterval = args(3).toInt
    val payload = args(4)
    val log = new TxnLog(root, ckptInterval)
    (0 until nPre).foreach { i =>
      log.commit(added = Seq(f"pre-$i%03d.parquet"),
        batchId = if (i % 3 == 0) Some(s"pre-batch-$i") else None,
        txn = if (i % 3 == 1) Some(("preapp", i.toLong)) else None,
        rowCounts = Map(f"pre-$i%03d.parquet" -> (100L + i)))
    }
    TxnLog.crashSeam = { name =>
      if (name == seamName) {
        Files.write(Paths.get(root, "seam-fired"), name.getBytes("UTF-8"))
        Runtime.getRuntime.halt(137)
      }
    }
    payload match {
      case "add" =>
        log.commit(added = Seq("kill.parquet"))
      case "rewrite" =>
        log.commit(added = Seq("kill.parquet"),
          removed = Seq("pre-000.parquet"),
          requireLive = Seq("pre-000.parquet"))
      case "batch" =>
        log.commit(added = Seq("kill.parquet"), batchId = Some("kill-batch"))
      case "txn" =>
        log.commit(added = Seq("kill.parquet"),
          txn = Some(("killapp", 1L)))
    }
    Files.write(Paths.get(root, "survived"), "ok".getBytes("UTF-8"))
  }
}
