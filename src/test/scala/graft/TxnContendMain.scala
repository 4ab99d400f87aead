package graft

import java.nio.file.{Files, Paths}

import graft.sources.TxnLog

/** Forked-JVM worker for the ScaleRun `txncontend` rung: after a
  * rendezvous (so the measured window is fully contended), commits `n`
  * blind appends against a SHARED log root and reports wall time plus
  * the instance's lost-race retry telemetry. No Spark — the txn log is
  * pure file IO, and the exclusive-create publish protocol's
  * throughput-under-contention claim is a cross-PROCESS property
  * ([[TxnRaceMain]]'s rationale).
  *
  * Output (`contend-<tag>`): `wallMs totalRetries maxRetriesPerCommit`.
  */
object TxnContendMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val tag = args(2)
    val log = new TxnLog(root)
    Files.createFile(Paths.get(root, s"ready-$tag"))
    val go = Paths.get(root, "go")
    val deadline = System.currentTimeMillis() + 60000
    while (!Files.exists(go) && System.currentTimeMillis() < deadline)
      Thread.sleep(2)
    require(Files.exists(go), s"worker $tag: rendezvous timed out")
    var maxPerCommit = 0L
    val t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val before = log.contentionRetries.get()
      log.commit(added = Seq(s"$tag-$i.parquet"))
      maxPerCommit =
        math.max(maxPerCommit, log.contentionRetries.get() - before)
    }
    val wallMs = (System.nanoTime() - t0) / 1e6
    // Locale.ROOT: a comma decimal separator from the platform locale
    // would break the harness's toDouble parse
    Files.write(Paths.get(root, s"contend-$tag"),
      String.format(java.util.Locale.ROOT, "%.1f %d %d",
        Double.box(wallMs), Long.box(log.contentionRetries.get()),
        Long.box(maxPerCommit)).getBytes("UTF-8"))
  }
}
