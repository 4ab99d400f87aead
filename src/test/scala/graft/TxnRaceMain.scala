package graft

import java.nio.file.{Files, Paths}

import graft.sources.TxnLog

/** Forked-JVM worker for [[TxnCrossProcessSpec]]: commits `n` blind
  * appends against a SHARED log root, rendezvous with the sibling
  * process via marker files, then races it on ONE contended
  * `requireLive` rewrite of the same shared file. Writes its outcome
  * (`win` / `lose`) for the spec to assert exactly-one-winner.
  *
  * No Spark — the txn log is pure file IO, which is the point: the
  * exclusive-createLink publish protocol claims CROSS-PROCESS safety,
  * and an in-process two-thread spec cannot exercise the claim (same
  * JVM, same page cache view, same atomics).
  */
object TxnRaceMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val tag = args(2)
    val log = new TxnLog(root)
    (0 until n).foreach(i => log.commit(added = Seq(s"$tag-$i.parquet")))
    // rendezvous so the contended commit really contends
    Files.createFile(Paths.get(root, s"ready-$tag"))
    val other = if (tag == "a") "b" else "a"
    val deadline = System.currentTimeMillis() + 30000
    while (!Files.exists(Paths.get(root, s"ready-$other")) &&
      System.currentTimeMillis() < deadline) Thread.sleep(5)
    val outcome =
      try {
        log.commit(added = Seq(s"$tag-rewrite.parquet"),
          removed = Seq("shared.parquet"),
          requireLive = Seq("shared.parquet"))
        "win"
      } catch {
        case _: java.util.ConcurrentModificationException => "lose"
      }
    Files.write(Paths.get(root, s"outcome-$tag"),
      outcome.getBytes("UTF-8"))
  }
}
