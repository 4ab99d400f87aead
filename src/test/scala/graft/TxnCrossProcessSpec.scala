package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** CROSS-PROCESS writer safety: two real JVMs committing concurrently
  * against one log root. TxnSafetySpec's thread races share a JVM —
  * same atomics, same page-cache view — so they cannot falsify the
  * protocol's actual claim: `Files.createLink` exclusive-create
  * arbitrates writers across PROCESS boundaries (the multi-writer
  * cluster shape: two Spark drivers, or a driver and a maintenance
  * job, sharing a table).
  *
  * Asserts: no lost commit (every append from both workers is live),
  * versions stay contiguous (no overwrite ever), and a contended
  * `requireLive` rewrite of one shared file has EXACTLY one winner —
  * the loser throws ConcurrentModificationException in its own
  * process rather than silently resurrecting the file.
  */
class TxnCrossProcessSpec extends AnyFunSuite {

  private def forkWorker(root: String, n: Int, tag: String): Process = {
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(
      java, "-cp", sys.props("java.class.path"),
      "graft.TxnRaceMain", root, n.toString, tag)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    pb.start()
  }

  test("two JVMs: no lost commits, contiguous versions, one loud requireLive loser") {
    val root = Files.createTempDirectory("txnxproc").toString
    val seed = new TxnLog(root)
    seed.commit(added = Seq("shared.parquet")) // v0: the contended file
    val n = 50
    val a = forkWorker(root, n, "a")
    val b = forkWorker(root, n, "b")
    assert(a.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "worker a hung")
    assert(b.waitFor(120, java.util.concurrent.TimeUnit.SECONDS), "worker b hung")
    assert(a.exitValue() == 0, "worker a crashed")
    assert(b.exitValue() == 0, "worker b crashed")

    val outA = new String(Files.readAllBytes(Paths.get(root, "outcome-a")))
    val outB = new String(Files.readAllBytes(Paths.get(root, "outcome-b")))
    assert(Set(outA, outB) == Set("win", "lose"),
      s"expected exactly one winner, got a=$outA b=$outB")

    // fresh reader (third "process"): every blind append from both
    // workers is live — nothing was lost to the version race
    val reader = new TxnLog(root)
    val live = reader.snapshotFiles().toSet
    (0 until n).foreach { i =>
      assert(live.contains(s"a-$i.parquet"), s"lost a-$i")
      assert(live.contains(s"b-$i.parquet"), s"lost b-$i")
    }
    // the winner's rewrite landed, the shared file is gone, the loser
    // changed nothing
    val winner = if (outA == "win") "a" else "b"
    val loser = if (outA == "win") "b" else "a"
    assert(live.contains(s"$winner-rewrite.parquet"))
    assert(!live.contains(s"$loser-rewrite.parquet"))
    assert(!live.contains("shared.parquet"))

    // contiguous versions: v0 seed + 2n appends + 1 winning rewrite
    val expectedHead = 2L * n + 1L
    assert(reader.currentVersion() == expectedHead,
      s"version head ${reader.currentVersion()} != $expectedHead")
    val all = reader.commits()
    assert(all.map(_.version) == (0L to expectedHead),
      "version sequence not contiguous")
    // and no commit was overwritten: every append appears exactly once
    val addedAll = all.flatMap(_.added)
    assert(addedAll.distinct.size == addedAll.size,
      "a commit was duplicated/overwritten")
  }
}
