package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxnLog

/** Kill-mid-commit recovery fuzz: a forked JVM is `Runtime.halt`ed at
  * every durability seam of [[TxnLog.commit]] (staged-not-published,
  * published-not-cleaned, recorded-not-checkpointed, and both
  * checkpoint-write seams) across randomized payload/interval/history
  * schedules, and each surviving log must satisfy the ACID claim the
  * reference makes (`/root/reference/README.md:25,43`):
  *
  *  - ATOMIC: the killed commit is all-or-nothing — the head is either
  *    its predecessor (no trace: files, row counts, idempotence) or the
  *    commit itself (every effect visible, including removes).
  *  - CONSISTENT: a fresh reader resolves the snapshot without error,
  *    versions are contiguous, and a checkpoint staged but never
  *    published is invisible (recovery replays commits instead).
  *  - DURABLE/EXACTLY-ONCE: once published, a batch/txn payload is
  *    visible to a fresh process's replay guard even when the writer
  *    died BEFORE folding its own in-memory idempotence state — the
  *    replay of the killed micro-batch no-ops if and only if the
  *    commit landed, and lands its rows otherwise.
  *  - EXTENDABLE: the next writer commits head+1 normally, and the
  *    crash residue (staged `.commit`/`.ckpt` tmps) is swept by the
  *    vacuum-path [[TxnLog.sweepStagedTmp]] hygiene pass.
  *
  * Cross-process like [[TxnCrossProcessSpec]], and for the same reason:
  * an in-JVM "crash" cannot falsify recovery-from-disk — the dead
  * process's caches must actually be gone.
  */
class CrashRecoverySpec extends AnyFunSuite {

  private val seams = Seq("commit:tmp-written", "commit:published",
    "commit:recorded", "ckpt:tmp-written", "ckpt:published")
  private val payloads = Seq("add", "rewrite", "batch", "txn")

  private def fork(root: String, seam: String, nPre: Int,
      ckptInterval: Int, payload: String): Int = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val pb = new ProcessBuilder(
      javaBin, "-cp", sys.props("java.class.path"),
      "graft.TxnCrashMain", root, seam, nPre.toString,
      ckptInterval.toString, payload)
    pb.redirectErrorStream(true)
    pb.redirectOutput(ProcessBuilder.Redirect.DISCARD)
    val p = pb.start()
    assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
      s"crash worker hung (seam=$seam)")
    p.exitValue()
  }

  private def tmpFiles(root: String): Seq[String] = {
    val dir = Paths.get(root, "_txn_log")
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".tmp")).toList
    finally s.close()
  }

  test("20+ randomized kill points: atomic, consistent, exactly-once, extendable") {
    val rnd = new scala.util.Random(0xC0FFEE)
    // every seam × 4+ rounds, randomized payload/history/interval; ckpt
    // seams get a boundary-aligned killed version (v = nPre must be a
    // checkpoint multiple or the seam never fires and the run survives)
    val schedules = (0 until 25).map { i =>
      val seam = seams(i % seams.size)
      val payload = payloads(rnd.nextInt(payloads.size))
      val ckpt = 1 + rnd.nextInt(4)
      val nPre =
        if (seam.startsWith("ckpt:")) ckpt * (2 + rnd.nextInt(4))
        else 3 + rnd.nextInt(8)
      (seam, payload, ckpt, nPre)
    }
    for ((seam, payload, ckpt, nPre) <- schedules) {
      val root = Files.createTempDirectory("txncrash").toString
      val label = s"seam=$seam payload=$payload ckpt=$ckpt nPre=$nPre"
      val exit = fork(root, seam, nPre, ckpt, payload)
      val fired = Files.exists(Paths.get(root, "seam-fired"))
      val survived = Files.exists(Paths.get(root, "survived"))
      assert(fired != survived, s"$label: fired=$fired survived=$survived")
      if (fired) assert(exit == 137, s"$label: exit=$exit")
      else assert(exit == 0, s"$label: exit=$exit")

      // ---- recovery: a FRESH process view (new instance, cold caches)
      val r = new TxnLog(root, ckpt)
      val head = r.currentVersion()
      val landed = survived || seam != "commit:tmp-written"
      assert(head == (if (landed) nPre.toLong else nPre - 1L),
        s"$label: head=$head")
      // consistent: contiguous versions, parseable commits
      assert(r.commits().map(_.version) == (0L to head), s"$label: gaps")
      // atomic: all-or-nothing payload visibility
      val live = r.snapshotFiles(head).toSet
      val preAll = (0 until nPre).map(i => f"pre-$i%03d.parquet").toSet
      val expected =
        if (!landed) preAll
        else if (payload == "rewrite") preAll - "pre-000.parquet" + "kill.parquet"
        else preAll + "kill.parquet"
      assert(live == expected, s"$label: snapshot diff " +
        s"missing=${expected.diff(live)} extra=${live.diff(expected)}")
      // row counts never reference dead files
      val rc = r.rowCountsAt(head)
      assert(rc.keySet.subsetOf(preAll + "kill.parquet"), s"$label: counts")
      // exactly-once: the replay of the killed micro-batch no-ops IFF
      // the commit landed — from a fresh process, which is where the
      // dead writer's unfolded in-memory state would show as a hole
      if (payload == "batch") {
        assert(r.hasBatch("kill-batch") == landed, s"$label: hasBatch")
        if (landed)
          intercept[TxnLog.DuplicateTxnException] {
            r.commit(added = Seq("replay.parquet"),
              batchId = Some("kill-batch"))
          }
      }
      if (payload == "txn") {
        assert(r.hasTxn("killapp", 1L) == landed, s"$label: hasTxn")
        if (landed)
          intercept[TxnLog.DuplicateTxnException] {
            r.commit(added = Seq("replay.parquet"),
              txn = Some(("killapp", 1L)))
          }
      }
      // a checkpoint staged but never moved is invisible; one published
      // is readable (snapshot above already proved both resolve)
      val ckptPath = Paths.get(root, "_txn_log",
        f"checkpoint-v$nPre%08d.json")
      if (seam == "ckpt:tmp-written" && fired)
        assert(!Files.exists(ckptPath), s"$label: staged ckpt visible")
      if (seam == "ckpt:published" && fired)
        assert(Files.exists(ckptPath), s"$label: published ckpt missing")
      // extendable: the next writer proceeds from the recovered head
      val w = new TxnLog(root, ckpt)
      val v2 = w.commit(added = Seq("post.parquet"))
      assert(v2 == head + 1, s"$label: next writer got $v2")
      assert(w.snapshotFiles(v2).toSet == expected + "post.parquet",
        s"$label: post-recovery snapshot")
      // hygiene: kills between staging and publish leave tmp residue;
      // the vacuum-path sweep clears it and spares nothing it shouldn't
      if (fired && (seam == "commit:tmp-written" || seam == "ckpt:tmp-written"))
        assert(tmpFiles(root).nonEmpty, s"$label: expected tmp residue")
      r.sweepStagedTmp(System.currentTimeMillis())
      assert(tmpFiles(root).isEmpty, s"$label: tmp residue after sweep")
    }
  }
}
