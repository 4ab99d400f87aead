package graft.streaming

import graft.SparkSpec

/** The WebSocket source's restart contract: frame numbering is MONOTONE
  * across restarts. Pre-r16 a reconnected stream counted from 0 against
  * a checkpoint holding larger offsets, so the engine saw "no new data"
  * until the fresh count climbed past the old high water — silently
  * absorbing that many live frames. The persisted epoch
  * (`websocket-epoch` under the source's checkpoint dir, republished at
  * every commit) makes a restarted stream resume numbering AT the
  * committed high-water mark, so the first post-restart frame is
  * immediately deliverable.
  */
class WebSocketEpochSpec extends SparkSpec {

  private def frames(p: org.apache.spark.sql.connector.read.InputPartition)
      : Seq[String] = p.asInstanceOf[WsInputPartition].rows.toSeq

  private def awaitOffset(s: WebSocketMicroBatchStream, n: Long): Unit = {
    val deadline = System.currentTimeMillis() + 30000
    while (s.latestOffset().asInstanceOf[WsOffset].n < n &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(s.latestOffset().asInstanceOf[WsOffset].n >= n,
      s"feed never reached offset $n")
  }

  test("restart resumes frame numbering at the committed high water, not 0") {
    spark // force session init: the source resolves its checkpoint FS
    val ckpt = tempDir("wsepoch")
    // session 1: three frames received, planned, committed
    val s1lines = Seq("p0", "p1", "p2")
    val server1 = new FeedReplayServer(s1lines, webSocket = true)
    val s1 = new WebSocketMicroBatchStream(server1.host, server1.port, ckpt)
    try {
      assert(s1.initialOffset().asInstanceOf[WsOffset].n == 0L)
      assert(server1.awaitDrained(30000))
      awaitOffset(s1, 3L)
      val batch = s1.planInputPartitions(WsOffset(0L), WsOffset(3L))
      assert(batch.toSeq.flatMap(frames) == s1lines)
      s1.commit(WsOffset(3L))
    } finally { s1.stop(); server1.close() }

    // session 2 (the restart): a NEW connection serving NEW frames
    // against the SAME checkpoint. Numbering must resume at 3 — with
    // the old from-0 numbering the three fresh frames would land at
    // offsets 0..3, all at or below the checkpoint's high water, and
    // the engine would deliver none of them.
    val s2lines = Seq("p3", "p4", "p5")
    val server2 = new FeedReplayServer(s2lines, webSocket = true)
    val s2 = new WebSocketMicroBatchStream(server2.host, server2.port, ckpt)
    try {
      assert(s2.initialOffset().asInstanceOf[WsOffset].n == 3L,
        "epoch not resumed from the committed high water")
      assert(server2.awaitDrained(30000))
      awaitOffset(s2, 6L)
      // the engine's next batch (checkpointed start = 3) delivers the
      // fresh frames immediately
      val batch = s2.planInputPartitions(WsOffset(3L), WsOffset(6L))
      assert(batch.toSeq.flatMap(frames) == s2lines)
      s2.commit(WsOffset(6L))
    } finally { s2.stop(); server2.close() }

    // a third incarnation sees the advanced epoch (and a torn temp file
    // cannot regress it: readEpoch takes the max of published + temp)
    val server3 = new FeedReplayServer(Nil, webSocket = true)
    val s3 = new WebSocketMicroBatchStream(server3.host, server3.port, ckpt)
    try assert(s3.initialOffset().asInstanceOf[WsOffset].n == 6L)
    finally { s3.stop(); server3.close() }
  }
}
