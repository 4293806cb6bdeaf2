package graft.serving

import java.io.{InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.util.Base64
import scala.collection.concurrent.TrieMap

/** Live WebSocket push edge — the reference's socket.io flow
  * (`src/api/server.ts:26-51`): a client sends `subscribe:orderbook:<pool>`,
  * immediately receives the pool's current book snapshot, and is pushed the
  * re-rendered book whenever that pool changes (the `onPoolCreated` /
  * update-chain broadcast). Socket.io is an app-level protocol over
  * WebSocket; the SEMANTICS (room-keyed subscribe + snapshot + push) are
  * what the engine must provide, so this speaks plain RFC 6455 — which the
  * JDK's own `java.net.http.WebSocket` client consumes, keeping the test
  * loop dependency-free.
  *
  * Server-side: a minimal RFC 6455 endpoint (HTTP upgrade handshake,
  * masked-client text frames, ping/pong, close), a pool→subscribers room
  * map, and a `push(pool, json)` entry point the streaming change feed
  * ([[graft.streaming.OrderBookStream.changeFeed]], ST8) calls per batch.
  * Unlike the reference — which emits an unawaited Promise so clients
  * receive `{}` (server.ts:33,46-49) — `snapshot` resolves BEFORE the frame
  * is written.
  *
  * Scale shape: this process holds no query state — snapshots come from the
  * serving views and pushes from the change feed, so N of these fan out
  * horizontally behind a balancer, each holding only its own sockets.
  */
object WsServer {

  private val WsGuid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  final class Running private[WsServer] (server: ServerSocket,
                                         snapshot: String => Option[String]) {
    private[WsServer] val rooms = new TrieMap[String, TrieMap[Socket, Unit]]()
    @volatile private[WsServer] var closed = false

    def port: Int = server.getLocalPort

    /** Push `json` to every subscriber of `pool` (ST8 change feed hook). */
    def push(pool: String, json: String): Unit =
      rooms.get(pool).foreach(_.keys.foreach { s =>
        try writeText(s.getOutputStream, json)
        catch { case _: java.io.IOException => unsubscribe(s) }
      })

    def subscriberCount(pool: String): Int = rooms.get(pool).map(_.size).getOrElse(0)

    /** True once [[stop]] ran — the hook [[ClusterFeed]]'s commit listener
      * uses to self-deregister when its serving context has died. */
    def isClosed: Boolean = closed

    def stop(): Unit = {
      closed = true
      rooms.values.foreach(_.keys.foreach(s => try s.close() catch { case _: Throwable => }))
      server.close()
    }

    private[WsServer] def unsubscribe(s: Socket): Unit =
      rooms.values.foreach(_.remove(s))

    private[WsServer] def acceptLoop(): Unit =
      while (!closed) {
        try {
          val sock = server.accept()
          val t = new Thread(() => handle(this, sock, snapshot))
          t.setDaemon(true)
          t.start()
        } catch { case _: java.io.IOException => /* server closed */ }
      }
  }

  /** Start the push endpoint. `snapshot(pool)` supplies the initial book
    * JSON sent on subscribe (None → no snapshot frame). Non-blocking.
    */
  def start(snapshot: String => Option[String], port: Int = 0): Running = {
    val server = new ServerSocket(port)
    val r = new Running(server, snapshot)
    val t = new Thread(() => r.acceptLoop())
    t.setDaemon(true)
    t.start()
    r
  }

  // ---- RFC 6455 plumbing ----

  private def handle(r: Running, sock: Socket,
                     snapshot: String => Option[String]): Unit =
    try {
      val in = sock.getInputStream
      val out = sock.getOutputStream
      handshake(in, out)
      var open = true
      while (open && !sock.isClosed) readFrame(in) match {
        case Some((0x1, payload)) => // text
          val msg = new String(payload, UTF_8)
          if (msg.startsWith("subscribe:orderbook:")) {
            val pool = msg.stripPrefix("subscribe:orderbook:")
            r.rooms.getOrElseUpdate(pool, new TrieMap[Socket, Unit]())
              .put(sock, ())
            // reference semantics: emit the current book on subscribe
            // (server.ts:29-35) — but resolved, not a Promise
            snapshot(pool).foreach(writeText(out, _))
          } else if (msg.startsWith("subscribe:clusters:")) {
            // maintained-view rooms (verdict r13 item 7): room key keeps
            // the `clusters:` topic prefix so cluster-view prefixes can
            // never collide with pool names in the shared room map; the
            // snapshot callback receives the full key and dispatches
            // ([[ClusterFeed.snapshotFor]]). Lowercased at registration
            // (ADVICE r14): pushes address rooms by the lowercased view
            // prefix, so a mixed-case subscription would otherwise join a
            // room that never receives anything, silently.
            val key = msg.stripPrefix("subscribe:")
              .toLowerCase(java.util.Locale.ROOT)
            r.rooms.getOrElseUpdate(key, new TrieMap[Socket, Unit]())
              .put(sock, ())
            snapshot(key).foreach(writeText(out, _))
          }
        case Some((0x9, payload)) => // ping→pong, under the same write lock
          out.synchronized { writeFrame(out, 0xA, payload) }
        case Some((0x8, _)) | None =>
          open = false; r.unsubscribe(sock); sock.close()
        case Some(_) => // ignore binary/continuation
      }
    } catch {
      // any failure — I/O, malformed frame, a Spark error from the snapshot
      // callback — must still unsubscribe and close, or the room map leaks
      // a dead socket
      case _: Throwable =>
        r.unsubscribe(sock)
        try sock.close() catch { case _: Throwable => () }
    }

  private def handshake(in: InputStream, out: OutputStream): Unit = {
    // read the HTTP upgrade request up to the blank line
    val req = new StringBuilder
    var state = 0 // consecutive chars of "\r\n\r\n" matched
    var b = in.read()
    while (b != -1 && state != 4) {
      req.append(b.toChar)
      state = (state, b.toChar) match {
        case (0, '\r') => 1
        case (1, '\n') => 2
        case (2, '\r') => 3
        case (3, '\n') => 4
        case (_, '\r') => 1
        case _         => 0
      }
      if (state != 4) b = in.read()
    }
    val key = req.toString.linesIterator
      .find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(throw new java.io.IOException("not a websocket upgrade"))
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest((key + WsGuid).getBytes(UTF_8)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(UTF_8))
    out.flush()
  }

  /** One client frame → (opcode, unmasked payload); None on EOF, a
    * truncated header, or a length outside what this endpoint accepts
    * (subscribe commands are tiny — anything past 1 MiB is protocol abuse).
    */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    def byte(): Int = in.read() // -1 on EOF, poisons len below
    val b0 = byte()
    if (b0 == -1) return None
    val opcode = b0 & 0x0f
    val b1 = byte()
    if (b1 == -1) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7f
    if (len == 126) len = (byte().toLong << 8) | byte()
    else if (len == 127) {
      len = 0
      for (_ <- 0 until 8) len = (len << 8) | byte()
    }
    if (len < 0 || len > 1048576) return None // EOF mid-header or absurd size
    val mask = if (masked) Array.fill(4)(byte().toByte) else Array.empty[Byte]
    val payload = in.readNBytes(len.toInt)
    if (payload.length < len) return None // EOF mid-payload
    if (masked) payload.indices.foreach(i => payload(i) = (payload(i) ^ mask(i % 4)).toByte)
    Some((opcode, payload))
  }

  private def writeText(out: OutputStream, msg: String): Unit =
    out.synchronized { writeFrame(out, 0x1, msg.getBytes(UTF_8)) }

  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    val n = payload.length
    val header =
      if (n < 126) Array((0x80 | opcode).toByte, n.toByte)
      else if (n < 65536) Array((0x80 | opcode).toByte, 126.toByte,
        (n >> 8).toByte, n.toByte)
      else Array((0x80 | opcode).toByte, 127.toByte, 0.toByte, 0.toByte,
        0.toByte, 0.toByte, (n >> 24).toByte, (n >> 16).toByte,
        (n >> 8).toByte, n.toByte)
    out.write(header); out.write(payload); out.flush()
  }
}
