package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.Base64
import java.util.concurrent.{CopyOnWriteArrayList, LinkedBlockingDeque, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Minimal in-process RFC 6455 WebSocket server for specs: performs the
  * HTTP upgrade handshake, pushes queued binary frames to the connected
  * client, answers ping with pong, and records client text messages (the
  * heartbeat) and request headers. One client at a time — enough to play
  * the broker's role opposite [[WebSocketFrameClient]]. Frames queued
  * while no client is connected are delivered on the next connection,
  * which is what makes the reconnect test honest (drop mid-stream, the
  * remainder flows after re-dial). */
final class TestWsServer {
  private val server = new ServerSocket(0)
  server.setReuseAddress(true)

  val receivedTexts = new CopyOnWriteArrayList[String]()
  val receivedHeaders = new CopyOnWriteArrayList[String]()
  val connections = new AtomicInteger(0)

  private val pending = new LinkedBlockingDeque[Array[Byte]]()
  @volatile private var stopped = false
  @volatile private var currentSocket: Socket = _

  private val acceptThread = new Thread(() => acceptLoop(), "test-ws-accept")
  acceptThread.setDaemon(true)

  def start(): this.type = { acceptThread.start(); this }

  def port: Int = server.getLocalPort
  def url: String = s"ws://127.0.0.1:$port/stream"

  /** Queue a binary frame for delivery to the current (or next) client. */
  def send(frame: Array[Byte]): Unit = pending.put(frame)

  /** Abruptly sever the current connection (no close frame) — the client
    * must notice via read error and reconnect with backoff. */
  def drop(): Unit = {
    val s = currentSocket
    if (s != null) { try s.close() catch { case _: Throwable => } }
  }

  def stop(): Unit = {
    stopped = true
    drop()
    try server.close() catch { case _: Throwable => }
  }

  private def acceptLoop(): Unit =
    while (!stopped) {
      try {
        val sock = server.accept()
        sock.setTcpNoDelay(true)
        currentSocket = sock
        try handle(sock)
        catch { case _: Throwable => /* dropped or client gone */ }
        finally { try sock.close() catch { case _: Throwable => } }
      } catch { case _: Throwable => if (stopped) return }
    }

  private def handle(sock: Socket): Unit = {
    val in = new BufferedInputStream(sock.getInputStream)
    val out = new BufferedOutputStream(sock.getOutputStream)
    val key = readUpgrade(in)
    writeUpgradeResponse(out, key)
    connections.incrementAndGet()

    // writer: drain the queue into binary frames; reads happen below
    val writer = new Thread({ () =>
      try {
        while (!sock.isClosed) {
          val frame = pending.poll(50, TimeUnit.MILLISECONDS)
          if (frame != null) {
            // a frame taken just as the socket dies must not be lost —
            // push it back for the next connection's writer
            try out.synchronized { writeFrame(out, 0x2, frame); out.flush() }
            catch { case t: Throwable => pending.putFirst(frame); throw t }
          }
        }
      } catch { case _: Throwable => }
    }, "test-ws-writer")
    writer.setDaemon(true)
    writer.start()

    // reader: client frames are MASKED per RFC 6455 §5.3
    var open = true
    while (open && !sock.isClosed) {
      readFrame(in) match {
        case Some((0x1, payload)) =>
          receivedTexts.add(new String(payload, StandardCharsets.UTF_8))
        case Some((0x9, payload)) => // ping → pong
          out.synchronized { writeFrame(out, 0xA, payload); out.flush() }
        case Some((0x8, payload)) => // close → echo close, end connection
          out.synchronized { writeFrame(out, 0x8, payload); out.flush() }
          open = false
        case Some(_) => // binary/pong from client: ignore
        case None => open = false
      }
    }
  }

  /** Read the HTTP upgrade request; record headers; return the
    * Sec-WebSocket-Key. */
  private def readUpgrade(in: InputStream): String = {
    val sb = new StringBuilder
    var prev = 0
    var blanks = 0
    while (blanks < 2) { // request ends at \r\n\r\n
      val c = in.read()
      if (c < 0) throw new java.io.EOFException("client gone during upgrade")
      if (c == '\n' && prev == '\r') blanks += 1
      else if (c != '\r') blanks = 0
      prev = c
      sb.append(c.toChar)
    }
    val lines = sb.toString.split("\r\n").toSeq
    lines.drop(1).filter(_.nonEmpty).foreach(receivedHeaders.add)
    lines.find(_.toLowerCase.startsWith("sec-websocket-key:"))
      .map(_.split(":", 2)(1).trim)
      .getOrElse(throw new IllegalStateException("no Sec-WebSocket-Key"))
  }

  private def writeUpgradeResponse(out: OutputStream, key: String): Unit = {
    val accept = Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1").digest(
        (key + "258EAFA5-E914-47DA-95CA-C5AB0DC85B11")
          .getBytes(StandardCharsets.US_ASCII)))
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: $accept\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
    out.flush()
  }

  /** Server→client frame: FIN set, unmasked. */
  private def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    out.write(0x80 | opcode)
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n <= 0xFFFF) { out.write(126); out.write(n >> 8); out.write(n & 0xFF) }
    else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(payload)
  }

  /** Client→server frame (masked). Returns (opcode, unmasked payload). */
  private def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val opcode = b0 & 0x0F
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (in.read() << 8) | in.read()
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | in.read(); i += 1 }
    }
    val mask = if (masked) {
      val m = new Array[Byte](4)
      readFully(in, m); m
    } else Array.emptyByteArray
    val payload = new Array[Byte](len.toInt)
    readFully(in, payload)
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1
      }
    }
    Some((opcode, payload))
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Unit = {
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) throw new java.io.EOFException("client gone mid-frame")
      off += r
    }
  }
}
