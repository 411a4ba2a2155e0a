package graft.store

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Redis-backed [[KeyValueStore]]: a dependency-free RESP2 client over a
  * plain socket, speaking the exact wire protocol the reference's cache
  * binding uses (config/config.go:53-69 connects, queue/cdc.go:188 DELs,
  * controllers/controllers.go:56-68 GET/SETs — all single-key commands, so
  * RESP2 request/response is the whole protocol surface needed).
  *
  * Semantics parity with the reference:
  *   - `put` = `SET key value` with no TTL (controllers.go:68 passes 0).
  *   - `del` = `DEL key` — idempotent, the property O-15 replay requires.
  *   - `get` miss = RESP nil bulk string → None (reference treats "" as
  *     miss, controllers.go:57).
  *   - `size` = `DBSIZE` (test/diagnostic surface only).
  *
  * Concurrency: one socket, writes serialized by the monitor — matching the
  * reference's single shared client. A closed/broken connection is retried
  * once per operation (capped reconnect, config.go:121-152 spirit); beyond
  * that the IOException propagates so the streaming supervisor can restart
  * the batch (at-least-once, S-5: "error aborts the batch").
  */
final class RedisStore(host: String, port: Int,
                       connectTimeoutMs: Int = 2000,
                       readTimeoutMs: Int = 5000) extends KeyValueStore with AutoCloseable {

  private var sock: Socket = _
  private var in: BufferedInputStream = _
  private var out: BufferedOutputStream = _

  private def ensureConnected(): Unit = {
    if (sock == null || sock.isClosed || !sock.isConnected) {
      val s = new Socket()
      s.connect(new InetSocketAddress(host, port), connectTimeoutMs)
      s.setSoTimeout(readTimeoutMs)
      s.setTcpNoDelay(true)
      sock = s
      in = new BufferedInputStream(s.getInputStream)
      out = new BufferedOutputStream(s.getOutputStream)
    }
  }

  private def teardown(): Unit = {
    if (sock != null) { try sock.close() catch { case _: IOException => } }
    sock = null; in = null; out = null
  }

  /** Send one command (RESP array of bulk strings), read one reply. One
    * reconnect attempt on a broken pipe, then the error is the caller's. */
  private def command(parts: String*): Reply = synchronized {
    def attempt(): Reply = {
      ensureConnected()
      val sb = new java.lang.StringBuilder(64)
      sb.append('*').append(parts.length).append("\r\n")
      val head = sb.toString.getBytes(UTF_8)
      out.write(head)
      parts.foreach { p =>
        val b = p.getBytes(UTF_8)
        out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
        out.write(b)
        out.write('\r'); out.write('\n')
      }
      out.flush()
      readReply()
    }
    try attempt()
    catch { case _: IOException => teardown(); attempt() }
  }

  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(32)
    var c = in.read()
    while (c != '\r') {
      if (c < 0) throw new IOException("redis: connection closed mid-reply")
      sb.append(c.toChar)
      c = in.read()
    }
    if (in.read() != '\n') throw new IOException("redis: malformed reply terminator")
    sb.toString
  }

  private def readReply(): Reply = {
    val t = in.read()
    if (t < 0) throw new IOException("redis: connection closed")
    t.toChar match {
      case '+' => SimpleReply(readLine())
      case '-' => throw new IOException("redis error: " + readLine())
      case ':' => IntReply(readLine().toLong)
      case '$' =>
        val n = readLine().toInt
        if (n < 0) NilReply
        else {
          val buf = new Array[Byte](n)
          var off = 0
          while (off < n) {
            val r = in.read(buf, off, n - off)
            if (r < 0) throw new IOException("redis: truncated bulk string")
            off += r
          }
          if (in.read() != '\r' || in.read() != '\n')
            throw new IOException("redis: malformed bulk terminator")
          BulkReply(new String(buf, UTF_8))
        }
      case other => throw new IOException(s"redis: unsupported reply type '$other'")
    }
  }

  override def get(key: String): Option[String] = command("GET", key) match {
    case BulkReply(v) => Some(v)
    case NilReply     => None
    case r            => throw new IOException(s"redis: unexpected GET reply $r")
  }

  override def put(key: String, value: String): Unit = command("SET", key, value) match {
    case SimpleReply("OK") => ()
    case r                 => throw new IOException(s"redis: unexpected SET reply $r")
  }

  override def del(key: String): Unit = command("DEL", key) match {
    case IntReply(_) => () // 0 or 1 — DEL of an absent key is a no-op, kept idempotent
    case r           => throw new IOException(s"redis: unexpected DEL reply $r")
  }

  override def size: Int = command("DBSIZE") match {
    case IntReply(n) => n.toInt
    case r           => throw new IOException(s"redis: unexpected DBSIZE reply $r")
  }

  def ping(): Boolean = command("PING") match {
    case SimpleReply("PONG") => true
    case _                   => false
  }

  override def close(): Unit = synchronized(teardown())

  private sealed trait Reply
  private case class SimpleReply(s: String) extends Reply
  private case class BulkReply(s: String) extends Reply
  private case object NilReply extends Reply
  private final case class IntReply(n: Long) extends Reply
}

/** Executor-side factory for [[RedisStore]]: each executor JVM lazily opens
  * ONE pooled connection per (host, port) and every partition task reuses it
  * — at 1000 executors that is 1000 connections to the cache tier, not one
  * per task. Only the address is serialized into the closure.
  */
final case class RedisStoreFactory(host: String, port: Int) extends StoreClientFactory {
  def client(): KeyValueStore = RedisStoreFactory.pooled(host, port)
}

object RedisStoreFactory {
  private val pool = new java.util.concurrent.ConcurrentHashMap[(String, Int), RedisStore]()
  private def pooled(host: String, port: Int): RedisStore =
    pool.computeIfAbsent((host, port), { hp: (String, Int) => new RedisStore(hp._1, hp._2) })
}
