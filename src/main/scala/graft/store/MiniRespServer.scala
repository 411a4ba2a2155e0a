package graft.store

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

/** Minimal in-process RESP2 server (GET/SET/DEL/DBSIZE/PING over a shared
  * map) — the cache-tier stand-in for environments with no live Redis
  * (this sandbox). [[RedisStore]] speaks real RESP2 wire protocol against
  * it, so framing, bulk lengths in BYTES, nil replies, and reconnects are
  * exercised on an actual socket rather than mocked at the trait.
  * Used by `RedisStoreSpec` and the `AcceptanceDemo` runMain path; the
  * reference's cache contract is `cache/cache.go:25-52` (SET/GET/DEL with
  * nil-on-miss).
  */
final class MiniRespServer extends AutoCloseable {
  private val data = new ConcurrentHashMap[String, String]()
  private val ss = new ServerSocket(0)
  val port: Int = ss.getLocalPort
  @volatile private var open = List.empty[Socket]
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = ss.accept()
        synchronized { open = s :: open }
        val t = new Thread(() => serve(s))
        t.setDaemon(true)
        t.start()
      } catch { case _: IOException => /* closed */ }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  /** Close every live connection (simulates a cache-tier failover). */
  def dropConnections(): Unit = synchronized {
    open.foreach(s => try s.close() catch { case _: IOException => })
    open = Nil
  }

  override def close(): Unit = { running = false; ss.close(); dropConnections() }

  private def serve(s: Socket): Unit = {
    val in = new BufferedInputStream(s.getInputStream)
    val out = new BufferedOutputStream(s.getOutputStream)
    def line(): String = {
      val sb = new StringBuilder
      var c = in.read()
      if (c < 0) throw new IOException("eof")
      while (c != '\r') { sb.append(c.toChar); c = in.read() }
      in.read() // \n
      sb.toString
    }
    def reply(r: String): Unit = { out.write(r.getBytes(UTF_8)); out.flush() }
    try {
      while (true) {
        val head = line()
        if (!head.startsWith("*")) throw new IOException(s"expected array, got $head")
        val n = head.drop(1).toInt
        val parts = (0 until n).map { _ =>
          val l = line()
          if (!l.startsWith("$")) throw new IOException(s"expected bulk, got $l")
          val len = l.drop(1).toInt
          val buf = new Array[Byte](len)
          var off = 0
          while (off < len) {
            val r = in.read(buf, off, len - off)
            if (r < 0) throw new IOException("eof")
            off += r
          }
          in.read(); in.read() // \r\n
          new String(buf, UTF_8)
        }
        // arity per command, checked BEFORE indexing into parts: a short
        // SET must get a -ERR reply like real Redis ("wrong number of
        // arguments"), not an escaped IndexOutOfBounds that silently
        // closes the connection and leaves the client blocked until EOF
        val cmd = if (parts.isEmpty) "" else parts.head.toUpperCase
        val arity = Map("PING" -> 1, "SET" -> 3, "GET" -> 2, "DEL" -> 2,
          "DBSIZE" -> 1)
        if (arity.get(cmd).exists(_ != parts.length)) {
          reply(s"-ERR wrong number of arguments for '${cmd.toLowerCase}' command\r\n")
        } else cmd match {
          case "PING"   => reply("+PONG\r\n")
          case "SET"    => data.put(parts(1), parts(2)); reply("+OK\r\n")
          case "GET"    =>
            val v = data.get(parts(1))
            if (v == null) reply("$-1\r\n")
            else reply(s"$$${v.getBytes(UTF_8).length}\r\n$v\r\n")
          case "DEL"    =>
            val had = data.remove(parts(1)) != null
            reply(s":${if (had) 1 else 0}\r\n")
          case "DBSIZE" => reply(s":${data.size}\r\n")
          case other    => reply(s"-ERR unknown command '$other'\r\n")
        }
      }
    } catch { case _: IOException => /* client gone */ }
    finally { try s.close() catch { case _: IOException => } }
  }
}
