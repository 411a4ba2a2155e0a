package graft.store

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the REAL RESP2 wire protocol of [[RedisStore]] against an
  * in-process Redis-subset server (no external service in this sandbox).
  * The server parses actual RESP arrays off the socket — so framing, bulk
  * lengths in BYTES, nil replies, and reconnect behavior are all tested on
  * the wire, not mocked at the trait.
  */
class RedisStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new MiniResp
  private lazy val store = new RedisStore("127.0.0.1", server.port)

  override def afterAll(): Unit = { store.close(); server.close() }

  test("PING, SET/GET round-trip, nil on miss, DEL idempotent, DBSIZE") {
    assert(store.ping())
    assert(store.get("14").isEmpty)
    store.put("14", """{"code":14,"name":"Faust"}""")
    assert(store.get("14").contains("""{"code":14,"name":"Faust"}"""))
    assert(store.size == 1)
    store.del("14")
    store.del("14") // DEL of absent key: no error (idempotent replay, O-15)
    assert(store.get("14").isEmpty && store.size == 0)
  }

  test("values with CRLF, unicode, and multi-byte lengths frame correctly") {
    val v = "line1\r\nline2 é世界 {\"k\":\"v\"}"
    store.put("weird", v)
    assert(store.get("weird").contains(v)) // byte-length framing, not char-length
    store.del("weird")
  }

  test("reconnects once after the server drops the connection") {
    store.put("a", "1")
    server.dropConnections()          // simulate cache-tier failover
    assert(store.get("a").contains("1")) // one transparent reconnect per op
  }

  test("RedisStoreFactory pools one client per (host,port) in the JVM") {
    val f1 = RedisStoreFactory("127.0.0.1", server.port)
    val f2 = RedisStoreFactory("127.0.0.1", server.port)
    assert(f1.client() eq f2.client())
  }

  /** Minimal RESP2 server: GET/SET/DEL/DBSIZE/PING over a shared map. */
  private final class MiniResp extends AutoCloseable {
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
          new Thread(() => serve(s)).start()
        } catch { case _: IOException => /* closed */ }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()

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
          assert(head.startsWith("*"), s"expected array, got $head")
          val n = head.drop(1).toInt
          val parts = (0 until n).map { _ =>
            val l = line()
            assert(l.startsWith("$"))
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
          parts.head.toUpperCase match {
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
}
