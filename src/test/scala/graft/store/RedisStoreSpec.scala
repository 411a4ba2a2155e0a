package graft.store

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the REAL RESP2 wire protocol of [[RedisStore]] against an
  * in-process Redis-subset server (no external service in this sandbox).
  * The server parses actual RESP arrays off the socket — so framing, bulk
  * lengths in BYTES, nil replies, and reconnect behavior are all tested on
  * the wire, not mocked at the trait.
  */
class RedisStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new MiniRespServer
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

  test("a short-arity command gets -ERR on the wire, and the connection survives") {
    // raw socket: a buggy client sending SET with one argument must see a
    // protocol error (real Redis's 'wrong number of arguments'), not a
    // silent close that blocks it until EOF
    val sock = new java.net.Socket("127.0.0.1", server.port)
    try {
      val out = sock.getOutputStream
      out.write("*2\r\n$3\r\nSET\r\n$1\r\nk\r\n".getBytes("UTF-8")); out.flush()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
      val err = in.readLine()
      assert(err != null && err.startsWith("-ERR wrong number of arguments"),
        s"got: $err")
      // same connection still serves well-formed commands afterwards
      out.write("*1\r\n$4\r\nPING\r\n".getBytes("UTF-8")); out.flush()
      assert(in.readLine() === "+PONG")
    } finally sock.close()
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
}
