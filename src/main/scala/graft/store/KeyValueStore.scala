package graft.store

import java.util.concurrent.ConcurrentHashMap

/** The A3 serving layer (SURVEY.md s1.1): a key->JSON-row point cache with
  * string keys (decimal-stringified primary keys, O-5 parity — reference
  * queue/cdc.go:188, controllers/controllers.go:50-68).
  *
  * The trait is the seam a production deployment fills with Redis/RocksDB;
  * the in-memory impl backs tests and the single-process engine. All three
  * operations are idempotent under replay (DEL twice = DEL once), which the
  * at-least-once pipeline requires (O-15).
  */
trait KeyValueStore {
  def get(key: String): Option[String]
  def put(key: String, value: String): Unit
  def del(key: String): Unit
  def size: Int
}

final class InMemoryStore extends KeyValueStore {
  private val m = new ConcurrentHashMap[String, String]()
  override def get(key: String): Option[String] = Option(m.get(key))
  override def put(key: String, value: String): Unit = m.put(key, value)
  override def del(key: String): Unit = m.remove(key)
  override def size: Int = m.size
}
