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

/** Executor-side access seam: streaming sink bodies must not `collect()` the
  * micro-batch to the driver (at 100 TB CDC volume a hot batch would funnel
  * through one JVM). Instead each partition obtains a client from this
  * serializable factory — on a cluster an implementation returns a pooled
  * connection opened executor-side (reference semantics to match:
  * queue/cdc.go:188-196 — per-record DEL, at-least-once, idempotent).
  */
trait StoreClientFactory extends Serializable {
  /** Called once per non-empty partition, executor-side. Implementations
    * should return a pooled/cached client, not open a connection per call.
    */
  def client(): KeyValueStore
}

/** Single-JVM factory: resolves the store through a JVM-wide registry, which
  * in local[n] (where "executors" share the driver JVM) IS the store the
  * test registered. Only the string id is serialized. A cluster deployment
  * swaps in a remote-client factory; the pipeline code is unchanged.
  */
final case class SharedStoreFactory(id: String) extends StoreClientFactory {
  def client(): KeyValueStore = SharedStores.lookup(id)
}

object SharedStores {
  private val stores = new ConcurrentHashMap[String, KeyValueStore]()
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  /** Registration is deduplicated by store identity, so the convenience
    * overloads that call this per pipeline construction don't accumulate
    * registry entries that pin stores for the JVM lifetime — re-registering
    * the same store returns the same factory. The registry stays O(distinct
    * stores), which is what the single-JVM deployment actually has.
    */
  def register(store: KeyValueStore): StoreClientFactory = synchronized {
    val it = stores.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue eq store) return SharedStoreFactory(e.getKey)
    }
    val id = "store-" + ids.incrementAndGet()
    stores.put(id, store)
    SharedStoreFactory(id)
  }

  private[store] def lookup(id: String): KeyValueStore = {
    val s = stores.get(id)
    require(s != null,
      s"SharedStores: no store '$id' in this JVM — in cluster mode use a remote-client StoreClientFactory")
    s
  }
}
