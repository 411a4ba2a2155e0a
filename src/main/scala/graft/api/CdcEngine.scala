package graft.api

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.store.KeyValueStore

/** A `sinners` row (reference scripts/init.sql:3-11, models/models.go:5-13). */
case class Sinner(code: Long, name: String, `class`: String,
                  libram: Option[String], tendency: Option[String],
                  created_at: LocalDateTime, updated_at: LocalDateTime)

/** A partial update: fields absent from the request keep their DB values —
  * the reference's BodyParser-overlay-then-Save semantics (O-7,
  * controllers/controllers.go:83-92).
  */
case class SinnerPatch(name: Option[String] = None, `class`: Option[String] = None,
                       libram: Option[String] = None, tendency: Option[String] = None)

sealed trait ApiError { def status: Int }
case object BadRequest extends ApiError { val status = 400 }
case object NotFound extends ApiError { val status = 404 }

/** The reference's CRUD + cache-aside API surface (O-1..O-9), re-expressed
  * programmatically (SURVEY.md s2.2 S-7: the HTTP layer is out of engine
  * scope; the operation semantics are not).
  *
  * Source of truth is a keyed table (stands in for Postgres); every mutation
  * appends a Debezium-shaped envelope to the change log (stands in for
  * WAL->Debezium->Kafka, SURVEY.md s3.2), so the streaming pipeline is
  * testable end-to-end without external systems. The point cache is the A3
  * store, maintained cache-aside on read (S-4/S-6) and invalidated by the
  * CDC consumer (S-5).
  *
  * The `clock` is injected: `NOW()` semantics (O-6 defaults, O-9 trigger)
  * with deterministic tests.
  */
final class CdcEngine(val store: KeyValueStore,
                      // micro precision = Postgres TIMESTAMP precision, and
                      // exactly what the JSON codec and envelope carry
                      clock: () => LocalDateTime =
                        () => LocalDateTime.now().truncatedTo(java.time.temporal.ChronoUnit.MICROS)) {

  private val table = mutable.LinkedHashMap[Long, Sinner]()
  private val log = mutable.Buffer[String]()
  private var lsn: Long = 100000L
  private var consumedOffset: Int = 0 // CDC consumer position (Kafka-offset parity)

  // Micro precision: a cache hit must serve the same instant the table
  // row carries (the reference marshals time.Time at full precision).
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")

  // --- S-8: JSON codec for cache values (schema = A1 with json field names).
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""

  private[api] def toJson(s: Sinner): String = {
    def opt(v: Option[String]) = v.map(jstr).getOrElse("null")
    s"""{"code":${s.code},"name":${jstr(s.name)},"class":${jstr(s.`class`)},""" +
      s""""libram":${opt(s.libram)},"tendency":${opt(s.tendency)},""" +
      s""""created_at":"${tsFmt.format(s.created_at)}","updated_at":"${tsFmt.format(s.updated_at)}"}"""
  }

  // Cache-hit decode path: the store's values are engine-written, so a
  // permissive positional parse suffices (parity with json.Unmarshal of
  // trusted self-written values, controllers.go:58).
  private val jsonRe =
    ("""\{"code":(-?\d+),"name":"((?:[^"\\]|\\.)*)","class":"((?:[^"\\]|\\.)*)",""" +
      """"libram":(null|"(?:[^"\\]|\\.)*"),"tendency":(null|"(?:[^"\\]|\\.)*"),""" +
      """"created_at":"([^"]*)","updated_at":"([^"]*)"\}""").r

  // single-pass decoder: order-safe (a literal backslash-n survives) and
  // covers the \uXXXX forms jstr emits for control characters
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'u' if i + 6 <= s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // Total: any malformed/corrupted value (bad \uXXXX, bad timestamp, ...)
  // degrades to None = cache miss, never an exception out of a read.
  private[api] def fromJson(j: String): Option[Sinner] =
    scala.util.Try {
      j match {
        case jsonRe(code, name, clazz, libram, tendency, ca, ua) =>
          def opt(v: String) = if (v == "null") None else Some(unescape(v.drop(1).dropRight(1)))
          Some(Sinner(code.toLong, unescape(name), unescape(clazz), opt(libram), opt(tendency),
            LocalDateTime.parse(ca, tsFmt), LocalDateTime.parse(ua, tsFmt)))
        case _ => None
      }
    }.toOption.flatten

  // --- Envelope append (the WAL->Kafka stand-in; shape per queue/cdc.go:25-59).
  private def micros(t: LocalDateTime): Long =
    t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000 + t.getNano / 1000 % 1000

  private def rowJson(s: Sinner): String = {
    def opt(v: Option[String]) = v.map(jstr).getOrElse("null")
    s"""{"code":${s.code},"name":${jstr(s.name)},"class":${jstr(s.`class`)},""" +
      s""""libram":${opt(s.libram)},"tendency":${opt(s.tendency)},""" +
      s""""created_at":${micros(s.created_at)},"updated_at":${micros(s.updated_at)}}"""
  }

  private def emit(op: String, before: Option[Sinner], after: Option[Sinner]): Unit = {
    lsn += 1
    val ts = after.orElse(before).map(s => micros(s.updated_at) / 1000).getOrElse(0L)
    val b = before.map(rowJson).getOrElse("null")
    val a = after.map(rowJson).getOrElse("null")
    log += s"""{"payload":{"before":$b,"after":$a,"source":{"version":"2.7.0.Final",""" +
      s""""connector":"postgresql","name":"cdc-cascade-postgres","ts_ms":$ts,"snapshot":"false",""" +
      s""""db":"cdc-cascade-db","sequence":null,"ts_us":${ts * 1000},"ts_ns":${ts * 1000000},""" +
      s""""schema":"public","table":"sinners","txId":${lsn - 99100},"lsn":$lsn,"xmin":null},""" +
      s""""transaction":null,"op":"$op","ts_ms":$ts,"ts_us":${ts * 1000},"ts_ns":${ts * 1000000}}}"""
  }

  // --- O-6: insert; PK conflict => 400; timestamps default NOW().
  def createOne(code: Long, name: String, clazz: String,
                libram: Option[String], tendency: Option[String]): Either[ApiError, Sinner] =
    synchronized {
      if (table.contains(code)) Left(BadRequest)
      else {
        val now = clock()
        val s = Sinner(code, name, clazz, libram, tendency, now, now)
        table(code) = s
        emit("c", None, Some(s))
        Right(s)
      }
    }

  // --- O-1: full scan; empty => empty list, not error.
  def readAll(): Seq[Sinner] = synchronized(table.values.toSeq)

  /** Row-existence probe (the reference's `First` pre-check the update and
    * delete handlers issue before touching the body, controllers.go:84,:109). */
  def exists(code: Long): Boolean = synchronized(table.contains(code))

  // --- O-2 + S-6/S-4: cache-aside point read. Hit short-circuits; miss
  // reads the table and fills the cache (no TTL, parity controllers.go:68).
  def readOne(code: Long): Either[ApiError, Sinner] = {
    val key = code.toString
    store.get(key).flatMap(fromJson) match {
      case Some(s) => Right(s)
      case None =>
        // read + fill under the table lock: the fill is then ordered BEFORE
        // any subsequent update's change event, so the CDC pass that
        // consumes that event always evicts this fill — a fill racing past
        // a concurrent update can never become permanently stale
        synchronized {
          table.get(code) match {
            case None => Left(NotFound)
            case Some(s) =>
              store.put(key, toJson(s))
              Right(s)
          }
        }
    }
  }

  // --- O-7 + O-9: overlay update. Absent patch fields keep DB values;
  // updated_at stamped by the "trigger".
  def updateOne(code: Long, patch: SinnerPatch): Either[ApiError, Sinner] =
    synchronized {
      table.get(code) match {
        case None => Left(NotFound)
        case Some(old) =>
          val updated = old.copy(
            name = patch.name.getOrElse(old.name),
            `class` = patch.`class`.getOrElse(old.`class`),
            libram = patch.libram.orElse(old.libram),
            tendency = patch.tendency.orElse(old.tendency),
            updated_at = clock())
          table(code) = updated
          emit("u", Some(old), Some(updated))
          Right(updated)
      }
    }

  // --- O-8: delete by key, returns the pre-image; missing => 404.
  def deleteOne(code: Long): Either[ApiError, Sinner] =
    synchronized {
      table.remove(code) match {
        case None => Left(NotFound)
        case Some(old) =>
          emit("d", Some(old), None)
          Right(old)
      }
    }

  // --- O-4 parity: raw path-param entry points. The reference's handlers
  // take the key as a URL string and strconv.Atoi it — failure is a 400
  // BEFORE any lookup (controllers.go:51-54, :78-81, :103-106).
  private def parseKey(param: String): Either[ApiError, Long] =
    param.toLongOption.toRight(BadRequest)

  def readOneParam(param: String): Either[ApiError, Sinner] =
    parseKey(param).flatMap(readOne)

  def updateOneParam(param: String, patch: SinnerPatch): Either[ApiError, Sinner] =
    parseKey(param).flatMap(updateOne(_, patch))

  def deleteOneParam(param: String): Either[ApiError, Sinner] =
    parseKey(param).flatMap(deleteOne)

  /** The change log as a Kafka-value-shaped DataFrame (S-2 stand-in). */
  def changeRecords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized(log.toSeq).toDF("value")
  }

  private var drainOffset: Int = 0 // producer-side cursor (independent of processCdc's)

  /** Drain envelopes appended since the last drain — the producer half of
    * feeding an EXTERNAL streaming consumer (AcceptanceDemo writes these to
    * the file stream a forked `InvalidationRestartMain` lifetime reads).
    * Separate cursor from [[processCdc]]'s consumer offset: draining for an
    * external consumer must not mark records consumed for the in-process
    * one.
    */
  def drainChangeLog(): Seq[String] = synchronized {
    val slice = log.drop(drainOffset).toSeq
    drainOffset = log.length
    slice
  }

  /** Scenario-3 consumer (SURVEY.md s3.3): run the O-11..O-14 dataflow over
    * the change log SINCE THE LAST PASS and DEL each key — incremental
    * consumption from a committed offset, exactly like the reference's
    * Kafka mark/commit protocol (each pass is O(new records), and a key
    * re-cached after its last change is not spuriously re-evicted).
    * Re-running after a partial failure replays the same slice; DEL is
    * idempotent, so at-least-once holds.
    */
  def processCdc(spark: SparkSession): Long = {
    import spark.implicits._
    val (slice, upTo) = synchronized((log.drop(consumedOffset).toSeq, log.length))
    if (slice.isEmpty) { return 0L }
    val keys = graft.cdc.Envelope
      .invalidationKeys(graft.cdc.Envelope.parse(slice.toDF("value")))
      .collect()
    keys.foreach(r => store.del(r.getString(0)))
    synchronized { consumedOffset = math.max(consumedOffset, upTo) } // commit
    keys.length.toLong
  }
}
