package graft.sources

import java.sql.{Connection, DriverManager, PreparedStatement}
import org.apache.spark.sql.{DataFrame, Row}

/** JDBC write-back (closes S-1's write half: the reference persists every
  * CRUD mutation to Postgres via GORM `Create`/`Save`/`Delete`,
  * controllers/controllers.go:30,:92,:113).
  *
  * Design for a 1000-executor cluster:
  *   - All writes run `foreachPartition`: one connection per partition TASK,
  *     executor-side — never a driver-side collect-and-loop.
  *   - Statements are batched (`addBatch`/`executeBatch`, default 500) so a
  *     partition of N rows is N/500 round trips, not N.
  *   - One transaction per partition: commit after the batch loop, rollback
  *     on error, so Spark's task retry replays a whole partition — combined
  *     with keyed idempotent statements this keeps at-least-once semantics
  *     safe (O-15 parity).
  *   - Callers upserting from a shuffled source should repartition by the
  *     key columns first so a given key is written by exactly one task and
  *     last-writer-wins races between partitions cannot occur.
  *
  * The upsert is portable two-phase UPDATE-then-INSERT (works on any JDBC
  * database, including the embedded Derby used in tests). On Postgres the
  * single-statement `INSERT ... ON CONFLICT (k) DO UPDATE` is preferable —
  * pass it via `dialectUpsertSql` and every row goes through one batched
  * statement instead.
  */
object JdbcSink {

  /** Plain append (the reference's `Create`, O-6). PK violations surface as
    * BatchUpdateException — the caller's 400-on-conflict, not silently
    * swallowed.
    */
  def append(df: DataFrame, url: String, table: String,
             batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    df.foreachPartition { (rows: Iterator[Row]) =>
      withConnection(url) { conn =>
        val ps = conn.prepareStatement(insertSql)
        try flushInBatches(ps, rows, cols.length, batchSize)
        finally ps.close()
      }
    }
  }

  /** Keyed upsert (the reference's `Save`, O-7: whole-row write by PK).
    * Idempotent: replaying a partition rewrites the same rows to the same
    * values. `dialectUpsertSql`, when given, must take the full column list
    * as bind parameters in `df.columns` order (e.g. Postgres
    * `INSERT INTO t (a,b) VALUES (?,?) ON CONFLICT (a) DO UPDATE SET b=EXCLUDED.b`).
    */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             batchSize: Int = 500, dialectUpsertSql: Option[String] = None): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), s"keyCols $keyCols must be in ${cols}")
    val valCols = cols.filterNot(keyCols.contains)
    val keyIdx = keyCols.map(cols.indexOf)
    val valIdx = valCols.map(cols.indexOf)
    val updateSql =
      s"UPDATE $table SET ${valCols.map(c => s"$c = ?").mkString(", ")} " +
        s"WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"

    df.foreachPartition { (rows: Iterator[Row]) =>
      withConnection(url) { conn =>
        dialectUpsertSql match {
          case Some(sql) =>
            val ps = conn.prepareStatement(sql)
            try flushInBatches(ps, rows, cols.length, batchSize)
            finally ps.close()
          case None =>
            val upd = conn.prepareStatement(updateSql)
            val ins = conn.prepareStatement(insertSql)
            try {
              rows.grouped(batchSize).foreach { group =>
                // Phase 1: try UPDATE for the whole group in one batch.
                group.foreach { row =>
                  var i = 1
                  valIdx.foreach { c => upd.setObject(i, jdbcValue(row.get(c))); i += 1 }
                  keyIdx.foreach { c => upd.setObject(i, jdbcValue(row.get(c))); i += 1 }
                  upd.addBatch()
                }
                val updated = upd.executeBatch()
                // Phase 2: INSERT only the rows no UPDATE matched.
                val misses = group.iterator.zip(updated.iterator).collect {
                  case (row, 0) => row
                }.toSeq
                misses.foreach { row =>
                  var i = 1
                  cols.indices.foreach { c => ins.setObject(i, jdbcValue(row.get(c))); i += 1 }
                  ins.addBatch()
                }
                if (misses.nonEmpty) ins.executeBatch()
              }
            } finally { upd.close(); ins.close() }
        }
      }
    }
  }

  /** Keyed delete (the reference's `Delete`, O-8). Deleting an absent key is
    * a no-op — idempotent under replay like the cache DEL sink (S-5).
    */
  def deleteKeys(df: DataFrame, url: String, table: String, keyCols: Seq[String],
                 batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.forall(cols.contains), s"keyCols $keyCols must be in ${cols}")
    val keyIdx = keyCols.map(cols.indexOf)
    val deleteSql =
      s"DELETE FROM $table WHERE ${keyCols.map(c => s"$c = ?").mkString(" AND ")}"
    df.foreachPartition { (rows: Iterator[Row]) =>
      withConnection(url) { conn =>
        val ps = conn.prepareStatement(deleteSql)
        try {
          rows.grouped(batchSize).foreach { group =>
            group.foreach { row =>
              keyIdx.zipWithIndex.foreach { case (c, i) =>
                ps.setObject(i + 1, jdbcValue(row.get(c)))
              }
              ps.addBatch()
            }
            ps.executeBatch()
          }
        } finally ps.close()
      }
    }
  }

  /** One transaction per partition: commit on success, rollback on error so
    * a task retry re-runs a clean partition. */
  private def withConnection(url: String)(body: Connection => Unit): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      body(conn)
      conn.commit()
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: java.sql.SQLException => }
        throw e
    } finally conn.close()
  }

  private def flushInBatches(ps: PreparedStatement, rows: Iterator[Row],
                             width: Int, batchSize: Int): Unit = {
    var pending = 0
    rows.foreach { row =>
      var i = 0
      while (i < width) { ps.setObject(i + 1, jdbcValue(row.get(i))); i += 1 }
      ps.addBatch()
      pending += 1
      if (pending >= batchSize) { ps.executeBatch(); pending = 0 }
    }
    if (pending > 0) ps.executeBatch()
  }

  /** Spark external row values → JDBC-friendly objects. TimestampNTZ fields
    * surface as java.time.LocalDateTime and TimestampType as Instant; older
    * JDBC drivers (Derby) only take java.sql.Timestamp. */
  private def jdbcValue(v: Any): AnyRef = v match {
    case ldt: java.time.LocalDateTime => java.sql.Timestamp.valueOf(ldt)
    case ins: java.time.Instant       => java.sql.Timestamp.from(ins)
    case ld: java.time.LocalDate      => java.sql.Date.valueOf(ld)
    case other                        => other.asInstanceOf[AnyRef]
  }
}
