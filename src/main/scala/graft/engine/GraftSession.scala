package graft.engine

import org.apache.spark.sql.DataFrame

/** Per-connection session state, split from the shared catalog the
  * way the reference creates one `Execution` per client connection
  * (`/root/reference/src/core/execution.rs:84-113`,
  * `src/main.rs:88-99`): each session owns its current schema and its
  * prepared-statement cache, while schemas/tables/data live in the
  * shared [[GraftEngine]].
  *
  * Read statements (SELECT/EXPLAIN/SHOW/…) from different sessions
  * run concurrently under the engine's read lock; DDL/DML serialize
  * exclusively under its write lock (the reference holds one global
  * context mutex for everything, `execution.rs` →
  * `Arc<Mutex<GlobalContext>>` — the mutation-window semantics are
  * preserved, the read serialization is not). On top of that, each
  * statement's result DataFrame executes via Spark's distributed
  * runtime entirely outside engine locks.
  */
class GraftSession private[engine] (val engine: GraftEngine) {

  /** Connection id — the `Id` column of SHOW PROCESSLIST and the
    * KILL target (MySQL thread id semantics). Assigned once, never
    * reused within an engine. */
  val id: Long = engine.nextSessionId()

  /** KILL CONNECTION flag: a killed session rejects every further
    * statement with error 1317 (query interrupted). Deviation note:
    * the kill takes effect at the next STATEMENT boundary — an
    * in-flight Spark job is not interrupted mid-stage (the reference
    * has no KILL at all; this is the compat surface pools and
    * `mysqladmin` need). */
  @volatile private[engine] var killed: Boolean = false
  def isKilled: Boolean = killed

  // PROCESSLIST bookkeeping: current/most recent statement + state
  @volatile private[engine] var busy: Boolean = false
  @volatile private[engine] var lastInfo: String = null
  @volatile private[engine] var stateSince: Long = System.currentTimeMillis
  engine.register(this)

  /** Deregister from the engine's PROCESSLIST registry. Idempotent;
    * the wire layer calls this when a connection ends. A session that
    * is never closed simply keeps its PROCESSLIST row (matching a
    * leaked connection in MySQL). */
  def close(): Unit = engine.deregister(this)

  /** Session default schema — USE / error 1046 scope. */
  @volatile var currentSchema: Option[String] = None

  private var preparedSeq = 0
  private[engine] val prepared =
    scala.collection.mutable.Map[Int, (String, Int)]()

  /** Open-transaction undo log: table → data version BEFORE this
    * transaction's first mutation of it. `None` = autocommit (every
    * statement commits, the reference's only mode —
    * `/root/reference/src/core/execution.rs:1265-1267` treats
    * BEGIN/COMMIT/ROLLBACK as accepted no-ops). A `BEGIN` here opens
    * a real transaction instead: ROLLBACK rewinds every mutated
    * version-store table to its logged pre-transaction version
    * through the RESTORE machinery (a documented deviation — the
    * engine improves on the reference's silent no-op). Guarded by
    * the engine statement locks: only the session's own statement
    * thread touches it, under [[GraftEngine.sqlAs]]. */
  private[engine] var txn: Option[
    scala.collection.mutable.LinkedHashMap[(String, String), Long]] = None

  /** Info-schema tables whose persisted image is stale because a
    * mutation inside this session's open transaction deferred its
    * catalog write ([[GraftEngine]] writeVersion) — flushed as ONE
    * write when the transaction ends. Same locking discipline as
    * [[txn]]. */
  private[engine] var pendingInfo: Set[String] = Set.empty

  /** Execute one SQL statement in this session. */
  def sql(statement: String): GraftResult = engine.sqlAs(this, statement)

  /** Run and return the DataFrame of a result set. */
  def query(statement: String): DataFrame = sql(statement) match {
    case ResultSet(df) => df
    case AffectedRows(n) =>
      throw Errors.generic(s"statement returned count $n, not rows")
  }

  // prepared statements (COM_STMT_PREPARE/EXECUTE/CLOSE shape,
  // execution.rs:790-880) — cache is per-session, like the
  // reference's per-connection StmtContext
  def prepare(statement: String): Int = synchronized {
    preparedSeq += 1
    prepared(preparedSeq) = (statement, SqlText.countParams(statement))
    preparedSeq
  }

  def executePrepared(id: Int, params: Seq[Any]): GraftResult = {
    val (stmtSql, n) = synchronized {
      prepared.getOrElse(id,
        throw Errors.generic(s"unknown prepared statement $id"))
    }
    if (params.length != n)
      throw Errors.generic(s"prepared statement $id expects $n parameters")
    sql(SqlText.substituteParams(stmtSql, params))
  }

  def closePrepared(id: Int): Unit = synchronized { prepared.remove(id) }

  /** COM_RESET_CONNECTION semantics: return the session to its
    * post-handshake state without reconnecting — roll back any open
    * transaction, drop every prepared statement, clear the current
    * schema. Connection-pool clients (e.g. a JDBC pool recycling
    * connections) send this between logical users; the shared
    * catalog is untouched. */
  def resetConnection(): Unit = {
    if (txn.isDefined) sql("rollback")
    synchronized {
      prepared.clear()
    }
    currentSchema = None
  }
}
