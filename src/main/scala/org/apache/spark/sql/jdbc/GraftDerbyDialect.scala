package org.apache.spark.sql.jdbc

/** Derby dialect with LIMIT pushdown enabled (graft extension).
  *
  * Spark's built-in `DerbyDialect` opts out of limit pushdown
  * (`supportsLimit=false`) because Derby has no `LIMIT` keyword — but
  * Derby supports the SQL-standard `FETCH FIRST n ROWS ONLY`, which is
  * valid at exactly the position the JDBC SQL query builder splices the
  * limit clause (after WHERE / GROUP BY / ORDER BY). Subclassing keeps
  * every other Derby behavior (CLOB/VARCHAR type mapping, decimal
  * precision cap, aggregate compilation) inherited.
  *
  * Lives in `org.apache.spark.sql.jdbc` because `DerbyDialect` is
  * `private[sql]`; registered via `JdbcDialects.registerDialect`, which
  * consults registered dialects before built-ins.
  */
private[jdbc] final class GraftDerbyDialect extends DerbyDialect {
  override def supportsLimit: Boolean = true
  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
  // The generated join SQL (inline subqueries + standard JOIN … ON) is
  // plain SQL-92, which Derby executes fine — the base dialect just
  // never opted in.
  override def supportsJoin: Boolean = true
}

object GraftDerbyDialect {
  /** Idempotent enough for graft's use: callers guard with a lazy val. */
  def register(): Unit = JdbcDialects.registerDialect(new GraftDerbyDialect)
}
