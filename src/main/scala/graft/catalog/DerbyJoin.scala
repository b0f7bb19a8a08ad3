package graft.catalog

import java.sql.SQLException

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.jdbc.{JdbcDialects, JdbcDialect, JdbcType}
import org.apache.spark.sql.types.{DataType, MetadataBuilder}

/** Derby speaks standard SQL-92 join syntax; the stock `DerbyDialect`
  * simply never declares it (`supportsJoin` is false, so the DSv2
  * join-pushdown rule skips every Derby scan). This dialect is the
  * public-extension-point fix: it REPLACES the stock dialect JVM-wide
  * for every `jdbc:derby:` URL (two matching dialects would merge into
  * an AggregatedDialect that reports supportsJoin=false — see
  * canHandle), answers `supportsJoin = true` — which stays inert for
  * every reader that doesn't opt in with `pushDownJoin=true` — and
  * forwards every Derby-specific behavior
  * (type mappings, limit clause, error classification) to the stock
  * dialect instance obtained through the public `JdbcDialects.get` —
  * the built-in class itself is `private[jdbc]` in source.
  *
  * Registered via `JdbcDialects.registerDialect` (prepends, so it wins
  * for matching URLs); the capability only activates for readers that
  * opt in with `pushDownJoin=true` AND sessions with
  * `spark.sql.optimizer.datasourceV2JoinPushdown=true`.
  *
  * Reference tie-in: the reference federates compute around shared
  * metadata (metastore-import.tf:112-117); join pushdown is the 100 TB
  * form of that federation — the remote engine evaluates the join and
  * ships the RESULT over the wire, never either input table.
  */
class DerbyJoinDialect(stock: JdbcDialect) extends JdbcDialect {

  // full Derby coverage: two matching dialects would be merged into an
  // AggregatedDialect, which reports supportsJoin=false regardless of
  // its parts — so this dialect REPLACES the stock one (unregistered in
  // ensureRegistered) rather than shadowing it
  override def canHandle(url: String): Boolean =
    url.startsWith("jdbc:derby:")

  override def supportsJoin: Boolean = true

  // Derby-specific behaviors, forwarded to the stock dialect
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    stock.getCatalystType(sqlType, typeName, size, md)
  override def getJDBCType(dt: DataType): Option[JdbcType] =
    stock.getJDBCType(dt)
  override def isSupportedFunction(funcName: String): Boolean =
    stock.isSupportedFunction(funcName)
  override def isCascadingTruncateTable(): Option[Boolean] =
    stock.isCascadingTruncateTable()
  override def isObjectNotFoundException(e: SQLException): Boolean =
    stock.isObjectNotFoundException(e)
  override def isSyntaxErrorBestEffort(e: SQLException): Boolean =
    stock.isSyntaxErrorBestEffort(e)
  override def renameTable(oldTable: Identifier, newTable: Identifier): String =
    stock.renameTable(oldTable, newTable)
  override def getTableCommentQuery(table: String, comment: String): String =
    stock.getTableCommentQuery(table, comment)
  override def getUpdateColumnNullabilityQuery(tableName: String,
      columnName: String, isNullable: Boolean): String =
    stock.getUpdateColumnNullabilityQuery(tableName, columnName, isNullable)
  override def getLimitClause(limit: Integer): String =
    stock.getLimitClause(limit)
  // classifyException deliberately NOT forwarded: its refined return
  // type (`Throwable with SparkThrowable`) is unnameable from a
  // delegating override; the base classification only affects error
  // message shape, not behavior.
}

object DerbyJoinDialect {
  @volatile private var registered = false
  /** Idempotent JVM-global registration (the dialect registry is
    * process-wide, like the catalog-plugin cache). */
  def ensureRegistered(): Unit = synchronized {
    if (!registered) {
      val stock = JdbcDialects.get("jdbc:derby:")
      JdbcDialects.unregisterDialect(stock)
      JdbcDialects.registerDialect(new DerbyJoinDialect(stock))
      registered = true
    }
  }
}
