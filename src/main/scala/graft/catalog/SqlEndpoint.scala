package graft.catalog

import org.apache.spark.sql.SparkSession

/** SQL-over-the-wire: an in-process HiveServer2-protocol endpoint
  * (Spark's own Thrift JDBC/ODBC server, `HiveThriftServer2
  * .startWithContext`) plus a real `hive-jdbc` client connection — the
  * reference provisions exactly this service surface next to the
  * metastore (yc-data-proc-metadata-import metastore-import.tf:196,:245
  * provision Spark SQL serving; clusters expose the SQL endpoint to BI
  * tools the same way). The round-trip is the full wire path:
  * JDBC DriverManager → Thrift socket → SparkSQLOperationManager →
  * Catalyst execution → row marshalling back through the protocol.
  *
  * One server per JVM (the server registers itself with the shared
  * SparkContext's UI/state and its listening socket lives for the JVM):
  * [[ensureStarted]] memoizes (port, server) and every caller reuses
  * the socket — repeated Verify/Bench invocations pay one bind.
  *
  * Catalog visibility: each JDBC connection gets its OWN Spark session
  * (the server's default isolation), so queries go against PERSISTENT
  * catalog objects (shared `externalCatalog`), never session temp
  * views. Keys using the endpoint therefore register external tables,
  * exactly like the DDL group does.
  */
object SqlEndpoint {

  @volatile private var started: Option[Int] = None

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  /** Start (once) the Thrift JDBC server on a free port; returns the
    * bound port. Retries on a fresh port if the bind race is lost. */
  def ensureStarted(spark: SparkSession): Int = synchronized {
    started.getOrElse {
      val port = Iterator.continually(freePort()).take(3)
        .find(p => tryStart(spark, p))
        .getOrElse(sys.error("thrift SQL endpoint failed to bind (3 ports)"))
      started = Some(port)
      port
    }
  }

  private def tryStart(spark: SparkSession, port: Int): Boolean = {
    // the server builds its HiveConf from the session's newHadoopConf,
    // which overlays every session-conf entry — so the port (and NONE
    // auth, NOSASL to keep the handshake dependency-free) are plain
    // runtime conf sets, no hive-site.xml needed
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.authentication", "NOSASL")
    try {
      org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
        .startWithContext(spark.sqlContext)
      // wait for the listening socket (server starts async)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var up = false
      while (!up && System.nanoTime() < deadline) {
        try { new java.net.Socket("localhost", port).close(); up = true }
        catch { case _: java.io.IOException => Thread.sleep(200) }
      }
      up
    } catch {
      case e: Exception =>
        System.err.println(s"[sql-endpoint] bind on $port failed: $e")
        false
    }
  }

  /** Execute `sql` over a real JDBC connection to the endpoint and
    * return the rows as (column names, string-rendered cells) — the
    * shape a wire client sees. */
  def jdbcQuery(port: Int, sql: String): (Seq[String], Seq[Seq[String]]) = {
    Class.forName("org.apache.hive.jdbc.HiveDriver")
    val conn = java.sql.DriverManager.getConnection(
      s"jdbc:hive2://localhost:$port/default;auth=noSasl", "graft", "")
    try {
      val rs = conn.createStatement().executeQuery(sql)
      val md = rs.getMetaData
      val cols = (1 to md.getColumnCount).map(md.getColumnName)
      val rows = Iterator.continually(rs)
        .takeWhile(_.next())
        .map(r => (1 to md.getColumnCount).map(i =>
          Option(r.getObject(i)).map(_.toString).getOrElse(null)).toSeq)
        .toSeq
      (cols, rows)
    } finally conn.close()
  }
}
