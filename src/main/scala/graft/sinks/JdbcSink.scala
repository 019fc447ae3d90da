package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

/** Relational sink: DDL bootstrap + bulk overwrite + CDC upsert SQL for
  * the 8 output tables, mirroring the reference's two write modes
  * (`RelationalDatabaseProjection.cs:460-495` bulk COPY;
  * `Database/PostgresWriter.cs` per-row DML) in Spark-idiomatic form.
  *
  * Spark's JDBC writer cannot create composite primary keys or secondary
  * indexes, so DDL stays explicit strings executed over a raw connection
  * (SURVEY.md §2.2). Bulk mode = `df.write.jdbc` with truncate-overwrite;
  * incremental mode = `foreachBatch` partitions writing batched
  * `INSERT ... ON CONFLICT (pk) DO UPDATE` / `DELETE` statements —
  * connection-per-partition, batched, idempotent (safe to replay a batch).
  *
  * No database is available in this environment; the SQL builders are
  * exercised by unit tests and the parquet path stands in for integration.
  */
object JdbcSink {

  /** DDL per table: (create table, secondary index statements) —
    * column types per SURVEY.md §1.4 (uuid→varchar for portability). */
  val ddl: Map[String, (String, Seq[String])] = Map(
    "rel_interest_to_route_element" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.rel_interest_to_route_element (
        |  interest_id varchar(36) NOT NULL,
        |  route_network_element_id varchar(36) NOT NULL,
        |  seq_no integer NOT NULL,
        |  PRIMARY KEY (interest_id, route_network_element_id, seq_no))""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_rel_interest_route ON {schema}.rel_interest_to_route_element (route_network_element_id)",
        "CREATE INDEX IF NOT EXISTS ix_rel_interest_id ON {schema}.rel_interest_to_route_element (interest_id)")),
    "rel_fiber_cable_to_route_element" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.rel_fiber_cable_to_route_element (
        |  fiber_cable_id varchar(36) NOT NULL,
        |  route_network_element_id varchar(36) NOT NULL,
        |  seq_no integer NOT NULL,
        |  PRIMARY KEY (fiber_cable_id, route_network_element_id, seq_no))""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_rel_cable_route ON {schema}.rel_fiber_cable_to_route_element (route_network_element_id)",
        "CREATE INDEX IF NOT EXISTS ix_rel_cable_id ON {schema}.rel_fiber_cable_to_route_element (fiber_cable_id)")),
    "node_container" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.node_container (
        |  id varchar(36) PRIMARY KEY,
        |  route_node_id varchar(36),
        |  spec_name varchar(255),
        |  spec_category varchar(255))""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_node_container_route ON {schema}.node_container (route_node_id)")),
    "span_equipment" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.span_equipment (
        |  id varchar(36) PRIMARY KEY,
        |  interest_id varchar(36),
        |  outer_diameter integer,
        |  is_cable boolean,
        |  name varchar(255),
        |  spec_name varchar(255),
        |  access_address_id varchar(36),
        |  unit_address_id varchar(36))""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_span_equipment_interest ON {schema}.span_equipment (interest_id)")),
    "service_termination" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.service_termination (
        |  id varchar(36) PRIMARY KEY,
        |  route_node_id varchar(36),
        |  name varchar(255),
        |  access_address_id varchar(36),
        |  unit_address_id varchar(36))""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_service_termination_route ON {schema}.service_termination (route_node_id)")),
    "conduit_slack" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.conduit_slack (
        |  id varchar(36) PRIMARY KEY,
        |  route_node_id varchar(36),
        |  number_of_ends integer)""".stripMargin,
      Seq("CREATE INDEX IF NOT EXISTS ix_conduit_slack_route ON {schema}.conduit_slack (route_node_id)")),
    "work_task" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.work_task (
        |  id varchar(36) PRIMARY KEY,
        |  number varchar(255),
        |  status varchar(255))""".stripMargin,
      Seq.empty),
    "installation" -> (
      """CREATE TABLE IF NOT EXISTS {schema}.installation (
        |  id varchar(36) PRIMARY KEY,
        |  installation_id varchar(255),
        |  unit_address_id varchar(36),
        |  status varchar(255),
        |  location_remark varchar(5000))""".stripMargin,
      Seq.empty))

  /** Primary-key columns per table (for upsert conflict targets). */
  val pk: Map[String, Seq[String]] = Map(
    "rel_interest_to_route_element" -> Seq("interest_id", "route_network_element_id", "seq_no"),
    "rel_fiber_cable_to_route_element" -> Seq("fiber_cable_id", "route_network_element_id", "seq_no"),
    "node_container" -> Seq("id"),
    "span_equipment" -> Seq("id"),
    "service_termination" -> Seq("id"),
    "conduit_slack" -> Seq("id"),
    "work_task" -> Seq("id"),
    "installation" -> Seq("id"))

  def bootstrapSql(schema: String): Seq[String] =
    s"CREATE SCHEMA IF NOT EXISTS $schema" +:
      ddl.toSeq.sortBy(_._1).flatMap { case (_, (create, idx)) =>
        (create +: idx).map(_.replace("{schema}", schema))
      }

  /** `INSERT ... ON CONFLICT (pk) DO UPDATE` upsert statement with
    * positional placeholders in `cols` order. */
  def upsertSql(schema: String, table: String, cols: Seq[String]): String = {
    val keys = pk(table)
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(keys.contains)
    val conflictAction =
      if (updates.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updates.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $schema.$table (${cols.mkString(", ")}) VALUES ($placeholders) " +
      s"ON CONFLICT (${keys.mkString(", ")}) $conflictAction"
  }

  /** `DELETE ... WHERE pk = ?` (single-key tables) or delete-by-leading-key
    * (list-valued tables replace all rows of an entity,
    * `RelationalDatabaseProjection.cs:444-452`). */
  def deleteSql(schema: String, table: String): String =
    s"DELETE FROM $schema.$table WHERE ${pk(table).head} = ?"

  /** Bulk overwrite to parquet (the test/bench stand-in for the JDBC
    * truncate+COPY path): one directory per table. */
  def writeParquet(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }

  /** Bulk truncate+load over live connections — the reference's
    * end-of-dehydration write (`RelationalDatabaseProjection.cs:460-495`:
    * truncate, then stream every row of the folded state; binary COPY
    * there, batched inserts here — same contract, portable SQL). Truncate
    * runs once per table on the driver; rows stream from the executors,
    * connection-per-partition. Inserts use the upsert form, so a partial
    * retry (Spark re-running a failed partition) is idempotent. */
  def bulkLoad(connFactory: () => java.sql.Connection, schema: String,
      tables: Map[String, DataFrame], batchSize: Int = 500): Unit =
    tables.foreach { case (name, df) =>
      withConnection(connFactory) { conn =>
        val st = conn.createStatement()
        try st.execute(s"TRUNCATE TABLE $schema.$name") finally st.close()
      }
      val cols = df.columns.toSeq
      writeBatched(df, upsertSql(schema, name, cols), cols.length, connFactory, batchSize)
    }

  /** Execute the DDL bootstrap (schema + 8 tables + indexes) over a live
    * connection — the analogue of the reference's migration step
    * (`RelationalDatabaseProjection.cs:43-68`). */
  def bootstrap(conn: java.sql.Connection, schema: String): Unit = {
    val st = conn.createStatement()
    try bootstrapSql(schema).foreach(st.execute)
    finally st.close()
  }

  /** An executable incremental sink: for each output-table merge, DELETE
    * every row of the touched keys then batched `INSERT ... ON CONFLICT DO
    * UPDATE` the replacements — the reference's per-row DML + list-replace
    * pattern (`PostgresWriter.cs:72-112`,
    * `RelationalDatabaseProjection.cs:444-452`).
    *
    * Execution shape (designed for a 1000-executor cluster, exercised on
    * local mode): `connFactory` is a serializable thunk; every partition
    * opens its own connection, runs one transaction of batched statements
    * (`batchSize` rows per round trip), commits, closes. The two phases are
    * separate Spark actions, so all deletes complete before any insert
    * starts — a key's delete can never race its reinsert. Replaying the
    * same (deletedKeys, upserts) pair is idempotent: the delete is
    * key-scoped and the insert upserts.
    *
    * Returns a function matching [[graft.streaming.Incremental.Sink]].
    */
  def jdbcSink(connFactory: () => java.sql.Connection, schema: String,
      batchSize: Int = 500): (String, DataFrame, DataFrame) => Unit = {
    (table, deletedKeys, upserts) => {
      writeBatched(deletedKeys, deleteSql(schema, table), 1, connFactory, batchSize)
      val cols = upserts.columns.toSeq
      writeBatched(upserts, upsertSql(schema, table, cols), cols.length, connFactory, batchSize)
    }
  }

  /** Stream a frame's rows into one parameterized statement: per
    * partition, one connection, one transaction, `batchSize` rows per
    * round trip; the first `nCols` columns bind positionally. */
  private def writeBatched(df: DataFrame, sql: String, nCols: Int,
      connFactory: () => java.sql.Connection, batchSize: Int): Unit =
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) withConnection(connFactory) { conn =>
        val ps = conn.prepareStatement(sql)
        try {
          var n = 0
          rows.foreach { r =>
            var i = 0
            while (i < nCols) { ps.setObject(i + 1, r.get(i)); i += 1 }
            ps.addBatch(); n += 1
            if (n % batchSize == 0) { ps.executeBatch(); () }
          }
          ps.executeBatch()
        } finally ps.close()
      }
      ()
    }

  private def withConnection[A](connFactory: () => java.sql.Connection)
      (f: java.sql.Connection => A): A = {
    val conn = connFactory()
    try {
      conn.setAutoCommit(false)
      val out = f(conn)
      conn.commit()
      out
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case _: Throwable => () }
        throw e
    } finally conn.close()
  }
}
