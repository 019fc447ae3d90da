package graft.sinks

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, PreparedStatement, Statement}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** In-memory stand-in for a Postgres-dialect database, exposed through
  * real `java.sql.Connection`/`Statement`/`PreparedStatement` interfaces
  * (reflective proxies) so [[JdbcSink]]'s write path executes unmodified —
  * DDL, batched `INSERT ... ON CONFLICT`, batched `DELETE`, transactions.
  *
  * Understands exactly the SQL shapes [[JdbcSink]] generates (this is a
  * recording/applying fake, not a SQL engine) and applies upsert/delete
  * semantics to shared in-JVM tables — valid because the test suite runs
  * Spark in local mode, so executor tasks share this JVM. Thread-safe:
  * partitions write concurrently.
  */
object FakeDb {

  final class Table(val cols: Seq[String], val pk: Seq[String]) {
    val rows = TrieMap[Seq[Any], Seq[Any]]() // pk tuple -> full row (cols order)
  }

  val tables = TrieMap[String, Table]() // "schema.table" -> state
  val sqlLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val addBatchCount = new java.util.concurrent.atomic.AtomicLong(0)
  val executeBatchCount = new java.util.concurrent.atomic.AtomicLong(0)
  // PK-violation accounting: upserts landing on an EXISTING key took the
  // ON CONFLICT branch — a plain INSERT would have raised a PK violation
  // there, so a positive count proves the conflict path really ran
  val conflictCount = new java.util.concurrent.atomic.AtomicLong(0)

  def reset(): Unit = {
    tables.clear(); sqlLog.clear()
    addBatchCount.set(0); executeBatchCount.set(0); conflictCount.set(0)
  }

  /** Rows of a table as maps col→value (order-free comparison). */
  def contents(qualified: String): Set[Map[String, Any]] =
    tables.get(qualified).map(t =>
      t.rows.values.map(r => t.cols.zip(r).toMap).toSet).getOrElse(Set.empty)

  // --- SQL application -------------------------------------------------

  private val createTableRe =
    """(?s)CREATE TABLE IF NOT EXISTS (\S+)\.(\S+) \((.*)\)""".r
  private val compositePkRe = """(?s).*PRIMARY KEY \(([^)]*)\).*""".r
  private val insertRe =
    """INSERT INTO (\S+)\.(\S+) \(([^)]*)\) VALUES \([^)]*\) ON CONFLICT \(([^)]*)\) (DO NOTHING|DO UPDATE SET .*)""".r
  private val deleteRe = """DELETE FROM (\S+)\.(\S+) WHERE (\S+) = \?""".r
  private val truncateRe = """TRUNCATE TABLE (\S+)\.(\S+)""".r

  private def execDdl(sql: String): Unit = sql match {
    case createTableRe(schema, table, body) =>
      val lines = body.split(",\n").map(_.trim).filter(_.nonEmpty)
      val colLines = lines.filterNot(_.startsWith("PRIMARY KEY"))
      val cols = colLines.map(_.split("\\s+")(0)).toSeq
      val pk = sql match {
        case compositePkRe(pkCols) => pkCols.split(",").map(_.trim).toSeq
        case _ => colLines.filter(_.contains("PRIMARY KEY")).map(_.split("\\s+")(0)).toSeq
      }
      require(pk.nonEmpty, s"no primary key parsed from: $sql")
      tables.putIfAbsent(s"$schema.$table", new Table(cols, pk))
      ()
    case s if s.startsWith("CREATE SCHEMA") || s.startsWith("CREATE INDEX") => ()
    case truncateRe(schema, table) =>
      tables.getOrElse(s"$schema.$table", sys.error(s"no table $schema.$table")).rows.clear()
    case other => sys.error(s"FakeDb: unsupported DDL: $other")
  }

  private def applyUpsert(sql: String, params: Seq[Any]): Unit = sql match {
    case insertRe(schema, table, colList, conflictList, action) =>
      val t = tables.getOrElse(s"$schema.$table", sys.error(s"no table $schema.$table"))
      val cols = colList.split(",").map(_.trim).toSeq
      val byName = cols.zip(params).toMap
      val key = conflictList.split(",").map(_.trim).toSeq.map(byName)
      val full = t.cols.map(c => byName.getOrElse(c, null))
      if (t.rows.contains(key)) { conflictCount.incrementAndGet(); () }
      if (action == "DO NOTHING") { t.rows.putIfAbsent(key, full); () }
      else t.rows.put(key, full) // SET c = EXCLUDED.c for every non-pk col ≡ replace
      ()
    case other => sys.error(s"FakeDb: unsupported insert: $other")
  }

  private def applyDelete(sql: String, params: Seq[Any]): Unit = sql match {
    case deleteRe(schema, table, whereCol) =>
      val t = tables.getOrElse(s"$schema.$table", sys.error(s"no table $schema.$table"))
      val idx = t.cols.indexOf(whereCol)
      require(idx >= 0, s"unknown column $whereCol")
      t.rows.filterInPlace((_, row) => row(idx) != params.head)
      ()
    case other => sys.error(s"FakeDb: unsupported delete: $other")
  }

  // --- JDBC proxies ----------------------------------------------------

  def connection(): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => statement()
            case "prepareStatement" => prepared(args(0).asInstanceOf[String])
            case "setAutoCommit" | "commit" | "rollback" | "close" => null
            case "isClosed" => java.lang.Boolean.FALSE
            case "toString" => "FakeDbConnection"
            case other => sys.error(s"FakeDb Connection: unsupported $other")
          }
      }).asInstanceOf[Connection]

  private def statement(): Statement =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Statement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" =>
              val sql = args(0).asInstanceOf[String]
              sqlLog.add(sql); execDdl(sql)
              java.lang.Boolean.FALSE
            case "close" => null
            case other => sys.error(s"FakeDb Statement: unsupported $other")
          }
      }).asInstanceOf[Statement]

  private def prepared(sql: String): PreparedStatement = {
    val current = mutable.ArrayBuffer[Any]()
    val batch = mutable.ArrayBuffer[Seq[Any]]()
    sqlLog.add(sql)
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "setObject" =>
              val idx = args(0).asInstanceOf[Integer].intValue()
              while (current.size < idx) current += null
              current(idx - 1) = args(1)
              null
            case "addBatch" =>
              batch += current.toSeq; current.clear()
              addBatchCount.incrementAndGet(); null
            case "executeBatch" =>
              executeBatchCount.incrementAndGet()
              val res = batch.map { params =>
                if (sql.startsWith("INSERT")) applyUpsert(sql, params)
                else if (sql.startsWith("DELETE")) applyDelete(sql, params)
                else sys.error(s"FakeDb: unsupported batched SQL: $sql")
                1
              }.toArray
              batch.clear()
              res
            case "close" => null
            case other => sys.error(s"FakeDb PreparedStatement: unsupported $other")
          }
      }).asInstanceOf[PreparedStatement]
  }
}
