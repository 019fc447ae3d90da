package graft.sinks

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** Test double applying the exact statement shapes [[MergeSink]] renders
  * (a recording/applying fake, not a SQL engine — the [[FakeDb]] pattern
  * for the lakehouse dialect): `MERGE INTO ... USING (VALUES ...)`,
  * `DELETE ... WHERE k IN (...)`, multi-row `INSERT INTO ... VALUES`.
  */
object FakeLake {

  final class Table(val cols: Seq[String], val keyCol: String) {
    // delete-key value -> rows (one for MERGE-able tables, many for rel_*)
    val rows = mutable.LinkedHashMap[Any, mutable.Buffer[Seq[Any]]]()
  }

  val tables = TrieMap[String, Table]()
  val sqlLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def reset(): Unit = { tables.clear(); sqlLog.clear() }

  def contents(qualified: String): Set[Map[String, Any]] =
    tables.get(qualified).map(t =>
      t.rows.values.flatten.map(r => t.cols.zip(r).toMap).toSet).getOrElse(Set.empty)

  // ---- literal / tuple parsing (our own rendered dialect only) ----

  private def parseLit(tok: String): Any = tok.trim match {
    case "NULL" => null
    case "TRUE" => java.lang.Boolean.TRUE
    case "FALSE" => java.lang.Boolean.FALSE
    case s if s.startsWith("'") && s.endsWith("'") =>
      s.substring(1, s.length - 1).replace("''", "'")
    case n => java.lang.Long.valueOf(n.toLong)
  }

  /** Split on commas at paren depth 0 outside single-quoted strings. */
  private def splitTop(s: String): Seq[String] = {
    val out = mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) {
        cur += c
        if (c == '\'') {
          // '' escape stays inside the string
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') { cur += '\''; i += 1 }
          else inStr = false
        }
      } else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case other => cur += other
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim)
  }

  private def parseTuple(s: String): Seq[Any] = {
    val body = s.trim.stripPrefix("(").stripSuffix(")")
    splitTop(body).map(parseLit)
  }

  // ---- statement application ----

  private val mergeRe =
    """(?s)MERGE INTO (\S+) AS t\nUSING \(VALUES (.*)\) AS s \(__op, ([^)]*)\)\nON t\.(\S+) = s\.\S+\n.*""".r
  private val deleteRe = """(?s)DELETE FROM (\S+) WHERE (\S+) IN \((.*)\)""".r
  private val insertRe = """(?s)INSERT INTO (\S+) \(([^)]*)\) VALUES (.*)""".r

  def execute(sql: String): Unit = synchronized {
    sqlLog.add(sql)
    sql match {
      case mergeRe(qualified, values, colList, keyCol) =>
        val cols = colList.split(",").map(_.trim).toSeq
        val t = tables.getOrElseUpdate(qualified, new Table(cols, keyCol))
        val keyIdx = cols.indexOf(keyCol)
        splitTop(values).foreach { tup =>
          val vals = parseTuple(tup)
          val (op, row) = (vals.head, vals.tail)
          op match {
            case "D" => t.rows.remove(row(keyIdx)); ()
            case "U" => t.rows(row(keyIdx)) = mutable.Buffer(row)
            case other => sys.error(s"FakeLake: bad __op $other")
          }
        }
      case deleteRe(qualified, keyCol, keys) =>
        tables.get(qualified).foreach { t =>
          require(t.keyCol == keyCol, s"FakeLake: delete key $keyCol != ${t.keyCol}")
          splitTop(keys).map(parseLit).foreach(k => t.rows.remove(k))
        }
      case insertRe(qualified, colList, values) =>
        val cols = colList.split(",").map(_.trim).toSeq
        // list-valued path: key = the table's leading PK column
        val keyCol = JdbcSink.pk(qualified.split("\\.").last).head
        val t = tables.getOrElseUpdate(qualified, new Table(cols, keyCol))
        val keyIdx = cols.indexOf(t.keyCol)
        splitTop(values).foreach { tup =>
          val row = parseTuple(tup)
          t.rows.getOrElseUpdate(row(keyIdx), mutable.Buffer()) += row
        }
      case other => sys.error(s"FakeLake: unsupported statement: $other")
    }
  }
}
