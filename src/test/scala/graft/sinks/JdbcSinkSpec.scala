package graft.sinks

import graft.SparkTestBase
import graft.projector.{Derivations, EventLog, LogGen}
import graft.streaming.{Incremental, StateStore}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.Files
import scala.util.Random

/** The JDBC write path, executed end-to-end (VERDICT r2 #2): DDL
  * bootstrap, then the incremental catch-up drives batched
  * `DELETE`/`INSERT ... ON CONFLICT DO UPDATE` DML through real
  * `java.sql.Connection`s (the [[FakeDb]] proxies) as its
  * [[Incremental.Sink]]. The database contents must converge to the batch
  * backfill on every table, and re-delivering a batch (at-least-once
  * streaming) must be a no-op — the reference's sink contract
  * (`PostgresWriter.cs:72-112`, `RelationalDatabaseProjection.cs:444-452`).
  */
class JdbcSinkSpec extends SparkTestBase {

  private val envelopeSchema = StructType.fromDDL("seq BIGINT, event_type STRING, payload STRING")

  private def toDf(rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, envelopeSchema)
  }

  private def oracleContents(df: DataFrame): Set[Map[String, Any]] = {
    val cols = df.columns
    df.collect().map(r => cols.map(c => c -> r.getAs[Any](c)).toMap).toSet
  }

  test("bootstrap DDL registers all 8 tables with the reference's keys") {
    FakeDb.reset()
    JdbcSink.bootstrap(FakeDb.connection(), "graft")
    assert(FakeDb.tables.keySet === JdbcSink.pk.keySet.map("graft." + _))
    JdbcSink.pk.foreach { case (t, pk) =>
      assert(FakeDb.tables(s"graft.$t").pk === pk, s"pk of $t")
    }
    // every index statement executed
    val idxCount = JdbcSink.ddl.values.map(_._2.size).sum
    import scala.jdk.CollectionConverters._
    assert(FakeDb.sqlLog.asScala.count(_.startsWith("CREATE INDEX")) === idxCount)
  }

  test("bulk truncate+load replaces stale contents with the backfill on every table") {
    FakeDb.reset()
    JdbcSink.bootstrap(FakeDb.connection(), "graft")
    // seed stale rows that a pure upsert would leave behind
    val staleSink = JdbcSink.jdbcSink(() => FakeDb.connection(), "graft")
    staleSink("work_task", spark.emptyDataFrame.select(),
      spark.createDataFrame(Seq(("stale-id", "W-0", "closed")))
        .toDF("id", "number", "status"))
    assert(FakeDb.contents("graft.work_task").nonEmpty)

    val events = LogGen.scenario(new Random(17))
    val rows = events.zipWithIndex.map { case (e, i) => Row((i + 1).toLong, e.typ, e.payload) }
    val tables = Derivations.deriveAll(EventLog.decode(toDf(rows)).cache())
    JdbcSink.bulkLoad(() => FakeDb.connection(), "graft", tables, batchSize = 7)
    tables.foreach { case (table, expected) =>
      assert(FakeDb.contents(s"graft.$table") === oracleContents(expected),
        s"table $table diverged after bulk load")
    }
    // the stale pre-load row is gone (truncate ran before the load)
    assert(!FakeDb.contents("graft.work_task").exists(_("id") == "stale-id"))

    // partition retry (Spark re-running an insert task whose first attempt
    // already committed — no re-truncate, no delete): every re-inserted
    // key EXISTS, so this is the path that actually exercises the
    // ON CONFLICT branch — a plain INSERT would raise a PK violation on
    // every row. Contents must not change.
    val sink = JdbcSink.jdbcSink(() => FakeDb.connection(), "graft", batchSize = 7)
    val conflictsBefore = FakeDb.conflictCount.get()
    tables.foreach { case (name, df) =>
      sink(name, df.select(df.columns.head).limit(0), df) // upserts only, no deletes
      assert(FakeDb.contents(s"graft.$name") === oracleContents(df),
        s"table $name diverged after simulated partition retry")
    }
    assert(FakeDb.conflictCount.get() > conflictsBefore,
      "retry never exercised the upsert conflict path")
  }

  test("incremental catch-up through the JDBC sink converges to the backfill; replay is idempotent") {
    FakeDb.reset()
    JdbcSink.bootstrap(FakeDb.connection(), "graft")
    val sink = JdbcSink.jdbcSink(() => FakeDb.connection(), "graft", batchSize = 7)

    val events = LogGen.scenario(new Random(33))
    val rows = events.zipWithIndex.map { case (e, i) => Row((i + 1).toLong, e.typ, e.payload) }
    val n = rows.length
    val chunks = Seq(rows.slice(0, n / 3), rows.slice(n / 3, 2 * n / 3), rows.slice(2 * n / 3, n))

    val stateDir = Files.createTempDirectory("graft-jdbc").toFile.getPath
    val store = new StateStore(spark, stateDir, nBuckets = 16)
    chunks.foreach(c => Incremental.step(store, EventLog.decode(toDf(c)), sink))

    val oracle = Derivations.deriveAll(EventLog.decode(toDf(rows)).cache())
    oracle.foreach { case (table, expected) =>
      assert(FakeDb.contents(s"graft.$table") === oracleContents(expected),
        s"table $table diverged in the JDBC sink")
    }
    // DML actually went through the batched prepared-statement path
    assert(FakeDb.addBatchCount.get() > 0)
    assert(FakeDb.executeBatchCount.get() > 0)

    // at-least-once redelivery: re-apply the LAST chunk (state merge and
    // sink DML both re-run) — contents must be unchanged. Note: the
    // incremental sink deletes touched keys BEFORE inserting, so its
    // idempotence never depends on ON CONFLICT (the bulk-load retry test
    // above covers that branch); pin that design fact here.
    Incremental.step(store, EventLog.decode(toDf(chunks.last)), sink)
    oracle.foreach { case (table, expected) =>
      assert(FakeDb.contents(s"graft.$table") === oracleContents(expected),
        s"table $table not idempotent under batch replay")
    }
  }
}
