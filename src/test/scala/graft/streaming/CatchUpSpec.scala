package graft.streaming

import graft.SparkTestBase
import graft.projector.{Derivations, EventLog, LogGen}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, Row}

import java.nio.file.Files
import scala.util.Random

/** Full-scope replay-equivalence for the incremental catch-up: folding an
  * event log in 3 micro-batch steps through the affected-key re-derivation
  * + store merge must produce exactly the 8 tables of the one-shot batch
  * backfill (SURVEY.md §5.5).
  */
class CatchUpSpec extends SparkTestBase {

  private val envelopeSchema = StructType.fromDDL("seq BIGINT, event_type STRING, payload STRING")

  private def toDf(rows: Seq[Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, envelopeSchema)
  }

  private def normalized(df: DataFrame): Set[String] =
    df.collect().map { r =>
      df.columns.sorted.map(c => s"$c=${r.getAs[Any](c)}").mkString("|")
    }.toSet

  test("3-step incremental catch-up equals one-shot backfill on all 8 tables") {
    val events = LogGen.scenario(new Random(21))
    val rows = events.zipWithIndex.map { case (e, i) => Row((i + 1).toLong, e.typ, e.payload) }
    val n = rows.length
    val chunks = Seq(rows.slice(0, n / 3), rows.slice(n / 3, 2 * n / 3), rows.slice(2 * n / 3, n))

    val stateDir = Files.createTempDirectory("graft-catchup").toFile.getPath

    var cumulative: Seq[Row] = Seq.empty
    chunks.foreach { chunk =>
      cumulative = cumulative ++ chunk
      val fullLog = EventLog.decode(toDf(cumulative)).cache()
      val batchDecoded = EventLog.decode(toDf(chunk))
      CatchUp.mergeIntoStore(spark, stateDir, CatchUp.incrementalStep(fullLog, batchDecoded))
      fullLog.unpersist()
    }

    val oracle = Derivations.deriveAll(EventLog.decode(toDf(rows)).cache())
    oracle.foreach { case (table, expected) =>
      val got = spark.read.parquet(s"$stateDir/$table")
      assert(normalized(got) === normalized(expected), s"table $table diverged")
    }
  }
}
