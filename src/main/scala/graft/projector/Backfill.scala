package graft.projector

import graft.sinks.JdbcSink
import org.apache.spark.sql.SparkSession

/** EP1 — cold start / full backfill (SURVEY.md §3): replay the whole event
  * log in one batch job and overwrite all 8 tables. The Spark analogue of
  * the reference's dehydrate + truncate + binary-COPY phase
  * (`Worker.cs:32`, `RelationalDatabaseProjection.cs:460-495`).
  *
  * Usage: runMain graft.projector.Backfill <eventsParquet> <outDir>
  */
object Backfill {

  /** Full-log derivation + overwrite of all 8 tables; returns the high-
    * water `seq` the incremental catch-up should start from. Shared folded
    * subtrees (span state/enriched, spec dims) are cached once across the
    * 8 table writes ([[Derivations.deriveAllCached]]). */
  def run(spark: SparkSession, eventsPath: String, outDir: String): Long = {
    val ev = EventLog.decode(spark.read.parquet(eventsPath)).cache()
    val (tables, release) = Derivations.deriveAllCached(ev)
    try {
      JdbcSink.writeParquet(tables, outDir)
      ev.agg(org.apache.spark.sql.functions.max("seq")).head().getLong(0)
    } finally {
      release()
      ev.unpersist()
      ()
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(eventsPath, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-backfill")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val highWater = run(spark, eventsPath, outDir)
    println(s"""{"backfill":"done","high_water":$highWater,"out":"$outDir"}""")
    spark.stop()
  }
}
