package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Pins the null-handling semantics the fold primitives rely on. */
class FoldsSpec extends SparkTestBase {

  private def df = {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row("k", 1L, "a", "create"),
      Row("k", 2L, null, "noop"),
      Row("k", 3L, "b", "update"),
      Row("k", 4L, null, "clear")).asJava
    spark.createDataFrame(rows, StructType.fromDDL("id STRING, seq BIGINT, v STRING, t STRING"))
  }

  test("lastNonNull takes the latest non-null value") {
    val r = df.groupBy(col("id")).agg(Folds.lastNonNull(col("v"), col("seq")).as("v")).head()
    assert(r.getString(1) === "b")
  }

  test("lastWhere takes the value at the latest matching row") {
    val r = df.groupBy(col("id"))
      .agg(Folds.lastWhere(col("v"), col("seq"), col("t") === "update").as("v")).head()
    assert(r.getString(1) === "b")
  }

  test("lastWhere yields null when no row matches") {
    val r = df.groupBy(col("id"))
      .agg(Folds.lastWhere(col("v"), col("seq"), col("t") === "nope").as("v")).head()
    assert(r.isNullAt(1))
  }

  test("lastEvenNull lets a later null overwrite (wholesale semantics)") {
    val r = df.groupBy(col("id"))
      .agg(Folds.lastEvenNull(col("v"), col("seq"), col("t").isin("create", "update", "clear")).as("v"))
      .head()
    assert(r.isNullAt(1), "the 'clear' row at seq=4 must null the field")
  }
}
