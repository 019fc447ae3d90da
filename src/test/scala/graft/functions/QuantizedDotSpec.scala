package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Edge-case pins for the native quantized-dot expression (the ANN/dedup
  * kernel): length mismatch, negatives (floor, not truncation), empties,
  * and null arrays. The DataFrame path exercises doGenCode (test sessions
  * run whole-stage codegen); the oracle suite pins the exact semantics
  * against DuckDB at scale.
  */
class QuantizedDotSpec extends SparkTestBase {
  import spark.implicits._

  private def dot(a: Seq[Float], b: Seq[Float]): java.lang.Long = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(graft.pipeline.Vectors.quantizedDot(col("a"), col("b")).as("d"))
    val r = df.head()
    if (r.isNullAt(0)) null else Long.box(r.getLong(0))
  }

  test("floor quantization, including negatives (floor(-0.0015*1000) = -2)") {
    assert(dot(Seq(1.0f), Seq(1.0f)) === 1000L * 1000L)
    assert(dot(Seq(-0.0015f), Seq(1.0f)) === -2L * 1000L)
    assert(dot(Seq(0.5f, 2.0f), Seq(0.5f, 0.25f)) === 500L * 500L + 2000L * 250L)
  }

  test("length mismatch sums over the shorter prefix; empty arrays give 0") {
    assert(dot(Seq(1.0f, 1.0f, 9.0f), Seq(1.0f, 1.0f)) === 2L * 1000L * 1000L)
    assert(dot(Seq.empty, Seq(1.0f)) === 0L)
  }

  test("null array input yields null (binary null-safe contract)") {
    val df = Seq((Some(Seq(1.0f)), Option.empty[Seq[Float]])).toDF("a", "b")
      .select(graft.pipeline.Vectors.quantizedDot(col("a"), col("b")).as("d"))
    assert(df.head().isNullAt(0))
  }
}
