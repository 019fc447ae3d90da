package graft.functions

import graft.pipeline.{Dedup, Text, Vectors}
import org.apache.spark.sql.SparkSession

/** SQL-surface registration: exposes the engine's custom functions to
  * `spark.sql` users (the API-completeness counterpart of the Column API).
  *
  * `hop_subtract` binds the native Catalyst expression (analyzer-level
  * registration via the session FunctionRegistry); the pipeline kernels
  * register as named UDFs.
  */
object Functions {

  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hop_subtract",
      exprs => HopSubtractExpr(exprs(0), exprs(1), exprs(2)),
      "built-in")

    // r10: native expression (was a Seq-boxing UDF) — same SQL name, now
    // codegen'd like its Column-API form (Vectors.quantizedDot)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quantized_dot",
      exprs => QuantizedDotExpr(exprs(0), exprs(1)),
      "built-in")

    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hamming_dist",
      exprs => HammingDistExpr(exprs(0), exprs(1)),
      "built-in")

    spark.udf.register("graft_token_count",
      (s: String) => if (s == null || s.trim.isEmpty) 0 else s.trim.split("\\s+").length)
  }

  /** Column aliases re-exported for library users. */
  def hop_subtract(walk: org.apache.spark.sql.Column, hops: org.apache.spark.sql.Column) =
    HopSubtractExpr.hopSubtract(walk, hops)
  def token_count(text: org.apache.spark.sql.Column) = Text.tokenCount(text)
  def quality_score(text: org.apache.spark.sql.Column) = Text.qualityScore(text)
  def lang_id(text: org.apache.spark.sql.Column) = Text.langId(text)
  def doc_fingerprint(text: org.apache.spark.sql.Column) = Text.fingerprint(text)
  def minhash_signature(shingles: org.apache.spark.sql.Column, k: Int) = Dedup.minhashSignature(shingles, k)
  def simhash(shingles: org.apache.spark.sql.Column) = Dedup.simhash(shingles)
  def jaccard(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = Dedup.jaccard(a, b)
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = Vectors.cosine(a, b)
}
