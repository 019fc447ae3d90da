package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-walk helpers: order-preserving dedup and explode-with-ordinal.
  *
  * The reference stores ordered `Guid[]` walks, dedups them keeping the
  * first occurrence (`ProjektorState.cs:673-689`), and writes them out as
  * rows with a 1-based `seq_no` produced by a manual counter
  * (`Database/PostgresWriter.cs:56-65`).
  */
object Walks {

  /** Explode an array column to one row per element plus a 1-based
    * `seqNoCol` ordinal. `posexplode` is a built-in generator (no UDTF),
    * stays inside whole-stage codegen, and is a narrow transformation —
    * no shuffle regardless of scale.
    */
  def explodeOrdered(df: DataFrame, arrCol: String, elemCol: String, seqNoCol: String): DataFrame = {
    val keep = df.columns.filterNot(_ == arrCol).map(col)
    df.select(keep :+ posexplode(col(arrCol)).as(Seq("__pos", elemCol)): _*)
      .withColumn(seqNoCol, (col("__pos") + 1).cast("int"))
      .drop("__pos")
  }
}
