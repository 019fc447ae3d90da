package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key as pure Column arithmetic — the data-layout
  * clustering primitive. Interleaving the low `bits` of two dimensions
  * gives a 1-D sort key whose total order preserves 2-D locality, so
  * `repartitionByRange(z) + sortWithinPartitions(z)` yields files whose
  * (x, y) bounding boxes are small: a scan filtered on EITHER dimension
  * prunes most files via parquet min/max stats, not just the leading
  * sort column of a lexicographic layout.
  *
  * Built entirely from shift/mask/or built-ins (no UDF): whole-stage
  * codegen fuses the 2×`bits` terms into straight-line JVM code, and the
  * identical expression is expressible in any SQL dialect with bitwise
  * operators ([[zOrderSql]] emits the DuckDB/ANSI text the correctness
  * oracle runs).
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions) into a single long. Inputs are masked to `bits`, so any
    * long-typed column is safe. */
  def zOrder(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xs = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ys = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The same interleave as SQL text over column expressions `x` and `y`
    * (already masked by the caller or maskable here) — used to build the
    * DuckDB oracle for z-order contract queries. */
  def zOrderSql(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val xs = s"(($x) & $mask)"
    val ys = s"(($y) & $mask)"
    (0 until bits).flatMap { i =>
      Seq(s"((($xs >> $i) & 1) << ${2 * i})",
        s"((($ys >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")
  }
}
