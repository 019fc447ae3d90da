package graft.functions

import graft.ops.HopSubtract
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression form of the hop-subtraction walk scan
  * (`ProjektorState.cs:178-221`, see [[graft.ops.HopSubtract]] for the
  * semantics contract).
  *
  * Versus the Scala UDF: operates directly on Tungsten `ArrayData` /
  * `UTF8String` — no Row→Scala `Seq[String]` conversion, no string
  * decoding, null-safety expressed through the expression contract, and
  * registrable as a SQL function (`hop_subtract(walk, from, to)`).
  * `CodegenFallback` keeps surrounding operators inside whole-stage
  * codegen while this node evaluates via `eval` (the scan is branchy
  * enough that generated-source inlining buys little; upgrade to
  * `doGenCode` only if profiling demands).
  *
  * Null semantics (matching the reference): null walk → null; null/empty
  * hop arrays → walk verbatim.
  */
case class HopSubtractExpr(walk: Expression, fromNodes: Expression, toNodes: Expression)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = walk
  override def second: Expression = fromNodes
  override def third: Expression = toNodes

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val w = walk.eval(input)
    if (w == null) return null
    val wArr = w.asInstanceOf[ArrayData]
    val f = fromNodes.eval(input)
    val t = toNodes.eval(input)
    // pass-through paths must COPY: returning the input ArrayData (often an
    // UnsafeArrayData view over the row buffer) aliases memory that buffering
    // operators may overwrite before consuming the result
    if (f == null || t == null) return wArr.copy()
    val fArr = f.asInstanceOf[ArrayData]
    val tArr = t.asInstanceOf[ArrayData]
    val nHops = fArr.numElements()
    if (nHops == 0) return wArr.copy()

    val n = wArr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var hopIdx = 0
    var i = 0
    while (i < n) {
      val el = wArr.getUTF8String(i)
      val hopFrom = if (hopIdx < nHops) fArr.getUTF8String(hopIdx) else null
      if (hopFrom != null && hopFrom.equals(el)) {
        val toNode = tArr.getUTF8String(hopIdx)
        hopIdx += 1
        var search = i + 1
        var found = false
        while (search < n && !found) {
          val s = wArr.getUTF8String(search)
          if (s != null && toNode != null && s.equals(toNode)) found = true
          else { i += 1; search += 1 }
        }
      } else {
        out.add(el)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(walk = newFirst, fromNodes = newSecond, toNodes = newThird)
}

object HopSubtractExpr {
  /** Column API over the native expression; hop structs are decomposed to
    * parallel from/to arrays (a cheap codegen'd `transform`). Spark 4's
    * Column is ColumnNode-backed; `classic.ExpressionUtils` bridges to the
    * Catalyst expression world. */
  def hopSubtract(walk: Column, hops: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    import org.apache.spark.sql.functions._
    val fromArr = transform(hops, h => h.getField("fromNodeId"))
    val toArr = transform(hops, h => h.getField("toNodeId"))
    when(hops.isNull, walk)
      .otherwise(GraftColumnBridge.column(HopSubtractExpr(
        GraftColumnBridge.expression(walk),
        GraftColumnBridge.expression(fromArr),
        GraftColumnBridge.expression(toArr))))
  }

  /** Parity helper: both implementations (UDF and native) must agree —
    * used by the property spec. */
  def udfForm(walk: Column, hops: Column): Column = HopSubtract.hopSubtract(walk, hops)
}
