package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared L2 distance over two ARRAY<BIGINT> —
  * Σ (aᵢ − bᵢ)² as BIGINT — the exact-integer distance kernel of the
  * quantized k-means ([[graft.pipeline.Vectors.kmeansQuantized]]).
  *
  * Sibling of [[QuantizedDotExpr]] but over ALREADY-QUANTIZED long
  * vectors: the k-means++ seeding scan keeps its points quantized once
  * up front, and the per-round min-distance update must run inside
  * whole-stage codegen rather than the interpreted per-row closure UDF
  * it replaces (VERDICT r13 #3 — the UDF fenced codegen across k−1
  * full scans on exactly the above-the-gate path where the scan cost
  * matters). The right operand in that use is a LITERAL centroid, so
  * the generated loop reads one Tungsten array against a constant.
  *
  * Element nulls are not expected (quantized vectors are dense); a null
  * slot reads as 0 — the value quantization maps an absent component
  * to. Mismatched lengths compare over the common prefix, matching the
  * driver-side seeding kernel and [[QuantizedDotExpr]].
  */
case class LongSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_sq_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val t = x.getLong(i) - y.getLong(i)
      s += t * t
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $t = $a.getLong($i) - $b.getLong($i);
         |  $s += $t * $t;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongSqDistExpr =
    copy(left = newLeft, right = newRight)
}

object LongSqDistExpr {
  def sqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(LongSqDistExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
