package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd form of the ANN kernels' quantized dot product:
  * Σ floor(aᵢ·1000)·floor(bᵢ·1000) as BIGINT over two float arrays —
  * the exact integer similarity every dedup/ANN query compares and the
  * DuckDB oracle recomputes ([[graft.pipeline.Vectors.quantizedDot]]).
  *
  * Versus the Scala UDF it replaces: `doGenCode` emits the loop directly
  * over Tungsten `ArrayData` inside whole-stage codegen — no
  * ArrayData→Seq[Float] conversion (one allocation + per-element boxing
  * per row), no codegen fence around the kernel, and the surrounding
  * filter/project stays in one generated function. Preference order per
  * the build contract: built-in functions (`zip_with`/`aggregate`
  * lambdas run interpreted per element — measured ~100× slower on
  * 64-dim vectors) < Scala UDF < THIS.
  *
  * Element nulls are not expected (embeddings are dense float arrays);
  * a null slot reads as 0.0 — the same result the quantization maps an
  * absent component to.
  */
case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<FLOAT> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += math.floor(x.getFloat(i).toDouble * 1000.0).toLong *
        math.floor(y.getFloat(i).toDouble * 1000.0).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) java.lang.Math.floor(((double) $a.getFloat($i)) * 1000.0)) *
         |    ((long) java.lang.Math.floor(((double) $b.getFloat($i)) * 1000.0));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotExpr =
    copy(left = newLeft, right = newRight)
}

object QuantizedDotExpr {
  def quantizedDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(QuantizedDotExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
