package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd Hamming distance between two bit-packed codes:
  * Σ popcount(aᵢ XOR bᵢ) as BIGINT over two ARRAY<BIGINT> word arrays —
  * the retrieval kernel of binary (sign-quantized) embeddings, where one
  * 64-dim vector collapses to a single long and distance is one XOR +
  * one POPCNT instruction per word
  * ([[graft.pipeline.Vectors.binaryCodes]] builds the codes).
  *
  * Unlike the dot/jaccard siblings' min-length convention, a MISSING
  * word reads as 0L: the codes are zero-padded to ⌈dims/64⌉ words, so
  * distance to a shorter code is the distance to its zero-extension —
  * Hamming over ragged inputs must count the longer side's set bits,
  * not silently ignore them. Equal-length inputs (the only shape the
  * packer emits) never take that branch.
  *
  * Preference order per the build contract: `zip_with`/`aggregate`
  * lambdas run interpreted per element and fence codegen (the measured
  * ~100× of QuantizedDotExpr's scaladoc applies unchanged — this is the
  * n×|queries| hot path); a Scala UDF pays ArrayData→Array copies per
  * row. `doGenCode` keeps the XOR/POPCNT loop inside whole-stage
  * codegen reading both Tungsten arrays in place.
  */
case class HammingDistExpr(left: Expression, right: Expression)
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
  override def prettyName: String = "hamming_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    val n = math.max(nx, ny)
    var s = 0L
    var i = 0
    while (i < n) {
      val xi = if (i < nx) x.getLong(i) else 0L
      val yi = if (i < ny) y.getLong(i) else 0L
      s += java.lang.Long.bitCount(xi ^ yi)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.max($nx, $ny);
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long xi = $i < $nx ? $a.getLong($i) : 0L;
         |  long yi = $i < $ny ? $b.getLong($i) : 0L;
         |  $s += java.lang.Long.bitCount(xi ^ yi);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistExpr =
    copy(left = newLeft, right = newRight)
}

object HammingDistExpr {
  def hammingDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(HammingDistExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
