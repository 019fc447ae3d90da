package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd k-means ASSIGNMENT kernel: argmin over a literal
  * centroid block of exact-integer squared L2 distance, tie → smaller
  * centroid id, returned as the packed key `dist_q * k + cid` (the
  * [[graft.pipeline.Vectors.kmeansQuantized]] contract — packing happens
  * once on the WINNER, with the same overflow fail-fast the closure UDF
  * carried, so intermediate candidates can never overflow).
  *
  * This closes VERDICT r14 #3: the seeding path was de-UDF'd in r14 via
  * [[LongSqDistExpr]], but the Lloyd assignment — which scans ALL n rows
  * once per iteration — still ran an interpreted per-row closure that
  * fenced whole-stage codegen on the hottest scan in the operator and
  * copied every vector out of Tungsten memory. Here the centroid block
  * and id list ride as plan literals (k is bounded by the operator's
  * size gates), the row vector is read in place, and the whole argmin
  * stays inside the generated loop — zero per-row allocation.
  *
  * `k` is the PACK MODULUS (the operator's configured k), passed
  * separately from the block because a Lloyd round can empty a cluster:
  * the block then has fewer than k rows but the packing arithmetic must
  * stay `dist_q * k + cid` for the downstream pmod/div unpack.
  *
  * Mismatched lengths compare over the common prefix and element nulls
  * read as 0, matching [[LongSqDistExpr]] and the closure it replaces.
  */
case class KMeansAssignExpr(first: Expression, second: Expression,
    third: Expression, k: Long) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = first.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val blockOk = second.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    val cidOk = third.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (vecOk && blockOk && cidOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<ARRAY<BIGINT>>, ARRAY<BIGINT>), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "kmeans_assign"

  override protected def nullSafeEval(v: Any, blk: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val block = blk.asInstanceOf[ArrayData]
    val cids = cs.asInstanceOf[ArrayData]
    var bestD = Long.MaxValue
    var bestCid = 0L
    val nc = block.numElements()
    var c = 0
    while (c < nc) {
      val cv = block.getArray(c)
      val cid = cids.getLong(c)
      val n = math.min(vec.numElements(), cv.numElements())
      var d = 0L
      var i = 0
      while (i < n) {
        val t = vec.getLong(i) - cv.getLong(i)
        d += t * t
        i += 1
      }
      if (d < bestD || (d == bestD && cid < bestCid)) { bestD = d; bestCid = cid }
      c += 1
    }
    require(bestD <= (Long.MaxValue - bestCid) / k,
      s"kmeans packed key overflow: dist_q=$bestD k=$k — exact-integer contract unrepresentable")
    bestD * k + bestCid
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, blk, cs) => {
      val nc = ctx.freshName("nc")
      val c = ctx.freshName("c")
      val cv = ctx.freshName("cv")
      val cid = ctx.freshName("cid")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      val bestCid = ctx.freshName("bestCid")
      s"""
         |long $bestD = Long.MAX_VALUE;
         |long $bestCid = 0L;
         |int $nc = $blk.numElements();
         |for (int $c = 0; $c < $nc; $c++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $blk.getArray($c);
         |  long $cid = $cs.getLong($c);
         |  int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $t = $v.getLong($i) - $cv.getLong($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD || ($d == $bestD && $cid < $bestCid)) {
         |    $bestD = $d;
         |    $bestCid = $cid;
         |  }
         |}
         |if ($bestD > (Long.MAX_VALUE - $bestCid) / ${k}L) {
         |  throw new IllegalArgumentException(
         |    "kmeans packed key overflow: dist_q=" + $bestD + " k=" + ${k}L +
         |    " — exact-integer contract unrepresentable");
         |}
         |${ev.value} = $bestD * ${k}L + $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): KMeansAssignExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object KMeansAssignExpr {
  /** Packed `dist_q * k + cid` of the nearest centroid (tie → smaller
    * cid). `block` and `cids` should be literal columns (`array(lit(...))`)
    * so the centroid table rides in the plan, not a closure. */
  def assign(vec: Column, block: Column, cids: Column, k: Long): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(KMeansAssignExpr(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(block),
      GraftColumnBridge.expression(cids), k))
  }
}
