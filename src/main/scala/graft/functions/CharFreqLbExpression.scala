package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd CHARACTER-FREQUENCY lower bound on edit distance:
  * ⌈L1(counts(a), counts(b)) / 2⌉ over 38 byte buckets (a–z, 0–9, space,
  * other) — the classic cheap pre-filter for threshold-k Levenshtein
  * joins (r16, VERDICT r15 #7). Every single edit changes the character
  * multiset by at most L1 mass 2 (substitution: one count down, one up;
  * insert/delete: one count by 1), so `lb(a, b) ≤ levenshtein(a, b)`
  * always, and `lb > k` proves the banded DP would return −1 without
  * running its O(|s|·k) loop. Bucketing bytes into 38 classes only ever
  * LOWERS the L1 (merged buckets cancel differences), so the bound stays
  * valid for any byte input; it is tight-enough exactly on the
  * normalized ASCII `[a-z0-9 ]` prefix keys the editdist contract
  * compares (measured at sf0.1: 620 988 blocked pairs → 167 473 survive
  * lb ≤ 20 — 73% of the DP calls skipped).
  *
  * Byte-level counting equals char-level counting on ASCII inputs (the
  * pk contract strips everything else before truncation). A non-ASCII
  * byte lands in the shared "other" bucket, which can only weaken the
  * bound, never invalidate the filter.
  *
  * Same preference-order rationale as [[HammingDistExpr]]: this runs
  * once per blocked candidate pair (~620k at sf0.1) — `doGenCode` keeps
  * the two count loops inside whole-stage codegen reading the Tungsten
  * UTF8String bytes in place; a UDF would pay per-row boxing and fence
  * codegen around the join.
  */
case class CharFreqLbExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two STRING inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "char_freq_lb"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val cnt = new Array[Int](38)
    var i = 0
    val nx = x.numBytes()
    while (i < nx) { cnt(CharFreqLbExpr.bucket(x.getByte(i))) += 1; i += 1 }
    i = 0
    val ny = y.numBytes()
    while (i < ny) { cnt(CharFreqLbExpr.bucket(y.getByte(i))) -= 1; i += 1 }
    var l1 = 0L
    i = 0
    while (i < 38) { l1 += math.abs(cnt(i)); i += 1 }
    (l1 + 1L) / 2L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val l1 = ctx.freshName("l1")
      val cls = classOf[CharFreqLbExpr].getName
      s"""
         |int[] $cnt = new int[38];
         |int ${i}n = $a.numBytes();
         |for (int $i = 0; $i < ${i}n; $i++) {
         |  $cnt[$cls.bucket($a.getByte($i))]++;
         |}
         |int ${i}m = $b.numBytes();
         |for (int $i = 0; $i < ${i}m; $i++) {
         |  $cnt[$cls.bucket($b.getByte($i))]--;
         |}
         |long $l1 = 0L;
         |for (int $i = 0; $i < 38; $i++) {
         |  $l1 += java.lang.Math.abs($cnt[$i]);
         |}
         |${ev.value} = ($l1 + 1L) / 2L;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharFreqLbExpr =
    copy(left = newLeft, right = newRight)
}

object CharFreqLbExpr {
  /** Byte → bucket id: a–z → 0..25, 0–9 → 26..35, space → 36, other → 37.
    * Called from generated code — must stay public + static-like. */
  def bucket(b: Byte): Int =
    if (b >= 'a' && b <= 'z') b - 'a'
    else if (b >= '0' && b <= '9') 26 + (b - '0')
    else if (b == ' ') 36
    else 37

  def charFreqLb(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(CharFreqLbExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
