package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native codegen'd polynomial rolling hash over a string's
  * characters: `acc = (acc * mult + codepoint + add) % modulus`,
  * accumulator starting at 0.
  *
  * This is the character fold every signature operator shares
  * (MinHash/SimHash word hashes in `graft.ops.Dedup`, document
  * fingerprints in `graft.ops.TextAnalysis`, frame checksums in
  * `graft.ops.Multimodal`). The higher-order-function form —
  * `aggregate(transform(split(s, ''), ...))` — allocates a one-char
  * string per character and runs the lambda interpreted; this
  * expression is one fused whole-stage-codegen loop. The fold order
  * and modular arithmetic are identical to the HOF form and to the
  * DuckDB oracle's `list_reduce`, so results are bit-identical.
  *
  * `mult`/`add`/`modulus` must keep `modulus * mult + 0xFFFF + add`
  * inside Long — the moduli used here are < 2^32 with mult ≤ 37.
  */
case class FoldHash(child: Expression, mult: Long, add: Long, modulus: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fold_hash requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "fold_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * mult + s.charAt(i) + add) % modulus
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |java.lang.String $s = $in.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * ${mult}L + $s.charAt($i) + ${add}L) % ${modulus}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FoldHash =
    copy(child = newChild)
}

object FoldHash {
  /** Builder for function registration: the three parameters must be
    * foldable integer literals.
    */
  def fromExprs(exprs: Seq[Expression]): FoldHash = {
    require(exprs.length == 4,
      "fold_hash(str, mult, add, modulus) takes exactly 4 arguments")
    def litVal(e: Expression): Long = {
      require(e.foldable, s"fold_hash parameter must be a literal, got $e")
      e.eval().asInstanceOf[Number].longValue()
    }
    FoldHash(exprs.head, litVal(exprs(1)), litVal(exprs(2)), litVal(exprs(3)))
  }
}
