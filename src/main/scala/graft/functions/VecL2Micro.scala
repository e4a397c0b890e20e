package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared-L2 distance over two `array<bigint>`
  * columns of micro-quantized vectors.
  *
  * The k-means Lloyd step (`graft.ops.Curation.kmeansStep`) evaluates
  * one distance per (vector, centroid) pair — the dominant cost of
  * every clustering pass at corpus scale. The HOF form
  * (`aggregate(zip_with(...))`) runs interpreted with boxed lambdas
  * per element; this expression fuses into whole-stage codegen as a
  * single primitive loop, the same ~10x per-pair win measured for
  * [[VectorDot]]. Integer accumulation is associative, so the result
  * is exactly the HOF fold and the DuckDB oracle's list_sum — and the
  * null semantics match the fold too: a length mismatch or a null
  * element yields NULL (never a silently-truncated sum). When both
  * input types carry `containsNull=false` the per-element null check
  * is compiled out, keeping the hot loop branch-free.
  */
case class VecL2Micro(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  /** Compile-time: can either array hold null elements? */
  private def elemNullable: Boolean = Seq(left, right).exists {
    _.dataType match { case ArrayType(_, n) => n; case _ => true }
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_l2sq requires array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_l2sq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val nullCheck =
        if (elemNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Micro =
    copy(left = newLeft, right = newRight)
}
