package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd squared L2 distance of two BIGINT arrays — the
  * second promoted expression after [[DotLongArrays]], for the OTHER
  * hot inner loop of the vector family: k-means assignment, IVF cell
  * probing and PQ codebook training all spell
  * `aggregate(zip_with(a, b, (p, q) -> (p - q) * (p - q)), 0L, _+_)`.
  *
  * Semantics are EXACTLY the HOF spelling's (the soundness bar
  * `RewriteHofSqDist` needs): ascending-index summation; NULL on a null
  * array, a null element, or a length mismatch (zip_with null-pads the
  * shorter side and the null square poisons the sum). `failOnError`
  * mirrors the lambdas' EvalMode — ANSI raises on int64 overflow via
  * subtractExact/multiplyExact/addExact, LEGACY wraps like Java
  * arithmetic.
  */
case class SumSqDiffLongArrays(left: Expression, right: Expression,
    failOnError: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (failOnError) {
        val d = Math.subtractExact(x.getLong(i), y.getLong(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
      } else {
        val d = x.getLong(i) - y.getLong(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dv = ctx.freshName("d")
      val step =
        if (failOnError)
          s"""long $dv = java.lang.Math.subtractExact($a.getLong($i), $b.getLong($i));
             |${ev.value} = java.lang.Math.addExact(${ev.value},
             |  java.lang.Math.multiplyExact($dv, $dv));""".stripMargin
        else
          s"""long $dv = $a.getLong($i) - $b.getLong($i);
             |${ev.value} += $dv * $dv;""".stripMargin
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0L;
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $step
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SumSqDiffLongArrays =
    copy(left = newLeft, right = newRight)
}

object SumSqDiffLongArrays {
  def of(a: Column, b: Column): Column =
    Bridge.column(SumSqDiffLongArrays(Bridge.expression(a), Bridge.expression(b)))
}
