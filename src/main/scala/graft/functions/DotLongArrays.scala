package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd dot product of two BIGINT arrays (SURVEY.md §7.3's
  * "promote to a Catalyst Expression on bench evidence" path).
  *
  * The portable formulation — `aggregate(zip_with(a, b, _*_), 0, _+_)` —
  * allocates a zipped array and walks interpreted higher-order lambdas
  * per element; this expression compiles to a tight primitive loop inside
  * whole-stage codegen (`doGenCode`), with an identical interpreted
  * `nullSafeEval` fallback. Summation order is ascending index in both
  * paths, so results are bit-identical to the HOF formulation (the
  * operands are 1e-6-quantized vectors — VecOps — whose products are far
  * below overflow).
  */
case class DotLongArrays(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // declared as Seq[DataType] (covariant with the private[sql]
  // AbstractDataType the trait names)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLongArrays =
    copy(left = newLeft, right = newRight)
}

object DotLongArrays {
  def of(a: Column, b: Column): Column =
    Bridge.column(DotLongArrays(Bridge.expression(a), Bridge.expression(b)))
}
