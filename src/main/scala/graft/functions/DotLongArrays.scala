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
  * `nullSafeEval` fallback.
  *
  * Semantics are EXACTLY the HOF spelling's (round 6 — required for
  * `RewriteHofDotProduct` to be a sound optimizer rewrite, not just a
  * convenience): summation is ascending-index; a NULL array, a NULL
  * element, or a LENGTH MISMATCH yields NULL (zip_with pads the shorter
  * side with nulls, the null product poisons the sum). `failOnError`
  * mirrors the lambda's EvalMode: ANSI (Spark 4's default) raises on
  * int64 overflow via Math.multiplyExact/addExact — the error class is
  * `java.lang.ArithmeticException` rather than Spark's wrapper, but the
  * query fails loudly exactly when the HOF would — while LEGACY wraps
  * like Java multiplication.
  */
case class DotLongArrays(left: Expression, right: Expression,
    failOnError: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {

  // declared as Seq[DataType] (covariant with the private[sql]
  // AbstractDataType the trait names)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  // null also on element-null / length-mismatch, not just null inputs
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
      if (failOnError)
        acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      else acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val step =
        if (failOnError)
          s"${ev.value} = java.lang.Math.addExact(${ev.value}, " +
            s"java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else s"${ev.value} += $a.getLong($i) * $b.getLong($i);"
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
      newLeft: Expression, newRight: Expression): DotLongArrays =
    copy(left = newLeft, right = newRight)
}

object DotLongArrays {
  def of(a: Column, b: Column): Column =
    Bridge.column(DotLongArrays(Bridge.expression(a), Bridge.expression(b)))
}
