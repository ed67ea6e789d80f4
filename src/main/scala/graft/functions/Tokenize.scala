package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (SURVEY.md §2.14 `q_udtf_tokenize`): one
  * output row per whitespace token with its 0-based position. Semantics
  * are pinned to `posexplode(split(text, ' '))`.
  *
  * This is the table-function extension path (b→c in the custom-operator
  * preference order): a real `Generator` expression participates in the
  * `Generate` physical operator — fully distributed, no driver collect,
  * one pass per partition — unlike a collect-and-loop UDTF emulation.
  * `CodegenFallback` is acceptable here: `GenerateExec` does not fuse
  * generators into whole-stage codegen for lateral output anyway.
  */
case class Tokenize(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("token", StringType, nullable = true)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // limit -1 keeps trailing empty tokens — split(' ') (limit 0)
      // would drop them, diverging from posexplode(split(text, ' '))
      // on any text with trailing spaces (ADVICE r3)
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      toks.indices.map(i => InternalRow(i, UTF8String.fromString(toks(i))))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {
  /** Column-API entry: `df.select(col("id"), Tokenize.of(col("text")))`. */
  def of(c: Column): Column =
    Bridge.column(Tokenize(Bridge.expression(c)))
}
