package graft

import graft.functions.DotLongArrays
import org.apache.spark.sql.functions._

/** The native codegen'd dot product must be bit-identical to the
  * portable HOF formulation on real vectors, nulls, and length skew.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)

  test("DotLongArrays == aggregate/zip_with on quantized embeddings") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 1000000, 0).cast("long")).as("v"))
    val diff = emb
      .select(DotLongArrays.of(col("v"), col("v")).as("native"),
        hofDot("v", "v").as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("DotLongArrays handles nulls and unequal lengths") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),   // 32
      (Seq(1L, 2L), Seq(10L, 10L, 99L)))     // min-length: 30
      .toDF("a", "b")
    val vals = df.select(DotLongArrays.of(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(vals == Seq(32L, 30L))
    val withNull = df.select(
      DotLongArrays.of(lit(null).cast("array<bigint>"), col("b")))
      .collect().map(_.isNullAt(0)).toSeq
    assert(withNull == Seq(true, true))
  }
}
