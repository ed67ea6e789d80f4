package graft

import graft.functions.Tokenize
import org.apache.spark.sql.functions._

/** The custom Catalyst Generator must equal posexplode(split(…, ' '))
  * by definition (SURVEY.md §2.14), including null and empty inputs.
  */
class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  test("Tokenize == posexplode(split) on fixture text") {
    val docs = Tables.documents(spark, sfDir).limit(100)
    val viaGen = docs
      .select(col("doc_id"), Tokenize.of(col("text")).as(Seq("pos", "token")))
      .collect().toSet
    val viaBuiltin = docs
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .collect().toSet
    assert(viaGen == viaBuiltin)
  }

  test("Tokenize handles null, empty, and single-token input") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val rows = df.select(col("id"), Tokenize.of(col("text")).as(Seq("pos", "token")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // null text generates nothing; empty text generates one empty token
    // (split semantics); single token at pos 0
    assert(rows == Set((1L, 0, "solo"), (2L, 0, "")))
  }

  test("Tokenize keeps trailing and consecutive empty tokens (split limit -1)") {
    // ADVICE r3: Java split with limit 0 drops trailing empties — 'a '
    // must yield 2 rows and '  ' must yield 3, exactly like
    // posexplode(split(text, ' '))
    val df = Seq((1L, "a "), (2L, "  "), (3L, "a  b")).toDF("id", "text")
    val viaGen = df
      .select(col("id"), Tokenize.of(col("text")).as(Seq("pos", "token")))
      .collect().toSet
    val viaBuiltin = df
      .select(col("id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .collect().toSet
    assert(viaGen == viaBuiltin)
    assert(viaGen.count(_.getLong(0) == 1L) == 2)
    assert(viaGen.count(_.getLong(0) == 2L) == 3)
  }

  test("CSV and JSON sources read (declared capability, SURVEY.md §2.2)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_src").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
    df.write.mode("overwrite").json(s"$dir/json")
    val csv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv")
    val json = spark.read.json(s"$dir/json")
    assert(csv.count() == 2 && json.count() == 2)
    assert(csv.columns.sorted.sameElements(Array("k", "v")))
  }
}
