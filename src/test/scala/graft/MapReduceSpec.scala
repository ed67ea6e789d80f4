package graft

import graft.mr.MapReduce
import org.apache.spark.sql.functions._

/** The MR veneer must reproduce the canonical jobs' results exactly —
  * wordcount through map/shuffle/reduce equals the DataFrame wordcount
  * query, and the combiner path is associative-safe under partitioning.
  */
class MapReduceSpec extends SparkSpec {
  import spark.implicits._

  test("wordcount via the MapReduce API equals the DataFrame query") {
    val docs = Tables.documents(spark, sfDir).select("text").as[String]
    val viaMr = MapReduce.run(docs)(
      text => text.split(' ').iterator.map(w => (w, 1L)))(_ + _)
      .collect().toMap
    val viaDf = Registry.queries("q_text_wordcount")(spark, sfDir)
      .select(col("word"), col("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaMr == viaDf)
  }

  test("reduce result is partitioning-independent (combiner correctness)") {
    val pairs = (1 to 1000).map(i => (s"k${i % 7}", i.toLong)).toDS()
    val r1 = MapReduce.reduce(pairs.repartition(1))(_ + _).collect().toMap
    val r32 = MapReduce.reduce(pairs.repartition(32))(_ + _).collect().toMap
    assert(r1 == r32)
    assert(r1("k0") == (1 to 1000).filter(_ % 7 == 0).map(_.toLong).sum)
  }
}
