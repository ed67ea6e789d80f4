package graft

import org.apache.spark.sql.functions._

/** Property tests for the oracle-less operators (SURVEY.md §5.3):
  * MinHash-LSH recall against exact Jaccard on a constructed near-dup
  * corpus, approx_count_distinct error bounds, and dedup idempotence.
  */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus with KNOWN near-dups: base docs plus copies that
    * change one token in ~40 — shingle Jaccard ≈ 0.85–0.95, above the
    * 0.8 confirm threshold.
    */
  private lazy val nearDupCorpus = {
    val vocab = (0 until 200).map(i => s"w$i")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).flatMap { b =>
      val base = Seq.fill(60)(vocab(rnd.nextInt(vocab.size)))
      val mutated = base.updated(rnd.nextInt(base.size), "zz")
      Seq((b * 2L, base.mkString(" "), "en", "srcA", 1L),
        (b * 2L + 1, mutated.mkString(" "), "en", "srcA", 1L))
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("minhash-LSH confirms the planted near-dup pairs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash").toString
    nearDupCorpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.queries("q_dedup_fuzzy_minhash")(spark, dir).collect()
    val confirmed = out.map(r =>
      r.getAs[Long]("n_confirmed")).sum
    // 60 planted pairs at shingle-J ≈ 0.9: LSH recall 1-(1-0.9^8)^4 ≈ 0.91
    // and signature-confirm (agree ≥ 26/32 at p=0.9) ≈ 0.93 → expect
    // roughly 0.85·60 ≈ 51 confirmed; assert a safe floor.
    assert(confirmed >= 40, s"only $confirmed of 60 planted pairs confirmed")
    out.foreach { r =>
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_confirmed"))
    }
  }

  test("simhash flags reordered-copy near-dups and not unrelated docs") {
    // same token SET, different order → identical 64-bit signature
    // (hamming 0); docs over a disjoint vocabulary land far apart
    val rnd = new scala.util.Random(11)
    val va = (0 until 150).map(i => s"a$i")
    val rows = (0 until 40).flatMap { b =>
      val base = rnd.shuffle(va).take(40)
      Seq((b * 2L, base.mkString(" "), "en", "srcA", 1L),
        (b * 2L + 1, rnd.shuffle(base).mkString(" "), "en", "srcA", 1L))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_simhash").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Registry.queries("q_dedup_simhash")(spark, dir).collect()
    val confirmed = out.map(_.getAs[Long]("n_dup_pairs")).sum
    // all 40 reordered-copy pairs have hamming 0 → found via bands
    assert(confirmed >= 40, s"only $confirmed of 40 planted pairs flagged")
    out.foreach { r =>
      assert(r.getAs[Long]("n_candidates") >= r.getAs[Long]("n_dup_pairs"))
    }
  }

  test("dedup is idempotent: re-running exact dedup changes nothing") {
    val q = Registry.queries("q_dedup_exact")
    val once = q(spark, sfDir).collect()
    val twice = q(spark, sfDir).collect()
    assert(once.sameElements(twice))
    // survivors never exceed docs
    once.foreach { r =>
      assert(r.getAs[Long]("n_survivors") <= r.getAs[Long]("n_docs"))
    }
  }

  test("approx_count_distinct is within rsd bounds of exact") {
    val l = Tables.lineitem(spark, sfDir)
    val exact = l.agg(countDistinct(col("l_orderkey"))).head.getLong(0)
    val approx = l.agg(approx_count_distinct(col("l_orderkey"))).head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.1, s"approx=$approx exact=$exact err=$err")
  }
}
