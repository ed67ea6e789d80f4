package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scale probe for the heaviest iterative keys (VERDICT r7 #7).
  * The 10× band (ScaleProbe) is well-trodden; 100× is where broadcast
  * label maps and driver-held model rows would first crack. Run with
  * `SPARK_DRIVER_MEM=64g sbt "runMain graft.ScaleProbe100"` (staging is
  * idempotent under /tmp/graft_sf10).
  *
  * Two probe families:
  *
  *  1. END-TO-END at 100× fixtures (60 M lineitem / 15 M orders /
  *     500 k documents / 200 k embeddings): q_graph_mst, q_ml_boost,
  *     q_vec_pca_power, q_dedup_components. Fact tables replicate
  *     sf0.1 with shifted keys (the ScaleProbe recipe); DIMENSIONS
  *     (customer/supplier/part/nation/region) stay at 1× — a real
  *     warehouse scales facts onto a fixed dimensional cardinality,
  *     and the 10× probe's duplicated dims multiply dim-join fan-out
  *     by copies² (q_graph_mst at 100× would be a 600-billion-row
  *     intermediate, a staging artifact, not a plan property).
  *     Documents are REGENERATED (deterministic md5-word text, 4%
  *     identical-text 2-cliques) instead of duplicated: key-shifted
  *     copies make every doc a 100-clique in the pair graph (~500 M
  *     edges — the duplicated-corpus caveat SQUARED, not a corpus
  *     shape), while a real 100× crawl holds the dup RATE roughly
  *     constant. The corpus-sized stages (tokenize, postings, prefix
  *     filter) still scale the full 100×.
  *
  *  2. LOOP probes at 100× LABEL scale — the part fixtures cannot
  *     reach (dbscan's core graph is supercritical under duplication,
  *     mst's label set is nation-sized): drive the SAME factored loop
  *     code on synthetic graphs — `Geo.contractedHookLabels` on a
  *     1.5 M-node chain forest (10 k components of 150) and
  *     `Pipeline.componentLabels` on a 2 M-node blocked graph — and
  *     check the exact component counts. The hook loop runs twice:
  *     broadcast maps (default) and the shuffle-hash fallback
  *     (spark.graft.broadcastLabelLimit=100000), so BOTH plans are
  *     timed at scale.
  */
object ScaleProbe100 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/graft_sf10"
    val copies = 100
    val off = 1000000000L
    if (!new java.io.File(s"$dst/_done").exists()) {
      def rep(name: String, shifts: Map[String, Boolean],
          nCopies: Int = copies): Unit = {
        if (new java.io.File(s"$dst/_done_$name").exists()) return
        val base = spark.read.parquet(s"$src/$name.parquet")
        val out = (0 until nCopies).map { i =>
          shifts.foldLeft(base) { case (df, (c, shift)) =>
            if (shift) df.withColumn(c, col(c) + lit(i * off)) else df
          }
        }.reduce(_ unionByName _)
        out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
        println(s"staged $name: ${spark.read.parquet(s"$dst/$name.parquet").count()}")
        new java.io.File(s"$dst/_done_$name").createNewFile()
      }
      rep("lineitem", Map("l_orderkey" -> true))
      rep("orders", Map("o_orderkey" -> true)) // o_custkey kept: fan-out
      // dimensions at 1×: facts fan out onto a FIXED dim cardinality
      rep("customer", Map.empty, nCopies = 1)
      rep("part", Map.empty, nCopies = 1)
      rep("supplier", Map.empty, nCopies = 1)
      rep("nation", Map.empty, nCopies = 1)
      rep("region", Map.empty, nCopies = 1)
      rep("embeddings", Map("vec_id" -> true))
      // documents: regenerated, not duplicated (see scaladoc). Text =
      // 80 deterministic md5-derived words; docs j with j%50 ∈ {0,1}
      // share one group id → identical text → an exact-Jaccard 2-clique
      // (4% of docs paired); everything else is (whp) pairless.
      val nDocs = 500000L
      if (!new java.io.File(s"$dst/_done_documents").exists())
      spark.range(nDocs).select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(50)) < 2,
            col("id") - pmod(col("id"), lit(50))).otherwise(col("id"))
            .as("gid"))
        .withColumn("text", expr(
          """concat_ws(' ', transform(sequence(0, 79),
            |  i -> substr(md5(concat(cast(gid as string), '-',
            |    cast(i as string))), 1, 8)))""".stripMargin))
        .select(col("doc_id"), col("text"),
          element_at(array(lit("en"), lit("de"), lit("fr"), lit("es"),
            lit("zh")), (pmod(col("gid"), lit(5)) + 1).cast("int"))
            .as("lang"),
          concat(lit("src"), pmod(col("gid"), lit(7))).as("source"),
          length(col("text")).cast("long").as("n_chars"))
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      println(s"staged documents: " +
        s"${spark.read.parquet(s"$dst/documents.parquet").count()}")
      new java.io.File(s"$dst/_done").createNewFile()
    }
    def timed(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"SCALE100 $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      Caches.releaseScoped(); Caches.releaseShared()
    }
    // warmup (mirrors Bench)
    spark.read.parquet(s"$dst/lineitem.parquet")
      .groupBy(col("l_returnflag")).count().count()

    // -- family 1: end-to-end at 100× fixtures ------------------------
    // (q_text_dedup_eval runs HERE, not on the key-shifted 10× corpus:
    // banding-quality eval is true-pair-driven, and only the
    // regenerated documents hold the dup RATE constant — see the
    // ScaleProbe exclusion note)
    for (q <- Seq("q_vec_pca_power", "q_graph_mst", "q_ml_boost",
        "q_dedup_components", "q_text_dedup_eval",
        "q_dedup_minhash_exact",
        // round-10 batch 111/114 corpus keys: the globalCumSum
        // selection and the exact-dup-grain window at a 500 k-doc
        // regenerated corpus (constant 4% dup rate), plus ROUGE over
        // 250 k pairs
        "q_mix_token_budget", "q_mix_dedup_weight", "q_text_rouge")
        if args.isEmpty || args.contains(q))
      timed(q)(Registry.queries(q)(spark, dst).queryExecution.toRdd.count())

    // -- family 1b: the banded similarity path at 100× embeddings
    // (VERDICT r8 next #7: the loop families were measured at 100×,
    // the banded candidate joins were not). The staged embeddings are
    // 200 k key-shifted copies — identical vectors across copies, so
    // same-band occupancy is the WORST plausible case for the bucket
    // join; the candidate rowcount printed here is the sub-quadratic
    // evidence (200 k² all-pairs would be 4·10¹⁰).
    //
    // Two measurement disciplines learned HERE (round 9):
    //  - toRdd.count(), not count(): under count() the distinct-key
    //    join-elimination rule removed q_dedup_embed's entire candidate
    //    subtree (the census LEFT JOINs the stats) and the "probe"
    //    timed a 200 k scan (3.6 s) instead of the real plan (530 s).
    //  - the shared relation is priced ONCE and kept RESIDENT while the
    //    consumers run (the Bench pass-0 shape): a session prices the
    //    index build once, then consumers pay only their own deltas.
    if (args.isEmpty || args.contains("band_candidates")) {
      def full(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.toRdd.count()
      def timedFull(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"SCALE100 $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        Caches.releaseScoped() // shared relation deliberately kept
      }
      timedFull("shared_band_candidates_200k")(
        full(ops.VecOps.bandCandidatesWithCos(spark, dst)))
      for (q <- Seq("q_dedup_embed", "q_sim_threshold_join"))
        timedFull(s"$q (shared resident)")(
          full(Registry.queries(q)(spark, dst)))
      Caches.releaseShared()
    }

    // -- family 1d: the MT-eval triple on the round-11 shared census
    // (VERDICT r10 next #7 landed): shared_mt_pairs is priced ONCE and
    // kept resident (the Bench pass-0 shape), then BLEU/ROUGE/chrF run
    // as the lang-grain rollups they now are. Family 1's standalone
    // q_text_rouge row still prices the census+rollup a single-metric
    // session pays.
    if (args.isEmpty || args.contains("mt_triple")) {
      def full(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.toRdd.count()
      def timedFull(name: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = body
        println(f"SCALE100 $name: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
        Caches.releaseScoped() // shared census deliberately kept
      }
      timedFull("shared_mt_pairs_500k")(
        full(ops.Text.sharedMtPairCensus(spark, dst)))
      for (q <- Seq("q_text_bleu", "q_text_rouge", "q_text_chrf"))
        timedFull(s"$q (census resident)")(
          full(Registry.queries(q)(spark, dst)))
      Caches.releaseShared()
    }

    // -- family 1c: the trade-graph family on a REGENERATED 100× feed
    // (VERDICT r9 next #8). The plain staged fixtures duplicate
    // customer/supplier UNSHIFTED, so the fact→edge join fans out
    // copies× per dimension — copies² through the two dim joins: a
    // staging artifact the r8/r9 graph rows (q_graph_scc/hits bands)
    // measured instead of the engine. Here each copy is a DISJOINT,
    // internally-consistent subgraph over the same 25 nations: fact
    // keys AND their dimension foreign keys shift together, so every
    // join stays 1:1 per row (constant density — the documents-corpus
    // regeneration principle applied to the trade graph), facts and
    // customers both really grow 100×, and the edge aggregation's
    // input scales linearly.
    val gdst = "/tmp/graft_sf10_graph"
    if ((args.isEmpty || args.exists(_.startsWith("graph_regen"))) &&
        !new java.io.File(s"$gdst/_done").exists()) {
      def repg(name: String, shifts: Seq[String], nCopies: Int = copies): Unit = {
        val base = spark.read.parquet(s"$src/$name.parquet")
        val out = (0 until nCopies).map { i =>
          shifts.foldLeft(base)((df, c) => df.withColumn(c, col(c) + lit(i * off)))
        }.reduce(_ unionByName _)
        out.write.mode("overwrite").parquet(s"$gdst/$name.parquet")
        println(s"staged graph-feed $name: " +
          s"${spark.read.parquet(s"$gdst/$name.parquet").count()}")
      }
      repg("lineitem", Seq("l_orderkey", "l_suppkey"))
      repg("orders", Seq("o_orderkey", "o_custkey"))
      repg("customer", Seq("c_custkey"))
      repg("supplier", Seq("s_suppkey"))
      repg("nation", Seq.empty, nCopies = 1)
      repg("region", Seq.empty, nCopies = 1)
      repg("part", Seq.empty, nCopies = 1)
      new java.io.File(s"$gdst/_done").createNewFile()
    }
    if (args.isEmpty || args.contains("graph_regen"))
      for (q <- Seq("q_graph_pagerank", "q_graph_degree", "q_graph_scc",
          "q_graph_hits", "q_graph_reciprocity"))
        timed(s"$q (regen graph)")(
          Registry.queries(q)(spark, gdst).queryExecution.toRdd.count())

    // -- family 2: loop probes at 100× label scale ---------------------
    // chain forest: 10 000 components × 150 nodes; both edge directions
    def chainEdges = {
      val fwd = spark.range(1500000)
        .filter(pmod(col("id"), lit(150)) =!= 0)
        .select(col("id").as("u"), (col("id") - 1).as("v"))
      fwd.unionByName(fwd.select(col("v").as("u"), col("u").as("v")))
        .repartition(64)
    }
    def hookNodes = spark.range(1500000)
      .select(col("id").as("node"), col("id").as("label"))
    if (args.isEmpty || args.contains("hook_loop"))
      timed("hook_loop_1500k_broadcast") {
        val lab = ops.Geo.contractedHookLabels(chainEdges, hookNodes, 6, 6)
        val n = lab.select(col("label")).distinct().count()
        require(n == 10000L, s"expected 10000 components, got $n")
        lab.count()
      }
    if (args.isEmpty || args.contains("hook_loop_fallback")) {
      spark.conf.set("spark.graft.broadcastLabelLimit", "100000")
      try timed("hook_loop_1500k_shufflehash") {
        val lab = ops.Geo.contractedHookLabels(chainEdges, hookNodes, 6, 6)
        val n = lab.select(col("label")).distinct().count()
        require(n == 10000L, s"expected 10000 components, got $n")
        lab.count()
      } finally spark.conf.unset("spark.graft.broadcastLabelLimit")
    }
    // blocked graph for the propagate+compress loop: 500 k components × 4
    if (args.isEmpty || args.contains("component_loop"))
      timed("component_loop_2m") {
        val fwd = spark.range(2000000)
          .filter(pmod(col("id"), lit(4)) =!= 0)
          .select(col("id").as("d1"), (col("id") - 1).as("d2"))
        val edges = Caches.scoped(
          fwd.unionByName(fwd.select(col("d2").as("d1"), col("d1").as("d2")))
            .repartition(col("d2")))
        val verts = ops.Pipeline.componentVerts(edges)
        val lab = ops.Pipeline.componentLabels(edges, verts,
          ops.Pipeline.componentRounds)
        val n = lab.select(col("root")).distinct().count()
        require(n == 500000L, s"expected 500000 components, got $n")
        lab.count()
      }
    spark.stop()
  }
}
