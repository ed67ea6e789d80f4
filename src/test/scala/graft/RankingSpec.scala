package graft

import org.apache.spark.sql.functions._

/** Brute-force ground truth for the round-10 additions: the
  * ranking-evaluation family, the mixing keys, the winsorized mean,
  * ROUGE, Neyman allocation, AR(1), and incremental ANN maintenance.
  * Each test recomputes the result from first principles on the
  * collected sf0.001 relation (tiny) — pair counting for AUC, a
  * sequential walk for AP/MRR/NDCG, a local greedy pass for the token
  * budget, a local nearest-centroid argmin for the delta assignment —
  * and requires exact equality with the graded query output, so the
  * operator algebra is pinned to the textbook definitions, not to
  * itself.
  */
class RankingSpec extends SparkSpec {

  private def q(name: String) = Registry.queries(name)(spark, sfDir)

  /** (nationkey, item, score, y, gain) — the shared items relation,
    * recomputed independently of ops.Ranking.items.
    */
  private lazy val items: Seq[(Long, Long, Long, Long, Long)] = {
    val score = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Tables.supplier(spark, sfDir).collect().map { r =>
      val bal = r.getDouble(r.fieldIndex("s_acctbal"))
      (r.getInt(r.fieldIndex("s_nationkey")).toLong,
        r.getLong(r.fieldIndex("s_suppkey")),
        score.getOrElse(r.getLong(r.fieldIndex("s_suppkey")), 0L),
        if (bal > 5000.0) 1L else 0L,
        if (bal >= 7500.0) 7L else if (bal >= 5000.0) 3L
        else if (bal >= 2500.0) 1L else 0L)
    }.toSeq
  }

  private def byNation = items.groupBy(_._1)

  test("q_ml_auc equals brute-force pair counting with half-credit ties") {
    val expected = byNation.map { case (nat, its) =>
      val pos = its.filter(_._4 == 1L).map(_._3)
      val neg = its.filter(_._4 == 0L).map(_._3)
      val auc =
        if (pos.isEmpty || neg.isEmpty) 0L
        else {
          val conc = (for (p <- pos; n <- neg if p > n) yield 1L).sum
          val ties = (for (p <- pos; n <- neg if p == n) yield 1L).sum
          ((2 * conc + ties) * 1000000L) / (2L * pos.size * neg.size)
        }
      nat -> auc
    }
    val got = q("q_ml_auc").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected, s"AUC mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ml_avg_precision equals a sequential precision-at-k walk") {
    val expected = byNation.map { case (nat, its) =>
      val ordered = its.sortBy(t => (-t._3, t._2))
      var cp = 0L
      var sum = 0L
      ordered.zipWithIndex.foreach { case (t, i) =>
        if (t._4 == 1L) { cp += 1; sum += (cp * 1000000L) / (i + 1) }
      }
      val npos = its.count(_._4 == 1L)
      nat -> (if (npos == 0) 0L else sum / npos)
    }
    val got = q("q_ml_avg_precision").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == expected, s"AP mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  private val w10 = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  test("q_ml_ndcg equals the literal-table DCG/IDCG walk") {
    val expected = byNation.map { case (nat, its) =>
      val model = its.sortBy(t => (-t._3, t._2)).take(10).map(_._5)
      val ideal = its.sortBy(t => (-t._5, t._2)).take(10).map(_._5)
      val dcg = model.zipWithIndex.map { case (g, i) => g * w10(i) }.sum
      val idcg = ideal.zipWithIndex.map { case (g, i) => g * w10(i) }.sum
      nat -> (if (idcg == 0) 0L else dcg * 1000000L / idcg)
    }
    val got = q("q_ml_ndcg").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == expected, s"NDCG mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ml_mrr equals the first-relevant-rank walk") {
    val expected = byNation.map { case (nat, its) =>
      val ordered = its.sortBy(t => (-t._3, t._2))
      val first = ordered.indexWhere(_._4 == 1L)
      nat -> (if (first < 0) 0L else 1000000L / (first + 1))
    }
    val got = q("q_ml_mrr").collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == expected, s"MRR mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_mix_token_budget: greedy local replay reproduces the census") {
    val docs = Tables.documents(spark, sfDir).collect().map { r =>
      // split(text, ' ') in Spark keeps trailing empties (limit -1)
      val toks = r.getString(r.fieldIndex("text")).split(" ", -1)
      (r.getString(r.fieldIndex("lang")),
        r.getLong(r.fieldIndex("doc_id")),
        toks.length.toLong,
        toks.distinct.length.toLong * 1000000L / toks.length)
    }
    val budget = docs.map(_._3).sum / 2
    var cum = 0L
    val selected = docs.sortBy(t => (-t._4, t._2)).takeWhile { t =>
      cum += t._3; cum <= budget
    }.map(_._2).toSet
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ((ds.length.toLong, ds.map(_._3).sum,
        ds.count(d => selected(d._2)).toLong,
        ds.filter(d => selected(d._2)).map(_._3).sum,
        ds.filter(d => selected(d._2)).map(_._2).sum))
    }
    val got = q("q_mix_token_budget").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected,
      s"token-budget mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ml_roc_curve equals the threshold-sweep walk and brackets AUC") {
    val expected = byNation.flatMap { case (nat, its) =>
      val npos = its.map(_._4).sum
      val nneg = its.size - npos
      val byScore = its.groupBy(_._3).toSeq.sortBy(-_._1)
      var tp = 0L; var fp = 0L
      byScore.map { case (score, rows) =>
        tp += rows.map(_._4).sum
        fp += rows.size - rows.map(_._4).sum
        ((nat, score), (tp, fp,
          if (npos == 0) 0L else tp * 1000000L / npos,
          if (nneg == 0) 0L else fp * 1000000L / nneg))
      }
    }.toMap
    val got = q("q_ml_roc_curve").collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"ROC mismatch: ${got.size} vs ${expected.size}")
    // final curve point is (1e6, 1e6) for every non-degenerate query
    byNation.foreach { case (nat, its) =>
      val npos = its.map(_._4).sum
      if (npos > 0 && npos < its.size) {
        val last = got.filter(_._1._1 == nat).maxBy(p => p._2._1 + p._2._2)
        assert(last._2._3 == 1000000L && last._2._4 == 1000000L)
      }
    }
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ml_lift_gains equals a local ntile replay; gains end at 1e6") {
    val all = items.sortBy(t => (-t._3, t._2))
    val n = all.size
    val q10 = n / 10; val rem = n % 10
    // ntile: first rem tiles get q10+1 rows
    val deciles = all.zipWithIndex.map { case (t, i) =>
      val tile = if (i < (q10 + 1) * rem) i / (q10 + 1) + 1
      else rem + (i - (q10 + 1) * rem) / q10 + 1
      (tile, t._4)
    }
    val g = deciles.groupBy(_._1).toSeq.sortBy(_._1)
    val tPos = deciles.map(_._2).sum
    var cum = 0L
    val expected = g.map { case (dec, rows) =>
      val pos = rows.map(_._2).sum
      cum += pos
      dec -> ((rows.size.toLong, pos,
        pos * 1000000L / rows.size,
        if (tPos == 0) 0L else cum * 1000000L / tPos,
        if (tPos == 0) 0L
        else pos * n.toLong * 1000000L / (rows.size.toLong * tPos)))
    }.toMap
    val got = q("q_ml_lift_gains").collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"lift mismatch: got $got expected $expected")
    assert(got.maxBy(_._1)._2._4 == 1000000L || tPos == 0L,
      "cumulative gains must end at 1e6")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_agg_winsorized: clamped mean from a local order-statistic walk") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_linestatus"), col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (st, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = sorted(((n + 9) / 10 - 1).toInt)
      val hi = sorted(((9 * n + 9) / 10 - 1).toInt)
      val wins = sorted.map(v => math.max(lo, math.min(hi, v))).sum
      st -> ((n, lo, hi, sorted.sum * 1000000L / n, wins * 1000000L / n))
    }
    val got = q("q_agg_winsorized").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"winsorized mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_text_rouge: F1 is the harmonic mean identity of BLEU-side counts") {
    // ROUGE and BLEU share the pairing and clipped match counts: for
    // every lang, rouge.match_n == bleu.match_n and rouge.cand_n ==
    // bleu.total_n, and F1 = 2m/(cand+ref) exactly.
    val bleu = q("q_text_bleu").collect().map(r =>
      r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(5),
        r.getLong(6)))).toMap // match_1, total_1, match_2, total_2
    val rouge = q("q_text_rouge").collect()
    assert(rouge.nonEmpty)
    rouge.foreach { r =>
      val lang = r.getString(0)
      val (bm1, bt1, bm2, bt2) = bleu(lang)
      val (m1, ref1, f1) = (r.getLong(2), r.getLong(3), r.getLong(5))
      val (m2, ref2, f2) = (r.getLong(6), r.getLong(7), r.getLong(9))
      assert(m1 == bm1 && m2 == bm2, s"$lang: clipped matches diverge")
      assert(f1 == 2 * m1 * 1000000L / (bt1 + ref1), s"$lang: f1 identity")
      assert((bt2 + ref2 == 0L && f2 == 0L)
        || f2 == 2 * m2 * 1000000L / (bt2 + ref2), s"$lang: f2 identity")
      assert(r.getLong(4) <= 1000000L && r.getLong(8) <= 1000000L,
        s"$lang: recall bounded")
    }
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_sim_ann_incremental equals a local nearest-centroid assignment") {
    val vecs = ops.VecOps.quantized(spark, sfDir).collect().map { r =>
      (r.getLong(r.fieldIndex("vec_id")),
        r.getSeq[Long](r.fieldIndex("v")).toArray)
    }
    def cell(v: Array[Long]): Long =
      (0 until 5).map(k => if (v(k) > 0) 1L << k else 0L).sum
    val base = vecs.filter(t => t._1 % 5 != 3)
    val delta = vecs.filter(t => t._1 % 5 == 3)
    val byCell = base.groupBy(t => cell(t._2))
    val cents = byCell.map { case (c, vs) =>
      c -> ((vs.length.toLong,
        (0 until 64).map(k => vs.map(_._2(k)).sum).toArray))
    }
    val assigned = delta.map { case (id, v) =>
      val scored = cents.toSeq.map { case (cand, (c, sx)) =>
        val num = (0 until 64).map { k =>
          val dx = BigInt(c) * v(k) - sx(k); dx * dx
        }.sum
        (cand, num.toDouble / (c.toDouble * c.toDouble))
      }
      val best = scored.minBy(t => (t._2, t._1))._1
      (id, cell(v), best)
    }
    val expected = byCell.map { case (c, vs) =>
      val del = assigned.filter(_._3 == c)
      c -> ((vs.length.toLong, del.length.toLong,
        del.count(t => t._2 != t._3).toLong, del.map(_._1).sum))
    }
    val got = q("q_sim_ann_incremental").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, s"ann-incremental mismatch: got $got")
    assert(got.values.map(_._2).sum == delta.length.toLong,
      "every delta vector must be assigned exactly once")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_sample_neyman: allocation sums exactly to the budget and " +
    "follows N_h*sigma_h") {
    val rows = q("q_sample_neyman").collect()
    assert(rows.map(_.getLong(4)).sum == 10000L,
      "largest-remainder allocation must sum exactly to the budget")
    // allocation ordering must follow the weight ordering
    val byW = rows.map(r => (r.getLong(1) * r.getLong(2), r.getLong(4)))
    byW.sortBy(-_._1).zip(byW.sortBy(-_._2)).foreach { case (a, b) =>
      assert(a._2 == b._2, "alloc must be monotone in N_h*sigma_h")
    }
    // sigma replays from the collected stratum rows
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (graft.Dsl.dec(col("l_extendedprice")) * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    rows.foreach { r =>
      val xs = li.filter(_._1 == r.getString(0)).map(_._2)
      val n = BigInt(xs.length)
      val varC = ((n * xs.map(x => BigInt(x) * x).sum
        - BigInt(xs.sum) * BigInt(xs.sum)) / (n * n)).toLong
      assert(r.getLong(2) == math.floor(math.sqrt(varC.toDouble)).toLong,
        s"${r.getString(0)}: sigma mismatch")
    }
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ts_ar1: slope/intercept/backtest replay from collected pairs") {
    val hourly = Tables.events(spark, sfDir)
      .select(col("event_type"),
        graft.Dsl.floorDiv(unix_micros(col("ts")), 3600000000L).as("hr"))
      .groupBy(col("event_type"), col("hr")).agg(count(lit(1)).as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def floorDivL(a: BigInt, b: BigInt): BigInt = {
      val q = a / b; if (a % b != 0 && (a.signum * b.signum) < 0) q - 1 else q
    }
    val expected = hourly.groupBy(_._1).flatMap { case (et, rows) =>
      val series = rows.sortBy(_._2)
      val pairs = series.zip(series.drop(1))
        .filter { case (a, b) => b._2 == a._2 + 1 }
        .map { case (a, b) => (a._3, b._3) }
      val n = BigInt(pairs.length)
      val sx = BigInt(pairs.map(_._1).sum); val sy = BigInt(pairs.map(_._2).sum)
      val sxy = pairs.map(p => BigInt(p._1) * p._2).sum
      val sxx = pairs.map(p => BigInt(p._1) * p._1).sum
      val varx = n * sxx - sx * sx
      if (varx <= 0) None
      else {
        val phi = floorDivL((n * sxy - sx * sy) * 1000000, varx)
        val c = floorDivL(sy * 1000000 - phi * sx, n)
        val serr = pairs.map { case (x, y) =>
          (BigInt(y) * 1000000 - (c + phi * x)).abs
        }.sum
        Some(et -> ((n.toLong, phi.toLong, c.toLong,
          (serr / sy).toLong)))
      }
    }
    val got = q("q_ts_ar1").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got == expected, s"ar1 mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ml_woe_iv: WoE/IV replay with the scalar DetMath ln") {
    val li = Tables.lineitem(spark, sfDir)
      .select(expr("(cast(l_quantity as bigint) - 1) div 5"),
        when(col("l_extendedprice") >= 52000.0, 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val bins = li.groupBy(_._1).map { case (b, rs) =>
      (b, rs.length.toLong, rs.map(_._2).sum)
    }.toSeq
    val nb = bins.length.toLong
    val tg = bins.map(_._3).sum + nb
    val tb = bins.map(t => t._2 - t._3).sum + nb
    def fdiv(a: Long, m: Long): Long = {
      val r = ((a % m) + m) % m; (a - r) / m
    }
    val expected = bins.map { case (b, n, good) =>
      val g1 = good + 1; val b1 = n - good + 1
      val ln = graft.functions.DetMath.lnIntScalar _
      val woe = math.floor(
        (ln(g1) - ln(tg) - ln(b1) + ln(tb)) * 1000000.0).toLong
      val sg = g1 * 1000000L / tg; val sb = b1 * 1000000L / tb
      b -> ((n, good, woe, sg, sb, fdiv((sg - sb) * woe, 1000000L)))
    }.toMap
    val got = q("q_ml_woe_iv").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(got == expected, s"woe/iv mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_text_chrf equals a local char-3-gram clipped-match replay") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def grams(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val ordered = ds.sortBy(_._2).map(_._3)
      val pairs = ordered.grouped(2).filter(_.length == 2).toSeq
      var m = 0L; var tc = 0L; var tr = 0L
      pairs.foreach { p =>
        val cg = grams(p(0)).groupBy(identity).map { case (g, o) => g -> o.length }
        val rg = grams(p(1)).groupBy(identity).map { case (g, o) => g -> o.length }
        m += cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0)) }.sum
        tc += math.max(p(0).length - 2, 0); tr += math.max(p(1).length - 2, 0)
      }
      lang -> ((pairs.length.toLong, m, tc, tr,
        if (4 * tr + tc == 0) 0L else 5 * m * 1000000L / (4 * tr + tc)))
    }
    val got = q("q_text_chrf").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == expected, s"chrf mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_mix_dedup_weight: cluster weights sum to one per cluster") {
    val docs = Tables.documents(spark, sfDir).collect().map { r =>
      (r.getString(r.fieldIndex("lang")),
        r.getString(r.fieldIndex("text")),
        r.getString(r.fieldIndex("text")).split(" ", -1).length.toLong)
    }
    val csize = docs.groupBy(_._2).map { case (t, ds) => t -> ds.length.toLong }
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      lang -> ((ds.length.toLong,
        ds.count(d => csize(d._2) == 1L).toLong,
        ds.map(d => 1000000L / csize(d._2)).sum,
        ds.map(d => d._3 * (1000000L / csize(d._2)) / 1000000L).sum))
    }
    val got = q("q_mix_dedup_weight").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(5)))).toMap
    assert(got == expected,
      s"dedup-weight mismatch: got $got expected $expected")
    // a corpus with duplicates must shrink: eff_docs_e6 < n_docs·1e6
    // somewhere iff any cluster has size > 1
    val anyDup = csize.values.exists(_ > 1L)
    val shrank = got.exists { case (_, (n, _, eff, _)) => eff < n * 1000000L }
    assert(shrank == anyDup, "effective mass must shrink iff dups exist")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_ts_dft24: local table-exact DFT replay matches the graded output") {
    // recompute the spectrum from a collected (type, hour-of-day)
    // census with the SAME literal table — pins the key to its spec
    val cosE6 = Seq(1000000L, 965925L, 866025L, 707106L, 500000L,
      258819L, 0L, -258819L, -500000L, -707106L, -866025L, -965925L,
      -1000000L, -965925L, -866025L, -707106L, -500000L, -258819L, 0L,
      258819L, 500000L, 707106L, 866025L, 965925L)
    val hod = Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("(unix_micros(ts) div 3600000000) % 24").as("hod"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.size.toLong }
    val want = hod.keys.map(_._1).toSeq.distinct.sorted.map { t =>
      val xs = (0 until 24).map(n => hod.getOrElse((t, n.toLong), 0L))
      val ps = (1 to 3).map { k =>
        val sx = (0 until 24).map(n =>
          BigInt(xs(n)) * cosE6((k * n) % 24)).sum
        val sy = (0 until 24).map(n =>
          BigInt(xs(n)) * cosE6((k * n + 18) % 24)).sum
        ((sx * sx + sy * sy) / 1000000).toLong
      }
      (t, xs.sum, ps(0), ps(1), ps(2))
    }
    val got = q("q_ts_dft24").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"DFT mismatch:\n got=$got\nwant=$want")
    Caches.releaseScoped()
  }

  test("q_dedup_cdc: local chunker replay and the shift-invariance property") {
    // 1) replay the Rabin chunker locally on a handful of fixture docs
    //    and require identical chunk multisets;
    // 2) pin CDC's reason to exist: inserting a prefix shifts every
    //    offset but leaves the chunk sequence AFTER the first
    //    boundary-crossing window identical (fixed-width blocks would
    //    lose all alignment).
    val P = 1000003L; val M = 32L; val w = 8
    val pows = Seq(1L, 131L, 17161L, 248085L, 499039L, 373914L,
      982590L, 718906L)
    def chunk(text: String): Seq[String] = {
      if (text.length < w) return Seq(text).filter(_.nonEmpty)
      val cuts = (w to text.length).filter { i =>
        val window = text.substring(i - w, i)
        val h = window.zipWithIndex
          .map { case (c, j) => c.toLong * pows(j) }.sum % P
        h % M == 0
      }
      val cf = (0 +: cuts) ++ (if (cuts.nonEmpty && cuts.last == text.length)
        Seq.empty else Seq(text.length))
      cf.sliding(2).map { case Seq(a, b) => text.substring(a, b) }
        .filter(_.nonEmpty).toSeq
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(20).collect()
      .map(r => (r.getString(1), r.getString(2)))
    // Spark-side chunks for the same 20 docs, via the graded key's lang
    // census being too coarse — recompute per-lang chunk multisets
    // locally for ALL docs of one lang and compare against the census
    val lang = docs.head._1
    val localAll = Tables.documents(spark, sfDir)
      .filter(col("lang") === lang).select(col("text")).collect()
      .flatMap(r => chunk(r.getString(0)))
    val counts = localAll.groupBy(identity).map(_._2.length.toLong)
    val wantRow = (localAll.length.toLong, counts.size.toLong,
      counts.map(_ - 1).sum, counts.max,
      (BigInt(localAll.map(_.length.toLong).sum) * 1000000 /
        localAll.length).toLong)
    val gotRow = q("q_dedup_cdc").collect()
      .find(_.getString(0) == lang).map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(6))).get
    assert(gotRow == wantRow, s"cdc census mismatch for $lang: " +
      s"got=$gotRow want=$wantRow")
    // shift invariance: chunks after the first boundary survive a
    // prefix insertion verbatim
    val base = docs.map(_._2).maxBy(_.length)
    assert(base.length > 100, "fixture docs unexpectedly short")
    val shifted = "INSERTED-PREFIX " + base
    val cb = chunk(base); val cs = chunk(shifted)
    val common = cb.toSet intersect cs.toSet
    assert(cb.size >= 3 && common.size >= cb.size - 2,
      s"CDC must keep downstream chunks under an upstream insertion: " +
        s"base=${cb.size} common=${common.size}")
    Caches.releaseScoped()
  }
}
