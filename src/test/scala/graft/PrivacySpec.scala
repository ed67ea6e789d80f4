package graft

import org.apache.spark.sql.functions._

/** Brute-force ground truth for the privacy / statistical-disclosure-
  * control family: each test recomputes the result from first
  * principles on the collected sf0.001 relation (tiny) — a plain
  * groupBy for the k-anonymity and l-diversity censuses, a sequential
  * per-user walk for the contribution cap, and a direct rule
  * application for cell suppression — and requires exact equality (or
  * the stated invariants) against the graded query output.
  */
class PrivacySpec extends SparkSpec {

  private def q(name: String) = Registry.queries(name)(spark, sfDir)

  private def cents(x: Double): Long =
    new java.math.BigDecimal(x)
      .setScale(2, java.math.RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  private lazy val customers: Seq[(Long, Int, String, Long)] =
    Tables.customer(spark, sfDir).collect().map { r =>
      (r.getLong(r.fieldIndex("c_custkey")),
        r.getInt(r.fieldIndex("c_nationkey")),
        r.getString(r.fieldIndex("c_mktsegment")),
        cents(r.getDouble(r.fieldIndex("c_acctbal"))))
    }.toSeq

  test("q_priv_kanon equals a brute-force class-size histogram") {
    val expected = customers
      .groupBy(c => (c._2, c._3, Math.floorDiv(c._4, 100000L)))
      .toSeq
      // NOT .map on the Map: a pair-valued map over a Map collapses
      // same-size classes into one entry
      .map { case (_, rows) => (rows.size.toLong, rows.map(_._1).min) }
      .groupBy(_._1)
      .map { case (size, cls) =>
        (size, cls.size.toLong, size * cls.size,
          cls.map(_._2).sum % 1000000007L)
      }.toSet
    val got = q("q_priv_kanon").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"kanon mismatch: got $got expected $expected")
    // the histogram partitions the whole table
    assert(got.toSeq.map(_._3).sum == customers.size.toLong)
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_priv_ldiv equals a brute-force distinct-sensitive census") {
    val custQi = customers
      .map(c => c._1 -> ((c._2, c._3, Math.floorDiv(c._4, 100000L)))).toMap
    val orders = Tables.orders(spark, sfDir).collect().map { r =>
      (r.getLong(r.fieldIndex("o_orderkey")),
        r.getLong(r.fieldIndex("o_custkey")),
        r.getString(r.fieldIndex("o_orderpriority")))
    }.toSeq.filter(o => custQi.contains(o._2))
    val expected = orders
      .groupBy(o => custQi(o._2))
      .map { case (_, os) =>
        (os.map(_._3).distinct.size.toLong, os.size.toLong,
          os.map(_._1).min)
      }
      .groupBy(_._1)
      .map { case (l, cls) =>
        (l, cls.size.toLong, cls.map(_._2).sum,
          cls.map(_._3).sum % 1000000007L)
      }.toSet
    val got = q("q_priv_ldiv").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected, s"ldiv mismatch: got $got expected $expected")
    assert(got.toSeq.map(_._3).sum == orders.size.toLong)
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_priv_clip equals a sequential first-20-per-user walk") {
    val events = Tables.events(spark, sfDir)
      .withColumn("us", unix_micros(col("ts")))
      .collect().map { r =>
        (r.getLong(r.fieldIndex("event_id")),
          r.getLong(r.fieldIndex("user_id")),
          r.getString(r.fieldIndex("event_type")),
          cents(r.getDouble(r.fieldIndex("value"))),
          r.getLong(r.fieldIndex("us")))
      }.toSeq
    val kept = events.groupBy(_._2).values.flatMap { evs =>
      evs.sortBy(e => (e._5, e._1)).take(20)
    }.map(_._1).toSet
    val expected = events.groupBy(_._3).map { case (tpe, evs) =>
      (tpe, evs.size.toLong,
        evs.count(e => kept(e._1)).toLong,
        evs.map(_._4).sum,
        evs.filter(e => kept(e._1)).map(_._4).sum,
        evs.map(_._2).distinct.size.toLong)
    }.toSet
    val got = q("q_priv_clip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected, s"clip mismatch: got $got expected $expected")
    // the cap binds: sf0.001 has heavy users, so some event must drop
    assert(got.exists(r => r._3 < r._2),
      "cap never bound — fixture should have users over 20 events")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_priv_pseudonym equals the scalar hash chain; mapping is " +
    "consistent and injective on the fixture") {
    val P = 2147483647L
    def pid(k: Long): Long = {
      val g1 = ((k % P) * 15485863L + 101L) % P
      val h1 = ((g1 ^ (g1 / 8192L)) * 32452843L + 1009L) % P
      val g2 = ((k % P) * 15485867L + 211L) % P
      val h2 = ((g2 ^ (g2 / 8192L)) * 32452867L + 2003L) % P
      h1 * 2147483648L + h2
    }
    val custPid = customers.map(c => c._1 -> pid(c._1)).toMap
    // injectivity on the fixture domain
    assert(custPid.values.toSet.size == custPid.size,
      "hash chain collided on the fixture key domain")
    val orders = Tables.orders(spark, sfDir).collect().map { r =>
      (r.getLong(r.fieldIndex("o_orderkey")),
        r.getLong(r.fieldIndex("o_custkey")))
    }.toSeq
    val segOf = customers.map(c => c._1 -> c._3).toMap
    val expected = orders.groupBy(o => segOf(o._2)).map { case (seg, os) =>
      val segCust = customers.filter(_._3 == seg)
      (seg, os.size.toLong, os.map(_._1).sum % 1000000007L,
        segCust.size.toLong, segCust.size.toLong,
        segCust.map(c => custPid(c._1) % 1000003L).sum)
    }.toSet
    val got = q("q_priv_pseudonym").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected,
      s"pseudonym mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_mix_curriculum equals a sequential sort-and-cut walk") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    val scored = docs.map { case (id, nc, nt) =>
      (id, nt, (nc - (nt - 1)) * 1000000L / nt)
    }.sortBy(x => (x._3, x._1))
    val n = scored.size
    val q5 = n / 5; val rem = n % 5
    // ntile: first rem tiles take q5+1 rows
    val expected = scored.zipWithIndex.map { case ((id, nt, sc), i) =>
      val stage =
        if (i < (q5 + 1) * rem) i / (q5 + 1) + 1
        else rem + (i - (q5 + 1) * rem) / q5 + 1
      (stage.toLong, id, nt, sc)
    }.groupBy(_._1).map { case (st, rows) =>
      (st, rows.size.toLong, rows.map(_._3).sum,
        rows.map(_._4).min, rows.map(_._4).max,
        rows.map(_._2).sum % 1000000007L)
    }.toSet
    val got = q("q_mix_curriculum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == expected,
      s"curriculum mismatch: got $got expected $expected")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_priv_dp_release noise equals the scalar geometric mechanism") {
    val P = 2147483647L
    def lane(seed: Long): Long = {
      val g1 = ((seed % P) * 15485863L + 101L) % P
      ((g1 ^ (g1 / 8192L)) * 32452843L + 1009L) % P + 1L
    }
    val lnM = functions.DetMath.lnIntScalar(2147483648L)
    val lnA = functions.DetMath.lnIntScalar(9L) -
      functions.DetMath.lnIntScalar(10L)
    def g(u: Long): Long =
      math.floor((functions.DetMath.lnIntScalar(u) - lnM) / lnA).toLong
    val rows = q("q_priv_dp_release").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // cid assignment follows the event_type sort order of the output
    rows.sortBy(_._1).zipWithIndex.foreach { case ((tpe, raw, capped,
        noise, released), i) =>
      val cid = i + 1L
      val expected = g(lane(cid * 2 + 777)) - g(lane(cid * 2 + 778))
      assert(noise == expected,
        s"$tpe: noise $noise != scalar mechanism $expected")
      assert(released == math.max(0L, capped + noise),
        s"$tpe: released not clamped cap+noise")
      assert(capped <= raw)
    }
    // the mechanism must actually perturb something on 5 cells
    assert(rows.exists(_._4 != 0L), "all noise draws were zero")
    Caches.releaseScoped(); Caches.releaseShared()
  }

  test("q_priv_suppress: no small published cell, margins exact, " +
    "no lone suppressed cell") {
    val rows = q("q_priv_suppress").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // 1. every published (non-SUPPRESSED) cell satisfies k >= 10
    rows.filter(_._2 != "SUPPRESSED").foreach { r =>
      assert(r._3 >= 10L, s"published cell below k: $r")
      assert(r._5 == 1L, s"published row must aggregate one cell: $r")
    }
    // 2. nation margins are exact: published + suppressed = all rows
    val byNation = customers.groupBy(_._2)
      .map { case (n, cs) => n -> ((cs.size.toLong, cs.map(_._4).sum)) }
    val gotNation = rows.groupBy(_._1)
      .map { case (n, rs) => n -> ((rs.map(_._3).sum, rs.map(_._4).sum)) }
    assert(gotNation == byNation,
      s"margin mismatch: got $gotNation expected $byNation")
    // 3. complementary suppression: a SUPPRESSED row never aggregates
    //    exactly one cell unless its nation HAS only one cell
    val cellsPerNation = customers.groupBy(_._2)
      .map { case (n, cs) => n -> cs.map(_._3).distinct.size }
    rows.filter(_._2 == "SUPPRESSED").foreach { r =>
      assert(r._5 >= 2L || cellsPerNation(r._1) == 1,
        s"lone suppressed cell is subtraction-recoverable: $r")
    }
    Caches.releaseScoped(); Caches.releaseShared()
  }
}
