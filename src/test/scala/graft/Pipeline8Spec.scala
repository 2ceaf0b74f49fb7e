package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the round-8 batch-2 operators (CDC upsert merge,
  * SCD2 history, rolling z-score anomaly, weighted PPS systematic
  * sample) on SYNTHETIC frames — fixture correctness is covered by the
  * oracle gate; this ring pins the API semantics a user relies on. */
class Pipeline8Spec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("Rel.mergeUpsert: update wins, delete removes, insert appears, untouched row survives") {
    val sp = spark
    import sp.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "U"))
      .toDF("k", "v", "op")
    val r = api.Rel.mergeUpsert(base, changes, "k")
      .orderBy("k").collect().map(x => (x.getLong(0), x.getString(1)))
    assert(r.toSeq == Seq((1L, "a"), (2L, "B"), (4L, "d")))
  }

  test("Rel.mergeUpsert: shuffle fallback (broadcastChanges=false) gives identical results") {
    val sp = spark
    import sp.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "U"))
      .toDF("k", "v", "op")
    val bc = api.Rel.mergeUpsert(base, changes, "k")
    val sh = api.Rel.mergeUpsert(base, changes, "k",
      broadcastChanges = false)
    assert(bc.exceptAll(sh).isEmpty && sh.exceptAll(bc).isEmpty)
  }

  test("Rel.scd2History: runs collapse to change points, ts ties break by id, open tail") {
    val sp = spark
    import sp.implicits._
    def t(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val log = Seq(
      // key 1: x x y x -> versions x@0, y@2, x@3 (the repeat at t1
      // is NOT a change point)
      (1L, t(0), 10L, "x"), (1L, t(1), 11L, "x"),
      (1L, t(2), 12L, "y"), (1L, t(3), 13L, "x"),
      // key 2: two rows at the SAME ts — id order decides p then q
      (2L, t(5), 20L, "p"), (2L, t(5), 21L, "q"))
      .toDF("k", "ts", "id", "attr")
    val r = api.Rel.scd2History(log, "k", "ts", "id", "attr")
      .orderBy("k", "version").collect()
    val rows = r.map(x => (x.getLong(0), x.getLong(1), x.getString(2),
      x.getTimestamp(3), if (x.isNullAt(4)) null else x.getTimestamp(4)))
    assert(rows.toSeq == Seq(
      (1L, 1L, "x", t(0), t(2)),
      (1L, 2L, "y", t(2), t(3)),
      (1L, 3L, "x", t(3), null),
      (2L, 1L, "p", t(5), t(5)),
      (2L, 2L, "q", t(5), null)))
  }

  test("Events.rollingAnomaly: exact z for a planted spike, warm-up and flat windows NULL") {
    val sp = spark
    import sp.implicits._
    // 11 hours of one event + hour 11 with five events, win = 12.
    // A single outlier in an otherwise-flat window scores EXACTLY
    // (n-1)/sqrt(n) whatever the spike size (algebra in the api doc);
    // 11/sqrt(12) = 3.175426... > 3 -> flagged.
    val ev = ((0 to 10).map(h =>
        (Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), "a")) ++
      (0 until 5).map(m =>
        (Timestamp.valueOf(f"2024-01-01 11:$m%02d:00"), "a")))
      .toDF("ts", "series")
    val r = api.Events.rollingAnomaly(ev, "series", "ts", win = 12)
      .orderBy("hr").collect()
    assert(r.length == 12)
    // hours 0..10: fewer than win trailing rows -> z NULL, not flagged
    (0 to 10).foreach { i =>
      assert(r(i).isNullAt(3) && !r(i).getBoolean(4))
    }
    val expected = BigDecimal(11.0 / math.sqrt(12.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(11).getDouble(3) == expected)
    assert(r(11).getBoolean(4))
    // a fully flat full window scores NULL too (zero variance)
    val flat = (0 to 12).map(h =>
        (Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), "b"))
      .toDF("ts", "series")
    val rf = api.Events.rollingAnomaly(flat, "series", "ts", win = 12)
      .orderBy("hr").collect()
    assert(rf.drop(11).forall(x => x.isNullAt(3) && !x.getBoolean(4)))
  }

  test("Dedup.spanDuplicates: planted cross-doc span found with first occurrence, singles dropped") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h x"),   // span at pos 0
      (2L, "z a b c d e f g h"),   // same span at pos 1
      (3L, "p q r s t u v w"))     // unrelated, single doc
      .toDF("doc_id", "text")
    val r = api.Dedup.spanDuplicates(docs, "doc_id", "text", n = 8)
      .collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getString(0) == "a b c d e f g h")
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L)
    assert(row.getLong(3) == 1L && row.getLong(4) == 0L)
  }

  test("Graph.pagerankMicro: exact integer ranks on a path graph, center dominates") {
    val sp = spark
    import sp.implicits._
    // path 1-2-3: after one superstep (total 1e12, N=3, base
    // (15*(1e12 div 3)) div 100 = 49999999999):
    //   ends get 49999999999 + (85*(r0(2) div 2)) div 100
    //   center gets 49999999999 + (85*(r0(1)+r0(3))) div 100
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val r1 = api.Graph.pagerankMicro(edges, iters = 1)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r1.toSeq == Seq(
      (1L, 49999999999L + 85L * 166666666666L / 100L),
      (2L, 49999999999L + 85L * 666666666666L / 100L),
      (3L, 49999999999L + 85L * 166666666666L / 100L)))
    // more iterations keep the center on top and the ends symmetric
    val r3 = api.Graph.pagerankMicro(edges, iters = 3)
      .orderBy("node").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(r3(0)._2 == r3(2)._2 && r3(1)._2 > r3(0)._2)
  }

  test("Events.dauMau: trailing-28-day actives, quiet days absent, exact stickiness") {
    val sp = spark
    import sp.implicits._
    def t(day: Int) = Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")
    // u1 active day 0 and day 30 (outside the 28-day window of day 0);
    // u2 active day 0 only; no other days have activity
    val ev = Seq((1L, t(0)), (1L, t(0)), (2L, t(0)), (1L, t(30)))
      .toDF("user_id", "ts")
    val r = api.Events.dauMau(ev, "user_id", "ts")
      .orderBy("day").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3)))
    assert(r.toSeq == Seq(
      ("2024-01-01", 2L, 2L, 1000000L),
      ("2024-01-31", 1L, 1L, 1000000L)))
  }

  test("Sample.ppsSystematic: equals the global-cumsum reference; bucket count is invisible") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 200L).map(i => (i, (i % 7) + 1)).toDF("id", "wt")
    val k = 20L
    // single-partition reference: hash order, global cumsum, grid picks
    val ref = {
      val rows = (1L to 200L).map { i =>
        val h = ((i * 1103515245L + 12345L) % 1000000007L + 1000000007L) %
          1000000007L
        (h, i, (i % 7) + 1)
      }.sortBy(x => (x._1, x._2))
      val total = rows.map(_._3).sum
      var cum = 0L
      rows.flatMap { case (_, i, w) =>
        cum += w
        if ((k * cum) / total > (k * (cum - w)) / total) Some(i) else None
      }.sorted
    }
    val got = api.Sample.ppsSystematic(docs, "id", "wt", k)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == ref)
    assert(got.size == k) // all weights < W/k here -> exactly k picks
    // the distributed bucketing is pure plumbing: one bucket (a true
    // global cumsum) selects the identical sample
    val one = api.Sample.ppsSystematic(docs, "id", "wt", k, buckets = 1)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(one == got)
  }
}
