package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the round-7 closers (gap-fill/forward-fill,
  * blocked Levenshtein fuzzy pairs, IQR outlier fences, equi-width
  * histogram) on SYNTHETIC frames — fixture correctness is covered by
  * the oracle gate; this ring pins the API semantics a user relies
  * on. */
class Pipeline6Spec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("Events.gapfillHourly: zero-filled gaps, max carried forward") {
    val sp = spark
    import sp.implicits._
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // u1: events in hours 0 (two: max 5.0) and 3 (one: 2.0) -> spine
    // 0..3 with hours 1,2 zero-filled carrying 5.0; u2: single event.
    val ev = Seq(
      (1L, t(0, 10), 5.0), (1L, t(0, 50), 1.0), (1L, t(3, 0), 2.0),
      (2L, t(7, 30), 9.0))
      .toDF("user_id", "ts", "value")
    val r = api.Events.gapfillHourly(ev, "user_id", "ts", "value")
      .orderBy("user_id", "hr").collect()
    assert(r.length == 5) // u1 hours 0-3, u2 hour 7
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 0L, 0L, 1L, 1L))
    assert(r.map(_.getDouble(3)).toSeq == Seq(5.0, 5.0, 5.0, 2.0, 9.0))
    assert(r(1).getTimestamp(1) == Timestamp.valueOf("2024-01-01 01:00:00"))
  }

  test("Dedup.fuzzyPairs: blocking bounds candidates, threshold on lev") {
    val sp = spark
    import sp.implicits._
    // docs 1,2 same block, 1 edit apart; doc 3 same block but far;
    // doc 4 is NEAR-IDENTICAL to 1 yet in another block -> never paired
    // (that is the documented blocking trade-off).
    val docs = Seq(
      (1L, "blk1", "abcdef"), (2L, "blk1", "abcxef"),
      (3L, "blk1", "zzzzzz"), (4L, "blk2", "abcdef"))
      .toDF("id", "blk", "body")
    val r = api.Dedup.fuzzyPairs(docs, "id", "body", col("blk"),
        prefixLen = 6, maxDist = 2)
      .orderBy("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.toSeq == Seq((1L, 2L, 1L)))
  }

  test("Dedup.fuzzyPairs graded blocking: planted edit-dups found, head-divergent pair excluded") {
    val sp = spark
    import sp.implicits._
    // The graded key blocks on (lang, length div 64, substring(text,1,8)).
    // Planted: 2 is doc 1 with a one-char edit PAST the 8-char head
    // (found); 3 is a one-char edit INSIDE the head (the documented
    // blocking trade-off: excluded); 4 matches 1's head+block in
    // another lang (excluded); 5 is unrelated same-lang text (same
    // block shape impossible — different head).
    val base = "sharded parquet corpus with stable document heads okay"
    val docs = Seq(
      (1L, "en", base),
      (2L, "en", base.replace("stable", "stible")),
      (3L, "en", "shirded " + base.drop(8)),
      (4L, "de", base),
      (5L, "en", "entirely different text about lakehouse compaction ok"))
      .toDF("doc_id", "lang", "text")
    val r = api.Dedup.fuzzyPairs(docs, "doc_id", "text",
        struct(col("lang"), expr("length(text) div 64"),
          expr("substring(text, 1, 8)")),
        prefixLen = 64, maxDist = 20)
      .orderBy("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    assert(r.toSeq == Seq((1L, 2L)))
  }

  test("Profile.iqrOutliers: hand-computed fences and strict bounds") {
    val sp = spark
    import sp.implicits._
    // group g: values 1..9 plus outlier 101 -> n=10; sorted p25 at
    // index 2.25 = 3.25, p75 at 6.75 -> 7.75+... compute: values
    // (1,2,3,4,5,6,7,8,9,101): p25 = 3.25, p75 = 8.0+? idx=6.75 ->
    // v[6]=7 + 0.75*(8-7) = 7.75; iqr = 4.5; lo = -3.5, hi = 14.5
    // -> only 101 is outside; 9 < hi stays in.
    val df = ((1 to 9).map(_.toDouble) :+ 101.0).map(("g", _))
      .toDF("grp", "v")
    val r = api.Profile.iqrOutliers(df, "grp", "v").collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 10L)          // n
    assert(r(0).getLong(2) == 1L)           // n_outliers
    assert(r(0).getLong(3) == 100000L)      // outlier_ppm
    assert(r(0).getDouble(4) == -3.5)       // lo
    assert(r(0).getDouble(5) == 14.5)       // hi
  }

  test("Profile.iqrOutliers approx: KLL fences within the rank band, same classification") {
    val sp = spark
    import sp.implicits._
    // g: 2000 distinct values + one planted extreme -> value i has true
    // rank ~i/2001, so fence quality reads directly off the value.
    // h proves per-group sketches (its values scale 10x).
    val df = (((1 to 2000).map(_.toDouble) :+ 100000.0).map(("g", _)) ++
      (1 to 500).map(i => ("h", 10.0 * i))).toDF("grp", "v")
    val exact = api.Profile.iqrOutliers(df, "grp", "v")
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = api.Profile.iqrOutliers(df, "grp", "v", approx = true)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    // k=200 normalized rank error ~1.65%; assert a 3% band. With
    // p25 in [.22,.28]n and p75 in [.72,.78]n the Tukey fences
    // lo = 2.5*p25 - 1.5*p75 and hi = 2.5*p75 - 1.5*p25 land in
    // [-.62n, -.38n] and [1.38n, 1.62n]; any fences in band classify
    // exactly the one planted extreme.
    val g = approx("g")
    val n = 2001.0
    assert(g.getLong(1) == 2001L && g.getLong(2) == 1L)
    val lo = g.getDouble(4); val hi = g.getDouble(5)
    assert(lo >= -0.62 * n && lo <= -0.38 * n, s"lo fence off band: $lo")
    assert(hi >= 1.38 * n && hi <= 1.62 * n, s"hi fence off band: $hi")
    // per-group: h's fences scale with its own values; hi = 2.5*p75 -
    // 1.5*p25 drifts at most (2.5+1.5)*(3% of 500 ranks * 10/value) = 600.
    val h = approx("h")
    assert(h.getLong(2) == exact("h").getLong(2))
    assert(math.abs(h.getDouble(5) - exact("h").getDouble(5)) <= 600.0,
      s"h hi fence drift: ${h.getDouble(5)} vs ${exact("h").getDouble(5)}")
  }

  test("q_agg_histogram: exact cents arithmetic buckets the boundary") {
    // 4999.995 rounds to 500000 cents -> bucket 1, not 0; sums exact.
    val sp = spark
    import sp.implicits._
    val df = Seq(0.004, 4999.994, 4999.995, 5000.01, 10000.0)
      .toDF("l_extendedprice")
    val r = df
      .select(expr("cast(round(l_extendedprice * 100) as bigint)")
        .as("cents"))
      .select(expr("cents div 500000").as("bucket"), col("cents"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_items"),
        (sum("cents").cast("double") / 100).as("sum_price"))
      .orderBy("bucket").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((0L, 2L), (1L, 2L), (2L, 1L)))
    assert(r(0).getDouble(2) == 4999.99)
    assert(r(1).getDouble(2) == 10000.01)
    assert(r(2).getDouble(2) == 10000.0)
  }
}
