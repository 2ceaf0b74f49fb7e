package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-13 batch 5 — IVF-PQ recall/containment vs its two
  * parent indexes, rolling-corr re-derivation on a window, and the
  * canonical-report conservation laws vs raw-text dedup. */
class Pipeline29Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("ivfpq: recall >= 0.3 vs exact; candidates confined to probed cells") {
    val exact = run("q_sim_cosine_topk").select("probe_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run("q_sim_ann_ivfpq").collect()
    val pairs = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    // both approximations compose: the combined index prunes cells
    // (IVF dial) AND scores codes (PQ dial) — floor slightly below
    // the single-dial 0.4 floors
    val recall = (exact & pairs).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall")
    // re-rank contract: 5 per probe, self excluded, cos descending
    assert(got.groupBy(_.getLong(0)).values.forall(_.length == 5))
    assert(got.forall(r => r.getLong(0) != r.getLong(1)))
    // cell containment: every returned neighbor shares one of the
    // probe's 3 nearest IVF cells (the IVF key's candidate law)
    val ivf = run("q_sim_ann_ivf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ivf re-ranks the same cell-pruned candidate set exactly, so the
    // combined index's hits on the exact set can never exceed ivf's
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(recall <= ivfRecall + 1e-9,
      s"combined $recall > cell-pruned ceiling $ivfRecall")
  }

  test("rolling corr: window re-derivation, pair domain, bounds") {
    val got = run("q_time_rolling_corr").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
    // re-derive one pair's full series from the raw daily cents
    val (t1, t2) = (got.head.getString(0), got.head.getString(1))
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("v"))
      .collect().groupBy(_.getString(0))
    def series(t: String): Map[Long, Long] = {
      val rows = daily(t).map(r =>
        r.getDate(1).toLocalDate.toEpochDay -> r.getLong(2)).toMap
      val (lo, hi) = (rows.keys.min, rows.keys.max)
      (lo to hi).map(d => d -> rows.getOrElse(d, 0L)).toMap
    }
    val (sa, sb) = (series(t1), series(t2))
    val common = (sa.keySet & sb.keySet).toSeq.sorted
    val expected = common.zipWithIndex.collect {
      case (d, i) if i >= 13 =>
        val win = common.slice(i - 13, i + 1)
        val xs = win.map(sa); val ys = win.map(sb)
        val n = BigInt(14)
        def mom(p: Seq[Long], q: Seq[Long]) =
          p.zip(q).map { case (u, w) => BigInt(u) * w }.sum
        val vx = n * mom(xs, xs) - BigInt(xs.sum) * BigInt(xs.sum)
        val vy = n * mom(ys, ys) - BigInt(ys.sum) * BigInt(ys.sum)
        d -> (if (vx > 0 && vy > 0)
          Some(BigDecimal((n * mom(xs, ys) - BigInt(xs.sum) * BigInt(ys.sum))
            .toDouble / (math.sqrt(vx.toDouble) * math.sqrt(vy.toDouble)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        else None)
    }.toMap
    val gotPair = got.filter(r =>
      r.getString(0) == t1 && r.getString(1) == t2)
    assert(gotPair.length == expected.size)
    gotPair.foreach { r =>
      val d = r.getDate(2).toLocalDate.toEpochDay
      val e = expected(d)
      if (r.isNullAt(3)) assert(e.isEmpty)
      else assert(math.abs(r.getDouble(3) - e.get) < 2e-6,
        s"day $d: ${r.getDouble(3)} vs ${e.get}")
    }
  }

  test("canonical report: conservation vs raw-text dedup per lang") {
    val rep = run("q_dedup_canonical").collect()
      .map(r => r.getString(0) -> r).toMap
    // raw-text dedup groups per lang (the q_dedup_exact frame)
    val raw = run("q_dedup_exact").collect().groupBy(_.getString(0))
    val docs = Tables.documents(spark, dir).groupBy("lang")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.keySet == docs.keySet)
    rep.foreach { case (lang, r) =>
      assert(r.getLong(1) == docs(lang))
      // canonical groups can only be coarser than raw-text groups
      val rawGroups = raw(lang).length.toLong
      assert(r.getLong(2) <= rawGroups)
      assert(r.getLong(1) - r.getLong(2) == r.getLong(3))
      assert(r.getLong(4) == 1000000L * r.getLong(3) / r.getLong(1))
      // every variant group implies canonical strictly coarser
      if (r.getLong(5) > 0) assert(r.getLong(2) < rawGroups)
    }
  }
}
