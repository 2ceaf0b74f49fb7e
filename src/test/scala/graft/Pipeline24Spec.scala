package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: round-12 batch — ALS batch scoring, the MinHashLSH
  * library twin, RFormula prep, and the KLL MAD twin. q_ml_rformula
  * is oracle-exact at the graded gate; the three no-oracle keys get
  * their graded contracts here: coverage/determinism for the batch
  * recommender, threshold-truth + candidate recall for the Jaccard
  * LSH, and the rank-band bound for the sketch median/MAD. */
class Pipeline24Spec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("als recommend-all: full coverage, rank totality, determinism") {
    val rs = run("q_ml_als_recommend_all").collect()
    val users = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey")).distinct().collect()
      .map(_.getLong(0)).toSet
    assert(rs.length == 3 * users.size,
      s"${rs.length} rows for ${users.size} rated users")
    assert(rs.map(_.getLong(0)).toSet == users, "every rated user scored")
    rs.groupBy(_.getLong(0)).foreach { case (u, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L),
        s"user $u ranks not 1..3")
      // re-rank is (score desc, part asc): scores non-increasing
      val byRank = rows.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    val again = run("q_ml_als_recommend_all").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  /** Distinct 3-shingle sets per doc, the LSH keys' ground truth. */
  private def shingleSets(): Map[Long, Set[String]] =
    operators.TextOps.shingles(spark, dir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getString(1)).toSet).toMap

  test("minhash lsh: threshold truth, determinism, recall vs exact Jaccard") {
    val rs = run("q_sim_minhash_lsh").collect()
    assert(rs.nonEmpty)
    // threshold truth: every emitted pair is within the 0.5 distance bar
    assert(rs.forall(_.getLong(2) <= 500000L))
    assert(rs.forall(r => r.getLong(0) < r.getLong(1)))
    val again = run("q_sim_minhash_lsh").collect()
    assert(rs.map(_.toString).toSeq == again.map(_.toString).toSeq)
    // candidate recall vs brute-force exact-set Jaccard >= 0.5 truth
    val sets = shingleSets()
    val ids = sets.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = sets(ids(i)); b = sets(ids(j))
      inter = a.intersect(b).size
      if inter * 2 >= a.size + b.size - inter // J = i/(|a|+|b|-i) >= 0.5
    } yield (ids(i), ids(j))).toSet
    val got = rs.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.count(got).toDouble / math.max(truth.size, 1)
    assert(recall >= 0.8, s"LSH recall $recall below 0.8 " +
      s"(${truth.size} true pairs)")
    // emitted distance is the exact set-Jaccard distance (hashed-index
    // collisions at 2^18 bins can only nudge it, never past 1e-2)
    rs.foreach { r =>
      val a = sets(r.getLong(0)); val b = sets(r.getLong(1))
      val j = a.intersect(b).size.toDouble / a.union(b).size
      assert(math.abs(r.getLong(2) / 1e6 - (1 - j)) < 0.01)
    }
  }

  test("rformula: layout [cents, onehot(0..3), name_len], numeric label") {
    val rs = run("q_ml_rformula").collect()
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey"), col("c_mktsegment"),
      expr("cast(round(c_acctbal * 100) as bigint)"),
      length(col("c_name")).cast("long"),
      (col("c_acctbal") > 0).cast("long")).collect()
    assert(rs.length == cust.length)
    // StringIndexer order: frequency desc, value asc
    val sidx = cust.groupBy(_.getString(1)).view.mapValues(_.size).toSeq
      .sortBy { case (v, c) => (-c, v) }.map(_._1).zipWithIndex.toMap
    val expected = cust.map { r =>
      val oh = (0 until 4).map(i =>
        if (sidx(r.getString(1)) == i) "1" else "0")
      r.getLong(0) ->
        ((r.getLong(2) +: oh :+ r.getLong(3)).mkString(","), r.getLong(4))
    }.toMap
    rs.foreach { r =>
      val (feats, lab) = expected(r.getLong(0))
      assert(r.getString(1) == feats,
        s"custkey ${r.getLong(0)}: ${r.getString(1)} != $feats")
      assert(r.getLong(2) == lab)
    }
  }

  test("index-to-string: lossless round-trip, frequency-desc codes") {
    val rs = run("q_ml_index_to_string").collect()
    assert(rs.length == Tables.customer(spark, dir).count())
    assert(rs.forall(_.getBoolean(4)), "IndexToString must invert exactly")
    assert(rs.forall(r => r.getString(1) == r.getString(3)))
    // codes are the (frequency desc, value asc) rank — same contract
    // the oracle pins; re-derive independently to keep the ring honest
    val sidx = rs.groupBy(_.getString(1)).view.mapValues(_.size).toSeq
      .sortBy { case (v, c) => (-c, v) }.map(_._1).zipWithIndex.toMap
    assert(rs.forall(r => r.getLong(2) == sidx(r.getString(1)).toLong))
  }

  test("mad kll: rank-band contract vs the true group values") {
    val eps = 0.05 // k=200 normalized rank error is ~1.3%; 5% is safe
    val vals = Tables.orders(spark, dir)
      .select(col("o_orderstatus"),
        col("o_totalprice").cast("double")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rs = run("q_agg_mad_kll").collect()
    assert(rs.length == vals.size)
    def rankBand(xs: Seq[Double], q: Double, target: Double,
        n: Int): Unit = {
      val below = xs.count(_ < q)
      val atOrBelow = xs.count(_ <= q)
      assert(below <= target + eps * n && atOrBelow >= target - eps * n,
        s"quantile $q rank [$below, $atOrBelow] outside " +
          s"${target - eps * n}..${target + eps * n}")
    }
    rs.foreach { r =>
      val xs = vals(r.getString(0))
      val n = xs.size
      assert(r.getLong(1) == n.toLong)
      val med = r.getDouble(2)
      rankBand(xs, med, n / 2.0, n)
      // MAD pass is anchored at the SKETCH median — recompute the
      // deviation population from it, then band-check the sketch MAD
      val ads = xs.map(x => math.abs(x - med))
      rankBand(ads, r.getDouble(3), n / 2.0, n)
    }
  }
}
