package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Ring 2 property tests (SURVEY.md §5) — pure-Scala checks of the
  * arithmetic cores shared with the oracle SQL (no SparkSession: these
  * pin ALGEBRA, the Spark specs pin execution). */
object PropertySpec extends Properties("graft.arithmetic") {

  private val P = 2147483647L
  private def minhashSlot(ids: Set[Long], a: Long, b: Long): Long =
    ids.map(id => (a * id + b) % P).min

  private val idSet: Gen[Set[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 1000000L)).map(_.toSet)

  // MinHash is a semilattice hom: slot(A ∪ B) == min(slot(A), slot(B))
  // for every permutation — the property that makes signatures
  // mergeable across partitions (map-side combine correctness).
  property("minhash slot distributes over union") =
    forAll(idSet, idSet) { (xs, ys) =>
      operators.TextOps.permTable.forall { case (_, a, b) =>
        minhashSlot(xs ++ ys, a, b) ==
          math.min(minhashSlot(xs, a, b), minhashSlot(ys, a, b))
      }
    }

  // Permutation constants must actually permute: two distinct ids map
  // to distinct hashes (a coprime to P, which is prime).
  property("minhash permutations are injective on ids") =
    forAll(Gen.chooseNum(1L, 1000000L), Gen.chooseNum(1L, 1000000L)) { (x, y) =>
      x == y || operators.TextOps.permTable.forall { case (_, a, b) =>
        (a * x + b) % P != (a * y + b) % P
      }
    }

  private def jaccard(a: Set[Long], b: Set[Long]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a & b).size.toDouble / (a | b).size

  property("jaccard: bounded, symmetric, self = 1") =
    forAll(idSet, idSet) { (a, b) =>
      val j = jaccard(a, b)
      j >= 0.0 && j <= 1.0 && j == jaccard(b, a) && jaccard(a, a) == 1.0
    }

  // Karp-Rabin power table is consistent: pow(i+1) = pow(i)*B mod P'.
  property("fingerprint power table telescopes") = Prop {
    val pt = operators.ExtraText.powTable
    (0 until pt.size - 1).forall(i => pt(i + 1) == pt(i) * 131L % 1000000007L)
  }

  // Sessionization algebra: session count == 1 + #(gaps >= G) for a
  // sorted event sequence — the invariant both session_window and the
  // lag-gap oracle implement.
  property("session count = 1 + gaps >= G") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000L)), Gen.chooseNum(1L, 2000L)) {
      (ts, gap) =>
        val sorted = ts.sorted
        val gaps = sorted.zip(sorted.tail).map { case (a, b) => b - a }
        val expected = 1 + gaps.count(_ >= gap)
        // reference sessionizer (cumulative new-session markers)
        val marks = true +: sorted.zip(sorted.tail).map { case (a, b) => b - a >= gap }
        marks.count(identity) == expected
    }

  // ppm integer ratios: exact, order-free, and within 1 ulp of the
  // real ratio — the §2.0.2 replacement for ROUND(double).
  property("ppm ratio exact within 1/1e6") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1L, 1000000L)) { (num, den) =>
      val ppm = (1000000L * num) / den
      val real = num.toDouble / den
      ppm <= real * 1000000 + 1e-6 && ppm >= real * 1000000 - 1
    }

  // polyHash (the distributed id-assignment hash): the Horner fold
  // equals the positional polynomial sum c_i * 131^(n-i) mod p — the
  // algebra both the Spark `aggregate` lambda and the DuckDB
  // list_reduce twin implement.
  private def polyHashScala(s: String): Long =
    s.foldLeft(0L)((a, c) => (a * 131 + c.toInt) % 1000000007L)
  property("polyHash fold == positional polynomial, range-bounded") =
    forAll(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)) { s =>
      val p = 1000000007L
      val positional = s.zipWithIndex.map { case (c, i) =>
        var pw = 1L
        (0 until (s.length - 1 - i)).foreach(_ => pw = pw * 131 % p)
        c.toInt * pw % p
      }.foldLeft(0L)((a, b) => (a + b) % p)
      val h = polyHashScala(s)
      h == positional && h >= 0 && h < p
    }
  // Cross-engine pin: this exact constant was probed identical from
  // DuckDB's list_reduce fold (round 3) — if the Scala fold drifts,
  // the Spark/DuckDB twin contract is broken.
  property("polyHash cross-engine known answer") = Prop {
    polyHashScala("big data query") == 41016958L
  }

  // graft_dot interpreted eval == ascending-order left fold, BIT-exact
  // (the codegen path is pinned by VectorExprsSpec; this pins the
  // eval/codegen-equivalence contract on the interpreted side).
  private val dblArray: Gen[List[Double]] =
    Gen.listOfN(16, Gen.chooseNum(-100.0, 100.0))
  property("graft_dot eval == ascending fold (bit-exact)") =
    forAll(dblArray, dblArray) { (xs, ys) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val dot = functions.ArrayDot(
        Literal.create(xs, ArrayType(DoubleType)),
        Literal.create(ys, ArrayType(DoubleType))).eval(null)
      val expect = xs.zip(ys).map { case (a, b) => a * b }
        .foldLeft(0.0)(_ + _)
      java.lang.Double.doubleToLongBits(dot.asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(expect)
    }

  // The z-order term sum (Rel.zorderValue / zorderSql share this exact
  // div/% arithmetic) is a BIJECTION [0,2^b)² -> [0,4^b): deinterleave
  // recovers both inputs — the property that makes min/max pruning on
  // either dimension sound after z-sorting.
  private def zMirror(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      ((x / (1L << i)) % 2) * (1L << (2 * i)) +
        ((y / (1L << i)) % 2) * (1L << (2 * i + 1))
    }.sum
  property("zorder term sum round-trips (bijection)") =
    forAll(Gen.chooseNum(0L, 65535L), Gen.chooseNum(0L, 65535L)) { (x, y) =>
      val z = zMirror(x, y, 16)
      val xBack = (0 until 16).map(i => ((z / (1L << (2 * i))) % 2) << i).sum
      val yBack = (0 until 16).map(i => ((z / (1L << (2 * i + 1))) % 2) << i).sum
      z >= 0 && z < (1L << 32) && xBack == x && yBack == y
    }

  // Banded prefix sum (Pipeline12 gini/auc, Pipeline13 ks/balanced,
  // api.Sample.ppsSystematic): for ANY monotone band function,
  // band-offset + within-band local cumsum == the global cumsum.
  private val wList: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 10000L),
      Gen.chooseNum(1L, 100L)))
  property("banded prefix sum equals global cumsum for monotone bands") =
    forAll(wList, Gen.chooseNum(1L, 512L)) { (kw0, width) =>
      val kw = kw0.distinctBy(_._1).sortBy(_._1)
      val globalCum = kw.scanLeft(0L)(_ + _._2).tail
      val byBand = kw.groupBy { case (k, _) => k / width }
      val offsets = byBand.map { case (b, _) =>
        b -> byBand.filter(_._1 < b).values.flatten.map(_._2).sum
      }
      val banded = kw.map { case (k, w) =>
        val b = k / width
        offsets(b) + byBand(b).takeWhile(_._1 <= k).map(_._2).sum
      }
      banded == globalCum
    }

  // Lower weighted median (Pipeline12.aggWeightedMedian): the defining
  // mass property — strictly-below mass < half, up-to mass >= half —
  // plus quartile ordering, on any positive-weight multiset.
  property("weighted median mass property and quartile order") =
    forAll(wList) { kw0 =>
      val kw = kw0.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toList.sortBy(_._1)
      val tot = kw.map(_._2).sum
      val cum = kw.scanLeft(0L)(_ + _._2).tail
      def pick(mult: Long, of: Long): Long =
        kw.zip(cum).collectFirst {
          case ((v, _), c) if c * mult >= of => v }.get
      val (q1, med, q3) = (pick(4, tot), pick(2, tot), pick(4, 3 * tot))
      val below = kw.takeWhile(_._1 < med).map(_._2).sum
      val upto = kw.takeWhile(_._1 <= med).map(_._2).sum
      q1 <= med && med <= q3 && below * 2 < tot && upto * 2 >= tot
    }

  // Rank-sum AUC (Pipeline12.mlAuc): the grouped-score identity
  // Σ np_s(2·cum_nn + nn_s) equals 2·concordant + ties counted over
  // raw pairs — the Mann-Whitney U with exact tie handling.
  private val scoreList: Gen[List[(Long, Boolean)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(-50L, 50L), Gen.oneOf(true, false)))
  property("grouped rank-sum U2 equals pairwise 2*concordant + ties") =
    forAll(scoreList) { xs =>
      val pos = xs.filter(_._2).map(_._1)
      val neg = xs.filterNot(_._2).map(_._1)
      val direct = (for (p <- pos; n <- neg) yield
        if (p > n) 2L else if (p == n) 1L else 0L).sum
      val grouped = xs.groupBy(_._1).toList.sortBy(_._1)
      val nn = grouped.map { case (_, g) => g.count(!_._2).toLong }
      val cumPrev = nn.scanLeft(0L)(_ + _).init
      val u2 = grouped.zip(cumPrev).map { case (((_, g)), c) =>
        val np = g.count(_._2).toLong
        val nns = g.count(!_._2).toLong
        np * (2 * c + nns)
      }.sum
      u2 == direct
    }

  // Gini numerator bounds (Pipeline12.aggGini): for ascending positive
  // x with rank i, 0 <= 2Σi·x − (n+1)Σx < n·Σx  ⇒  gini_ppm ∈ [0, 1e6).
  property("gini numerator within [0, n*sum)") =
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(1L, 100000L))) { xs0 =>
      val xs = xs0.sorted
      val n = xs.size.toLong
      val sx = xs.sum
      val six = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val num = 2 * six - (n + 1) * sx
      num >= 0 && num < n * sx
    }

  // Reference implementation of api.Ml.rankingMetricsAt5's integer
  // arithmetic (the ×60 AP lcm trick + the literal DCG weight table),
  // shared invariants with the Spark projection and the SQL twin.
  private def rankMetrics(hits: Seq[Boolean], nRel: Long): (Long, Long, Long) = {
    val w = api.Ml.dcgWeightsMillionths
    val idcg = api.Ml.idcgPrefixMillionths
    val cums = hits.scanLeft(0L)((a, h) => a + (if (h) 1 else 0)).tail
    val nHits = cums.last
    val apNum = hits.zipWithIndex.collect {
      case (true, i) => cums(i) * (60L / (i + 1))
    }.sum
    val dcg = hits.zipWithIndex.collect { case (true, i) => w(i) }.sum
    val k = math.min(5L, nRel)
    (1000000L * nHits / 5L,
      1000000L * apNum / (60L * k),
      1000000L * dcg / idcg(k.toInt - 1))
  }

  private val hitVec: Gen[Seq[Boolean]] =
    Gen.listOfN(5, Gen.oneOf(true, false)).map(_.toSeq)

  property("ranking metrics: ppm-bounded, perfect prefix saturates AP/NDCG") =
    forAll(hitVec, Gen.chooseNum(1L, 50L)) { (hits0, extra) =>
      val nRel = math.max(hits0.count(identity).toLong, 1L) + extra - 1
      val (p, ap, nd) = rankMetrics(hits0, nRel)
      val bounded = Seq(p, ap, nd).forall(v => v >= 0 && v <= 1000000L)
      // all of the first min(5, nRel) slots hit, nothing ranked after
      // a miss: AP and NDCG are definitionally perfect
      val k = math.min(5L, nRel).toInt
      val perfect = rankMetrics(
        Seq.tabulate(5)(_ < k), nRel)
      bounded && perfect._2 == 1000000L && perfect._3 == 1000000L
    }

  property("ranking metrics: a hit never hurts (monotone in hits)") =
    forAll(hitVec, Gen.chooseNum(0, 4), Gen.chooseNum(1L, 50L)) {
      (hits, flip, extra) =>
      val nRel0 = hits.count(identity).toLong + extra
      val flipped = hits.updated(flip, true)
      val nRel1 = math.max(nRel0, flipped.count(identity).toLong)
      val (p0, ap0, nd0) = rankMetrics(hits, nRel1)
      val (p1, ap1, nd1) = rankMetrics(flipped, nRel1)
      p1 >= p0 && ap1 >= ap0 && nd1 >= nd0
    }

  property("DCG weight table: strictly decreasing, prefixes telescope") = Prop {
    val w = api.Ml.dcgWeightsMillionths
    val pre = api.Ml.idcgPrefixMillionths
    w.zip(w.tail).forall { case (a, b) => a > b } &&
      pre.head == w.head &&
      pre.zip(pre.tail).zip(w.tail).forall { case ((a, b), wi) => b - a == wi }
  }

  // The r10 sign-safe division split used by kappa/silhouette/vec
  // means: `case when s >= 0 then s div n else -((-s) div n) end`.
  // With non-negative operands Spark `div` and DuckDB `//` agree
  // (both floor = truncate there), so the split implements EXACT
  // truncation-toward-zero for signed numerators on BOTH engines —
  // this property pins that it equals JVM integer division.
  property("sign-safe floor-div split equals truncating division") =
    forAll(Gen.chooseNum(-1000000L, 1000000L), Gen.chooseNum(1L, 9999L)) {
      (s, n) =>
      val split = if (s >= 0) s / n else -((-s) / n)
      split == s / n
    }

  // Silhouette moment identity: Σ_{y∈C} ||x−y||² over a finite set
  // equals |C|·||x||² − 2·x·S + Σ||y||² — the algebra that lets the
  // evaluator run without a pairwise join (api.Ml.silhouettePpm).
  private val vecGen: Gen[List[Long]] =
    Gen.listOfN(4, Gen.chooseNum(-64L, 63L))
  property("silhouette moment identity: pair sum == moment form") =
    forAll(vecGen, Gen.nonEmptyListOf(vecGen)) { (x, cluster) =>
      val pairSum = cluster.map(y =>
        x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum).sum
      val n = cluster.length.toLong
      val normX = x.map(v => v * v).sum
      val s = x.indices.map(i => cluster.map(_(i)).sum)
      val dot = x.zip(s).map { case (a, b) => a * b }.sum
      val ssq = cluster.map(_.map(v => v * v).sum).sum
      pairSum == n * normX - 2 * dot + ssq
    }

  // k-fold complement identity: the leave-fold-out mean computed from
  // the totals frame equals the mean computed directly over the other
  // folds' rows (q_ml_kfold_metrics' two-scan trick).
  property("kfold complement identity: totals-derived LOO mean is exact") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 4L),
        Gen.chooseNum(0L, 1000000L)))) { rows =>
      val folds = rows.map(_._1).distinct
      folds.size < 2 || folds.forall { f =>
        val others = rows.filterNot(_._1 == f).map(_._2)
        val (tot, n) = (rows.map(_._2).sum, rows.length.toLong)
        val (ft, fn) = (rows.filter(_._1 == f).map(_._2).sum,
          rows.count(_._1 == f).toLong)
        (tot - ft) / (n - fn) == others.sum / others.length
      }
    }

  // Cohen's kappa core: with exact integer moments, the sign of
  // n·Σtp − Σ(n_a·n_p) matches the sign of po − pe and the ratio is
  // bounded by 1 (kappa ≤ 1 with equality iff diagonal-perfect).
  private val confGen: Gen[List[((Long, Long), Long)]] =
    Gen.nonEmptyListOf(Gen.zip(
      Gen.zip(Gen.chooseNum(0L, 4L), Gen.chooseNum(0L, 4L)),
      Gen.chooseNum(1L, 100L)))
  property("kappa moments: bounded by 1, sign matches po-pe margin") =
    forAll(confGen) { cells0 =>
      val cells = cells0.groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val n = cells.values.sum
      val na = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val np = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val stp = cells.collect { case ((a, p), c) if a == p => c }.sum
      val snanp = (na.keySet ++ np.keySet).toList.map(k =>
        na.getOrElse(k, 0L) * np.getOrElse(k, 0L)).sum
      val num = n * stp - snanp     // ∝ po − pe
      val den = n * n - snanp       // > 0 unless degenerate
      den <= 0 || (num <= den &&
        ((num >= 0) == (stp * n * n >= snanp * n)))
    }
}
