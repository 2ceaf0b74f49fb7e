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
}
