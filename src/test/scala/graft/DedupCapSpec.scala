package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2 (VERDICT r15 #7): the hot-band cap on the MinHash band
  * join. Pins: cap=MaxValue is byte-identical to the uncapped path
  * (recall unchanged), an honest cap (1024) leaves the fixture
  * untouched, and a hostile cap provably bounds the per-bucket pair
  * expansion while RETURNING what it skipped (no silent caps). */
class DedupCapSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private lazy val sig = graft.api.Dedup.minhashSignatures(
      operators.TextOps.shingles(spark, dir), "doc_id",
      operators.TextOps.permTable)
    .localCheckpoint(true)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("cap=MaxValue: identical pairs to the uncapped join, empty skip frame") {
    val base = pairSet(
      graft.api.Dedup.minhashCandidates(sig, "doc_id", minMatches = 8))
    val (pairs, skipped) = graft.api.Dedup.minhashCandidatesCapped(
      sig, "doc_id", minMatches = 8, maxBucket = Int.MaxValue)
    assert(pairSet(pairs) == base)
    assert(skipped.count() == 0L)
    assert(base.nonEmpty, "fixture produces >=8-band candidates")
  }

  test("cap=1024: fixture recall unchanged (no bucket that hot exists)") {
    val base = pairSet(
      graft.api.Dedup.minhashCandidates(sig, "doc_id", minMatches = 8))
    val (pairs, skipped) = graft.api.Dedup.minhashCandidatesCapped(
      sig, "doc_id", minMatches = 8, maxBucket = 1024)
    assert(pairSet(pairs) == base)
    assert(skipped.count() == 0L)
  }

  test("hostile cap: expansion bounded, skipped buckets reported, subset holds") {
    // find a cap small enough to actually trip on the fixture
    val sizes = sig.groupBy("perm", "minh").agg(count(lit(1)).as("n"))
      .agg(max("n")).head.getLong(0)
    assert(sizes > 2, "fixture has a bucket with >2 members")
    val cap = 2
    val (pairs, skipped) = graft.api.Dedup.minhashCandidatesCapped(
      sig, "doc_id", minMatches = 1, maxBucket = cap)
    val skippedRows = skipped.collect()
    assert(skippedRows.nonEmpty, "the cap must report what it excluded")
    assert(skippedRows.forall(_.getLong(2) > cap))
    // every surviving bucket contributes at most cap*(cap-1)/2 pairs:
    // total pair-slots (sum of matches) is bounded by n_buckets_kept
    // times that — the quadratic term is provably capped
    val keptBuckets = sig.groupBy("perm", "minh")
      .agg(count(lit(1)).as("n")).where(col("n") <= cap && col("n") > 1)
      .count()
    val totalMatches = pairs.agg(sum("matches")).head.getLong(0)
    assert(totalMatches <= keptBuckets * cap * (cap - 1) / 2)
    // capped pairs are a subset of uncapped pairs at the same threshold
    val uncapped = graft.api.Dedup
      .minhashCandidates(sig, "doc_id", minMatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
  }
}
