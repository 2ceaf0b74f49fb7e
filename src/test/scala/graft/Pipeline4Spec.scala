package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract tests for the round-6 pipeline additions (chunk dedup,
  * funnel, collocations, temperature mixture, PSI drift) on SYNTHETIC
  * frames — fixture correctness is covered by the oracle gate; this
  * ring pins the API semantics a user relies on. */
class Pipeline4Spec extends AnyFunSuite {
  private def spark = TestSpark.spark

  test("Dedup.chunkDedup: first occurrence survives, repeats dropped") {
    val sp = spark
    import sp.implicits._
    // 4-word chunks; doc 1 = A B (two distinct chunks); doc 2 repeats
    // chunk A then adds its own C; doc 3 is exactly chunk A.
    val a = "w1 w2 w3 w4"
    val b = "x1 x2 x3 x4"
    val c = "y1 y2 y3 y4"
    val docs = Seq((1L, s"$a $b"), (2L, s"$a $c"), (3L, a))
      .toDF("id", "body")
    val r = api.Dedup.chunkDedup(docs, "id", "body", 4)
      .orderBy("id").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 2L, 1L)) // n_chunks
    assert(r.map(_.getLong(2)).toSeq == Seq(2L, 1L, 0L)) // n_kept
    assert(r(1).getLong(3) == 500000L)                   // kept_ppm
  }

  test("Events.funnel: strictly-ordered first-qualifying semantics") {
    val sp = spark
    import sp.implicits._
    def t(s: Int) = new Timestamp(s * 1000L)
    // u1 completes a->b->c in order; u2 does b before a (b must NOT
    // count, its only b is before its first a); u3 stops after a->b;
    // u4 never does a.
    val ev = Seq(
      (1L, t(1), "a"), (1L, t(2), "b"), (1L, t(3), "c"),
      (2L, t(5), "b"), (2L, t(6), "a"),
      (3L, t(1), "a"), (3L, t(4), "b"),
      (4L, t(2), "b"), (4L, t(3), "c"))
      .toDF("user", "ts", "etype")
    val r = api.Events.funnel(ev, "user", "ts", "etype", Seq("a", "b", "c"))
      .orderBy("step").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L)) // users per step
    assert(r(0).getLong(3) == 1000000L)
    assert(r(1).getLong(3) == 666666L) // 2/3 of step-1 users
    assert(r(2).getLong(3) == 500000L)
  }

  test("Text.collocations: always-adjacent pair beats half-adjacent pair") {
    val sp = spark
    import sp.implicits._
    // "zz qq" adjacent in every doc; "aa bb" adjacent in half the docs
    // with the same unigram counts — PMI must rank them accordingly:
    // pmi(zz,qq) - pmi(aa,bb) = ln(20/10), counts cancel.
    val docs = (1 to 20).map { i =>
      val mid = if (i % 2 == 0) "aa bb cc dd" else "aa cc bb dd"
      (i.toLong, s"zz qq $mid")
    }.toDF("id", "body")
    val r = api.Text.collocations(docs, "id", "body", minCount = 3L, k = 50)
      .collect()
    val byPair = r.map(x => ((x.getString(0), x.getString(1)),
      x.getDouble(3))).toMap
    assert(byPair.contains(("zz", "qq")) && byPair.contains(("aa", "bb")))
    val diff = byPair(("zz", "qq")) - byPair(("aa", "bb"))
    assert(math.abs(diff - math.log(2.0)) < 1e-3,
      s"PMI gap must be ln(2): $byPair")
  }

  test("Sample.temperatureCap: sqrt quotas, deterministic, nested order") {
    val sp = spark
    import sp.implicits._
    // strata sizes 100 / 25: raw ratio 4:1, sqrt ratio 2:1 — the tail
    // stratum gets upweighted relative to proportional sampling.
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
      (101 to 125).map(i => (i.toLong, "small"))).toDF("id", "g")
    val r = api.Sample.temperatureCap(df, "g", "id", total = 30L)
    val counts = r.groupBy("g").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    // wgt = floor(sqrt(100)) = 10, floor(sqrt(25)) = 5, sum 15
    // k(big) = 30*10 div 15 = 20; k(small) = 30*5 div 15 = 10
    assert(counts == Map("big" -> 20L, "small" -> 10L))
    val again = api.Sample.temperatureCap(df, "g", "id", total = 30L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == r.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("Profile.drift: matching side ~0, shifted side dominates") {
    val sp = spark
    import sp.implicits._
    // side "same" mirrors the pooled shape; side "hi" is shifted up.
    val rows = (1 to 200).map(i => ("same", (i % 100) * 1.0)) ++
      (1 to 200).map(i => ("hi", 50.0 + (i % 50)))
    val df = rows.toDF("s", "v")
    val r = api.Profile.drift(df, "s", "v", 10).collect()
    val bySide = r.groupBy(_.getString(0))
      .map { case (k, v) => k -> v.map(x => math.abs(x.getDouble(3))).sum }
    assert(bySide("hi") > bySide("same") * 2,
      s"shifted side must carry the PSI mass: $bySide")
    assert(r.length == 20) // dense 2 sides x 10 buckets
  }

  test("Profile.keySkew: exact discrete percentiles from the histogram") {
    val sp = spark
    import sp.implicits._
    // group sizes: keys 1,2 -> 1 row; keys 3,4,5 -> 2 rows; key 6 -> 10.
    // histogram {1:2, 2:3, 10:1}, cum {1->2, 2->5, 10->6};
    // p50 = min cnt with cumk >= ceil(.5*6)=3 -> 2;
    // p99 = min cnt with cumk >= ceil(.99*6)=6 -> 10.
    val rows = Seq(1L, 2L).map((_, "x")) ++
      Seq(3L, 4L, 5L).flatMap(k => Seq((k, "x"), (k, "y"))) ++
      (1 to 10).map(_ => (6L, "z"))
    val r = api.Profile.keySkew(rows.toDF("k", "pay"), "k").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(row.fieldIndex("n_keys")) == 6L)
    assert(row.getLong(row.fieldIndex("n_rows")) == 18L)
    assert(row.getLong(row.fieldIndex("max_cnt")) == 10L)
    assert(row.getLong(row.fieldIndex("p50_cnt")) == 2L)
    assert(row.getLong(row.fieldIndex("p99_cnt")) == 10L)
    assert(row.getLong(row.fieldIndex("top_key")) == 6L)
    // max/mean ppm = 1000000 * 10 * 6 div 18
    assert(row.getLong(row.fieldIndex("skew_ratio_ppm")) == 3333333L)
  }

  test("Ml.leakageSafeSplit: cluster members share a split; singletons hash") {
    val sp = spark
    import sp.implicits._
    val docs = (1L to 400L).map(i => (i, s"doc$i")).toDF("id", "body")
    // two planted clusters: {3, 250, 399} labeled 3 and {10, 11} labeled 10
    val clusters = Seq((3L, 3L), (250L, 3L), (399L, 3L), (10L, 10L),
      (11L, 10L)).toDF("node", "label")
    val r = api.Ml.leakageSafeSplit(docs, "id", clusters)
    // invariant: no rep maps to more than one split
    val spans = r.groupBy("rep")
      .agg(countDistinct("split").as("n")).where(col("n") > 1).count()
    assert(spans == 0L)
    // planted cluster members share their representative's split
    val byId = r.select("id", "rep", "split").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(Seq(3L, 250L, 399L).map(byId).distinct.size == 1)
    assert(byId(250L)._1 == 3L)
    assert(Seq(10L, 11L).map(byId).distinct.size == 1)
    // singleton reps are their own id; all three splits are populated
    assert(byId(42L)._1 == 42L)
    val sizes = r.groupBy("split").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(sizes.keySet == Set("train", "val", "test"))
    assert(sizes("train") > sizes("val") && sizes("train") > sizes("test"))
    // deterministic across reruns
    val again = api.Ml.leakageSafeSplit(docs, "id", clusters)
      .select("id", "split").collect().map(x => (x.getLong(0), x.getString(1)))
    assert(again.toSet == r.select("id", "split").collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet)
  }

  test("Profile.joinCardinality: estimate equals the executed join size") {
    val sp = spark
    import sp.implicits._
    // a: key 1 x3, key 2 x2, key 9 x1; b: key 1 x4, key 2 x1, key 7 x5
    val a = (Seq.fill(3)(1L) ++ Seq.fill(2)(2L) ++ Seq(9L)).toDF("ka")
    val b = (Seq.fill(4)(1L) ++ Seq(2L) ++ Seq.fill(5)(7L)).toDF("kb")
    val r = api.Profile.joinCardinality(a, "ka", b, "kb").collect()(0)
    assert(r.getLong(r.fieldIndex("n_keys_a")) == 3L)
    assert(r.getLong(r.fieldIndex("n_keys_b")) == 3L)
    assert(r.getLong(r.fieldIndex("n_keys_common")) == 2L)
    // shared keys: 1 -> 3*4 = 12, 2 -> 2*1 = 2
    assert(r.getLong(r.fieldIndex("join_rows")) == 14L)
    assert(r.getLong(r.fieldIndex("max_key_rows")) == 12L)
    assert(r.getLong(r.fieldIndex("top_key")) == 1L)
    assert(r.getLong(r.fieldIndex("top_key_share_ppm")) == 857142L)
    // the estimate IS the executed join's cardinality
    assert(a.join(b, col("ka") === col("kb")).count() == 14L)
  }

  test("Events.funnel: empty step reports 0 conversion, not 100%") {
    val sp = spark
    import sp.implicits._
    def t(s: Int) = new Timestamp(s * 1000L)
    // u1 does a then c but never b: step b has 0 users, and step c's
    // conv_from_prev must be 0 — the (0 div 0) -> NULL case a blanket
    // coalesce used to report as 1000000 (ADVICE r6).
    val ev = Seq((1L, t(1), "a"), (1L, t(2), "c")).toDF("user", "ts", "etype")
    val r = api.Events.funnel(ev, "user", "ts", "etype", Seq("a", "b", "c"))
      .orderBy("step").collect()
    assert(r.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L))
    assert(r.map(_.getLong(3)).toSeq == Seq(1000000L, 0L, 0L))
  }

  test("Profile.joinCardinality: disjoint key sets -> zero common, NULL max") {
    val sp = spark
    import sp.implicits._
    val a = Seq(1L, 2L).toDF("ka")
    val b = Seq(3L).toDF("kb")
    val r = api.Profile.joinCardinality(a, "ka", b, "kb").collect()(0)
    assert(r.getLong(r.fieldIndex("n_keys_a")) == 2L)
    assert(r.getLong(r.fieldIndex("n_keys_b")) == 1L)
    // the final row derives from the 1-row totals frame, so no-overlap
    // yields 0 shared keys (not an all-NULL row from an empty agg)
    assert(r.getLong(r.fieldIndex("n_keys_common")) == 0L)
    assert(r.isNullAt(r.fieldIndex("join_rows")))
    assert(r.isNullAt(r.fieldIndex("max_key_rows")))
    assert(r.isNullAt(r.fieldIndex("top_key")))
  }

  test("Text.invertedIndex: df band, bounded sorted postings") {
    val sp = spark
    import sp.implicits._
    // "rare" in docs 2,5; "mid" in 1,2,3; "stop" in all 6 docs.
    val docs = Seq(
      (1L, "mid stop"), (2L, "rare mid stop"), (3L, "mid stop stop"),
      (4L, "stop"), (5L, "rare stop"), (6L, "stop only")).toDF("id", "body")
    val r = api.Text.invertedIndex(docs, "id", "body", minDf = 2L,
        maxDf = 3L).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r.keySet == Set("rare", "mid")) // stop (df 6) and only (df 1) out
    assert(r("rare") == ((2L, "2,5")))
    assert(r("mid") == ((3L, "1,2,3")))
  }

  test("Text.blocklistHits/Filter: hits counted, survivors complementary") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "aa bb"), (2L, "bad aa"), (3L, "bad bad worse"),
      (4L, "clean")).toDF("id", "body")
    val block = Seq("bad", "worse").toDF("word")
    val hits = api.Text.blocklistHits(docs, "id", "body", block).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(hits == Map(2L -> ((1L, "bad")), 3L -> ((3L, "bad"))))
    val kept = api.Text.blocklistFilter(docs, "id", "body", block)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L)) // hit docs and survivors partition the corpus
  }

  test("Profile.shardBalance: totals conserved, hash formula pinned") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 64L).map(i => (i, 10L)).toDF("id", "w")
    val rows = api.Profile.shardBalance(df, "id", "w", 4).collect()
    assert(rows.map(_.getLong(1)).sum == 64L)  // every row landed somewhere
    assert(rows.map(_.getLong(2)).sum == 640L) // weight conserved
    assert(rows.map(_.getLong(0)).toSet.subsetOf((0L until 4L).toSet))
    // share_ppm sums to 1e6 modulo per-shard floor rounding
    val ppm = rows.map(_.getLong(3)).sum
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length)
    // the assignment is the documented multiplicative hash
    val expected = (1L to 64L).groupBy(i =>
      ((i * 1103515245L + 12345L) % 1000000007L) % 4L).view.mapValues(_.size)
    rows.foreach { x =>
      assert(x.getLong(1) == expected(x.getLong(0)).toLong) }
  }

  test("Profile.trimmedMean: outlier excluded, hand-computed bounds") {
    val sp = spark
    import sp.implicits._
    // group "g": values 1..20 plus an outlier 1000. n = 21,
    // lo rank = ceil(.05*21) = 2 -> 2.00, hi rank = ceil(.95*21) = 20
    // -> 20.00; kept 2..20 (19 rows), mean = (2+..+20)/19 = 209/19.
    val df = ((1 to 20).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
      .toDF("grp", "v")
    val r = api.Profile.trimmedMean(df, "grp", "v").collect()(0)
    assert(r.getLong(r.fieldIndex("n")) == 21L)
    assert(r.getLong(r.fieldIndex("lo_cents")) == 200L)
    assert(r.getLong(r.fieldIndex("hi_cents")) == 2000L)
    assert(r.getLong(r.fieldIndex("n_kept")) == 19L)
    assert(math.abs(r.getDouble(r.fieldIndex("trimmed_mean"))
      - 209.0 / 19.0) < 1e-6)
  }

  test("Profile.trimmedMean approx: KLL bounds within the rank band") {
    val sp = spark
    import sp.implicits._
    // 2000 distinct values per group: value i has true rank i/2000, so
    // the KLL bound's quality is directly readable off the value. Two
    // groups prove the bounds are computed per group.
    val df = ((1 to 2000).map(i => ("g1", i.toDouble)) ++
      (1 to 1000).map(i => ("g2", 10.0 * i))).toDF("grp", "v")
    val rows = api.Profile.trimmedMean(df, "grp", "v", approx = true)
      .collect().map(r => r.getString(r.fieldIndex("grp")) -> r).toMap
    val g1 = rows("g1")
    assert(g1.getLong(g1.fieldIndex("n")) == 2000L)
    // k=200 normalized rank error ~1.65%; assert a 3% band. lo targets
    // rank .05 -> value in [.02, .08]*2000; hi targets .95.
    val lo1 = g1.getLong(g1.fieldIndex("lo_cents")) / 100.0
    val hi1 = g1.getLong(g1.fieldIndex("hi_cents")) / 100.0
    assert(lo1 >= 2000 * 0.02 && lo1 <= 2000 * 0.08, s"lo rank off: $lo1")
    assert(hi1 >= 2000 * 0.92 && hi1 <= 2000 * 0.98, s"hi rank off: $hi1")
    // kept fraction tracks hi-lo = 90% within the same band
    val kept1 = g1.getLong(g1.fieldIndex("n_kept")).toDouble / 2000
    assert(kept1 >= 0.84 && kept1 <= 0.96, s"kept fraction off: $kept1")
    // the trimmed mean lands between the exact untrimmed extremes of
    // the widest and narrowest admissible trims of 1..2000
    val tm1 = g1.getDouble(g1.fieldIndex("trimmed_mean"))
    assert(tm1 > 900 && tm1 < 1100, s"trimmed mean off: $tm1")
    // per-group: g2's bounds scale with its own values (10*i,
    // i=1..1000 — rank p sits at value 10000p)
    val g2 = rows("g2")
    val lo2 = g2.getLong(g2.fieldIndex("lo_cents")) / 100.0
    assert(lo2 >= 10000 * 0.02 && lo2 <= 10000 * 0.08, s"g2 lo rank off: $lo2")
  }

  test("Profile.pipelineReport: one planted drop per stage, rows conserved") {
    val sp = spark
    import sp.implicits._
    // one doc engineered to fall at each stage: A short, B blocklisted,
    // C repetitive, E near-dup of D, F contaminated by the probe set;
    // D and G survive the whole pipeline.
    val docs = Seq(
      (1L, "one two three"),                                      // A: 3 < 5 tokens
      (2L, "bad bad x1 x2 x3 x4 x5 x6"),                          // B: 2 blocked hits
      (3L, "rep rep rep rep rep rep rep rep"),                    // C: 875000 ppm dup
      (4L, "the quick brown fox jumps over that lazy dog today"), // D: survivor (rep of E)
      (5L, "the quick brown fox jumps over that lazy dog today"), // E: dup of D
      (6L, "alpha beta gamma delta epsilon zeta eta theta iota"), // F: probe 8-gram
      (7L, "completely different content with no overlap at all here"))
      .toDF("id", "body")
    val probes = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta extra"))
      .toDF("id", "body")
    val block = Seq("bad").toDF("word")
    val r = api.Profile.pipelineReport(docs, "id", "body", block, probes,
        operators.TextOps.permTable, minTokens = 5L, maxBlockHits = 2L,
        maxDupTokenPpm = 500000L)
      .orderBy("stage").collect()
    assert(r.map(_.getString(1)).toSeq == Seq("length", "blocklist",
      "repetition", "neardup", "decontaminate"))
    assert(r.map(_.getLong(3)).toSeq == Seq(6L, 5L, 4L, 3L, 2L)) // n_kept
    // row conservation: n_in - n_kept = n_dropped, and each stage's
    // n_in is the previous stage's n_kept
    r.foreach { x =>
      assert(x.getLong(2) - x.getLong(3) == x.getLong(4), s"not conserved: $x") }
    assert(r.head.getLong(2) == 7L)
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(3), "stages must chain") }
  }

  test("Text.bpeTrain: hand-computed merges, count/tie order, early stop") {
    val sp = spark
    import sp.implicits._
    // word freqs cat:4, car:3, at:1 — merges are fully hand-computable:
    // (c,a):7 -> (ca,t):4 -> (ca,r):3 -> (a,t):1, then the symbol pool
    // is exhausted and round 5 must stop early (4 rows, not k).
    val docs = Seq((1L, "cat cat cat"), (2L, "car car"), (3L, "cat car at"))
      .toDF("id", "body")
    val r = api.Text.bpeTrain(docs, "id", "body", k = 5)
      .orderBy("merge_idx").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, "c", "a", 7L), (2L, "ca", "t", 4L),
      (3L, "ca", "r", 3L), (4L, "a", "t", 1L)))
  }

  test("Text.bpeTrain: single-pass replace semantics on symbol runs") {
    val sp = spark
    import sp.implicits._
    // "aaaa": round 1 counts the OVERLAPPING (a,a) adjacency 3 times but
    // the single left-to-right replace pass yields [aa, a, a] (the
    // trailing run re-merges in later rounds) — pinned here because the
    // oracle's replace must scan identically.
    val docs = Seq((1L, "aaaa")).toDF("id", "body")
    val r = api.Text.bpeTrain(docs, "id", "body", k = 5)
      .orderBy("merge_idx").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, "a", "a", 3L), (2L, "a", "a", 1L),
      (3L, "aa", "aa", 1L)))
  }

  test("Dedup.chunkSplit: packed chunks, short tail, md5 of joined text") {
    val sp = spark
    import sp.implicits._
    // 9 tokens at w=4 -> chunks of 4/4/1; chunk text is the space-join
    // of exactly the packed tokens (pinned via a known md5)
    val docs = Seq((1L, "a b c d e f g h i"), (2L, "x")).toDF("id", "body")
    val r = api.Dedup.chunkSplit(docs, "id", "body", 4)
      .orderBy("id", "chunk_idx").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    assert(r.length == 4)
    assert(r.map(x => (x._1, x._2)).toSeq ==
      Seq((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L)))
    val md5abcd = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(0)._3 == md5abcd)
    // identical chunk text in different docs hashes identically (the
    // dedup key property)
    val again = api.Dedup.chunkSplit(
      Seq((9L, "a b c d")).toDF("id", "body"), "id", "body", 4)
      .collect()(0).getString(2)
    assert(again == md5abcd)
  }

  test("Text.bpeApply: learned merges collapse known words, fertility pinned") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "cat cat cat"), (2L, "car car"), (3L, "cat car at"))
      .toDF("id", "body")
    val merges = api.Text.bpeTrain(docs, "id", "body", k = 5)
      .orderBy("merge_idx").collect()
      .map(x => (x.getString(1), x.getString(2))).toSeq
    // the 4 learned merges fully collapse every corpus word
    val r = api.Text.bpeApply(docs, "id", "body", merges)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq((1L, 3L, 3L, 1000000L), (2L, 2L, 2L, 1000000L),
      (3L, 3L, 3L, 1000000L)))
    // an unseen word falls back to finer pieces: "cab" shares only the
    // (c,a) merge -> [ca, b] = 2 pieces
    val r2 = api.Text.bpeApply(Seq((9L, "cab")).toDF("id", "body"), "id",
        "body", merges)
      .collect()(0)
    assert(r2.getLong(2) == 2L)
  }

  test("Text.perplexityScore: hand-computed bigram nll, short docs absent") {
    val sp = spark
    import sp.implicits._
    // corpus: "a b", "a c", "x" -> V = 4 (a,b,c,x); bigram counts
    // (a,b)=1, (a,c)=1; first-word total c(a,.)=2. Both scored docs:
    // nll = -ln((1+1)/(2+4)) = ln(3). The 1-token doc has no
    // transitions and is absent.
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "x")).toDF("id", "body")
    val r = api.Text.perplexityScore(docs, "id", "body")
      .orderBy("id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    r.foreach { x =>
      assert(x.getLong(1) == 1L)
      assert(math.abs(x.getDouble(2) - math.log(3.0)) < 1e-6)
    }
    // a repeated transition is cheaper than a rare one: in
    // "a b a b a c" the (a,b) transition outnumbers (a,c)
    val d2 = Seq((1L, "a b a b a c"), (2L, "a b"), (3L, "a c"))
      .toDF("id", "body")
    val probs = api.Text.perplexityScore(d2, "id", "body")
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(probs(2L) < probs(3L),
      s"frequent-transition doc must score lower nll: $probs")
  }

  test("Events.retention: signup-anchored cohorts, hand-computed matrix") {
    val sp = spark
    import sp.implicits._
    def t(day: Int, h: Int) = Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    // u1, u2 sign up on day 1; u3 on day 2; u4 never (excluded).
    // activity: u1 days 1,2; u2 day 1 (twice — distinct days count
    // once); u3 days 2,4; u4 day 1. Pre-signup activity must not count.
    val ev = Seq(
      (1L, t(1, 1), "signup"), (1L, t(1, 2), "view"), (1L, t(2, 1), "view"),
      (2L, t(1, 1), "signup"), (2L, t(1, 2), "view"), (2L, t(1, 3), "click"),
      (3L, t(1, 9), "view"), // pre-signup day: excluded for u3
      (3L, t(2, 1), "signup"), (3L, t(4, 1), "view"),
      (4L, t(1, 1), "view"))
      .toDF("user", "ts", "etype")
    val r = api.Events.retention(ev, "user", "ts", "etype", "signup")
      .orderBy("cohort_day", "day_offset").collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 2L, 1000000L), // u1+u2 active on signup day
      ("2024-01-01", 1L, 1L, 2L, 500000L),  // only u1 returns day+1
      ("2024-01-02", 0L, 1L, 1L, 1000000L), // u3 cohort of one
      ("2024-01-02", 2L, 1L, 1L, 1000000L)))
  }

  test("Rel.zorderValue: bit interleave pinned, locality over row order") {
    val sp = spark
    import sp.implicits._
    // z(x, y) interleaves x into even bits, y into odd: the full 4x4
    // grid at bits=2 is the canonical Morton curve 0..15.
    val grid = for (x <- 0L to 3L; y <- 0L to 3L) yield (x, y)
    val z = grid.toDF("x", "y")
      .withColumn("z", api.Rel.zorderValue("x", "y", 2))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) == 0L && z((1L, 0L)) == 1L && z((0L, 1L)) == 2L)
    assert(z((1L, 1L)) == 3L && z((2L, 2L)) == 12L && z((3L, 3L)) == 15L)
    // all 16 distinct, and each 2x2 quadrant occupies one contiguous
    // z range — the locality property sorting exploits
    assert(z.values.toSet == (0L to 15L).toSet)
    val quadRanges = grid.groupBy { case (x, y) => (x / 2, y / 2) }
      .map { case (_, cells) =>
        val zs = cells.map(z); (zs.min, zs.max) }.toSeq.sortBy(_._1)
    assert(quadRanges == Seq((0L, 3L), (4L, 7L), (8L, 11L), (12L, 15L)))
  }

  test("Rel.rangeJoinBucketed == naive range join, boundaries pinned") {
    val sp = spark
    import sp.implicits._
    def t(s: Int) = new Timestamp(s * 1000L)
    // intervals spanning <1, exactly 1, and >2 buckets at W = 60 s;
    // points at the open start (excluded), closed end (included),
    // inside, and far outside
    val intervals = Seq(
      (10L, t(30), t(50)),    // inside one bucket
      (11L, t(50), t(110)),   // crosses one boundary
      (12L, t(10), t(200)))   // spans 4 buckets
      .toDF("iid", "start", "end")
    val points = Seq(
      (1L, t(30)),   // == start of 10: open bound, excluded there
      (2L, t(50)),   // == end of 10 (in), == start of 11 (out)
      (3L, t(110)),  // == end of 11 (in), inside 12
      (4L, t(500)))  // outside everything
      .toDF("pid", "ts")
    val got = api.Rel.rangeJoinBucketed(points, "ts", intervals,
        "start", "end", 60L * 1000000L)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals,
        col("ts") > col("start") && col("ts") <= col("end"))
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"bucketed $got != naive $naive")
    assert(got == Set((1L, 12L), (2L, 10L), (2L, 12L), (3L, 11L), (3L, 12L)))
    // and no pair appears twice (a point has exactly one bucket)
    val rows = api.Rel.rangeJoinBucketed(points, "ts", intervals,
      "start", "end", 60L * 1000000L).count()
    assert(rows == naive.size.toLong)
  }

  test("Profile.corpusOverlap: hand-computed shingle sets") {
    val sp = spark
    import sp.implicits._
    // src a: shingles {w1 w2 w3, w2 w3 w4} (one doc, 4 tokens)
    //        and {x1 x2 x3} -> n_a = 3
    // src b: {w2 w3 w4} and {y1 y2 y3} -> n_b = 2, common = 1
    val docs = Seq(
      ("a", "w1 w2 w3 w4"), ("a", "x1 x2 x3"),
      ("b", "w2 w3 w4"), ("b", "y1 y2 y3")).toDF("src", "body")
    val r = api.Profile.corpusOverlap(docs, "src", "body", "a", "b")
      .collect()(0)
    assert(r.getLong(r.fieldIndex("n_a")) == 3L)
    assert(r.getLong(r.fieldIndex("n_b")) == 2L)
    assert(r.getLong(r.fieldIndex("n_common")) == 1L)
    assert(r.getLong(r.fieldIndex("a_in_b_cover_ppm")) == 333333L)
    assert(r.getLong(r.fieldIndex("b_in_a_cover_ppm")) == 500000L)
    assert(r.getLong(r.fieldIndex("jaccard_ppm")) == 250000L)
  }
}
