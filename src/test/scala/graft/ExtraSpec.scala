package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Ring 2: invariants for the training-data-pipeline extras. */
class ExtraSpec extends AnyFunSuite {
  private def spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("IVF ANN recall >= 0.4 vs exact top-5 (nprobe=3 over 10 cells)") {
    val exact = run("q_sim_cosine_topk").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("q_sim_ann_ivf").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("PQ ANN recall >= 0.4 vs exact top-5 (8x8 codes, ADC shortlist 50)") {
    val exact = run("q_sim_cosine_topk").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = run("q_sim_ann_pq").select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall=$recall")
    // exact re-rank contract: 5 per probe, self excluded
    val rows = run("q_sim_ann_pq").collect()
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length == 5))
    assert(rows.forall(r => r.getLong(0) != r.getLong(1)))
  }

  test("simhash buckets contain the planted minhash near-dup pairs") {
    val mh = run("q_dedup_minhash").where(col("matches") === 16)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(mh.nonEmpty)
    val sig = run("q_dedup_simhash")
    // identical-signature pairs land in some bucket of size >= 2
    assert(sig.count() > 0)
  }

  test("fingerprints are stable and prefix-sensitive") {
    val fp1 = run("q_text_fingerprint").collect()
    val fp2 = run("q_text_fingerprint").collect()
    assert(fp1.map(_.toSeq).toSeq == fp2.map(_.toSeq).toSeq)
    // distinct texts should rarely collide on the 32-char KR prefix
    val n = fp1.length
    val distinctPrefix = fp1.map(_.getLong(1)).distinct.length
    assert(distinctPrefix > n / 2, s"$distinctPrefix of $n prefixes distinct")
  }

  test("quality score in [0, 1e6] ppm; ratios in [0, 1e6] ppm") {
    val q = run("q_text_quality").cache()
    assert(q.where(col("quality_ppm") < 0 || col("quality_ppm") > 1000000).count() == 0)
    assert(q.where(col("stop_ppm") < 0 || col("stop_ppm") > 1000000).count() == 0)
    q.unpersist()
  }

  test("langid predicts a language or und for every doc") {
    val l = run("q_text_langid")
    assert(l.count() == Tables.documents(spark, dir).count())
    assert(l.where(!col("pred").isin("en", "es", "fr", "de", "zh", "und"))
      .count() == 0)
  }

  test("multimodal binary decode: n_bytes equals text length on ASCII corpus") {
    val m = run("q_multimodal_binary")
    val joined = m.join(Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("tl")), "doc_id")
    assert(joined.where(col("n_bytes") =!= col("tl")).count() == 0)
    assert(m.where(col("feat") <= col("n_bytes")).count() == 0)
  }

  test("embed near-dup pairs are symmetric-free and above threshold") {
    val p = run("q_dedup_embed_cosine").cache()
    assert(p.where(col("d1") >= col("d2")).count() == 0)
    assert(p.where(col("cos") < 0.4).count() == 0)
    p.unpersist()
  }

  test("containment dominates jaccard on every shared candidate pair") {
    // |A∩B|/min >= |A∩B|/|A∪B| always; equality iff A ⊆ B or B ⊆ A
    val j = run("q_dedup_jaccard").select("d1", "d2", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val c = run("q_dedup_containment")
      .select("d1", "d2", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.nonEmpty)
    val shared = j.keySet & c.keySet
    assert(shared.nonEmpty)
    shared.foreach { k =>
      assert(c(k) >= j(k) - 1e-6, s"$k: containment=${c(k)} jaccard=${j(k)}")
    }
  }

  test("vocab ids are dense 1..n with non-increasing counts") {
    val v = run("q_text_vocab").collect()
    assert(v.nonEmpty && v.length <= 1000)
    assert(v.map(_.getLong(0)).toSeq == (1L to v.length).toSeq)
    val cnts = v.map(_.getLong(2)).toSeq
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, cnts)
  }

  test("repetition ppm ratios are in range; tiny vocab forces dup tokens") {
    val r = run("q_text_repetition").cache()
    for (c <- Seq("dup_token_ppm", "top_token_ppm", "dup_2gram_ppm")) {
      assert(r.where(col(c) < 0 || col(c) > 1000000).count() == 0, c)
    }
    // 31-word vocabulary + 20-to-80-token docs: nearly every doc
    // repeats tokens, so the corpus-average dup ratio must be large
    val meanDup = r.agg(avg(col("dup_token_ppm"))).head().getDouble(0)
    assert(meanDup > 100000, s"avg dup_token_ppm=$meanDup")
    r.unpersist()
  }

  test("sessionize merges at EXACTLY the 30-min gap, splits just past it") {
    // session_window's merge is INCLUSIVE of the window end: an event
    // arriving exactly `gap` after its predecessor is MERGED into the
    // session (empirically pinned here — an r6 review claimed the
    // opposite from the then-untested oracle boundary). The fixture
    // has no exact-gap pair, so pin it with synthetic events:
    // e2 exactly 30 min after e1 (merged), e3 30 min + 1 s after e2
    // (new session).
    val sp = spark
    import sp.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def plus(us: Long) = new java.sql.Timestamp(t0.getTime + us / 1000)
    val gapUs = 30L * 60 * 1000 * 1000
    val ev = Seq(
      (1L, 1L, t0, 1.0),
      (2L, 1L, plus(gapUs), 1.0),
      (3L, 1L, plus(2 * gapUs + 1000000L), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    val sessions = operators.Windows.sessionizeEvents(ev)
      .select("session_seq", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sessions == Set((1L, 2L), (2L, 1L)), sessions)
    // and session_window agrees on the same synthetic frame — the
    // equivalence the batch twin exists to preserve
    val sw = streaming.StreamOps.session(ev)
      .select("n_events").collect().map(_.getLong(0)).toSet
    assert(sw == Set(2L, 1L), sw)
  }

  test("batch sessionize equals streaming session_window on boundaries") {
    // same 30-min gap rule: (user, start, n_events) sets must coincide
    val batch = run("q_win_sessionize")
      .select("user_id", "session_start", "n_events").collect()
      .map(_.toSeq).toSet
    val stream = run("q_stream_session")
      .select("user_id", "session_start", "n_events").collect()
      .map(_.toSeq).toSet
    assert(batch == stream,
      s"only-batch=${(batch -- stream).take(3)} only-stream=${(stream -- batch).take(3)}")
  }
}
