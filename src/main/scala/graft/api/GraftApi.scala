package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The user-facing library surface: parametric DataFrame -> DataFrame
  * operators. The graded `SparkEntry` queries are thin adapters binding
  * these to the fixture tables — a user points them at their own tables
  * instead. Every function is a pure plan transformation (no actions,
  * no side effects), so Catalyst optimizes across the call boundary
  * exactly as if the caller had inlined the expressions.
  */
object Text {

  /** Whitespace tokens with a 1-based ordinal per row (lowercased,
    * empties dropped). Output: (idCol, ord, token). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), posexplode(split(lower(col(textCol)), " ")))
      .where(col("col") =!= "")
      .select(col(idCol), (col("pos") + 1).cast("long").as("ord"),
        col("col").as("token"))

  /** RARE-TOKEN inverted index: token → document frequency + the full
    * sorted posting list, for tokens with df in [minDf, maxDf]. The
    * df band is applied BEFORE any posting list is collected — the
    * first agg computes only counts, the second collects lists for
    * surviving tokens alone — so no executor ever materializes a
    * stopword's corpus-wide posting list (the skew that kills a naive
    * one-pass collect_list index at 100 TB; list size is bounded by
    * maxDf by construction). Postings are ascending-id, comma-joined
    * (engine-neutral string, §2.0.8). Output: (token, df, postings). */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long, maxDf: Long): DataFrame = {
    val tok = tokens(docs, idCol, textCol)
      .select(col(idCol).as("doc"), col("token")).distinct()
    val keep = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf && col("df") <= maxDf)
    tok.join(keep, "token")
      .groupBy("token", "df")
      .agg(array_join(transform(array_sort(collect_list(col("doc"))),
        d => d.cast("string")), ",").as("postings"))
      .select(col("token"), col("df"), col("postings"))
  }

  /** Blocklist hits per document: for each doc containing at least one
    * blocklisted token, the number of blocked occurrences and the
    * lexicographically first blocked token (deterministic evidence
    * column). The blocklist rides a BROADCAST equi-join on token — at
    * 100 TB the corpus explodes once and probes a hashmap; no shuffle
    * keyed on the corpus, and a million-word blocklist still
    * broadcasts in MBs. Doc-level removal is then an anti-join against
    * this frame ([[blocklistFilter]]). Output: (idCol, n_blocked,
    * first_blocked). */
  def blocklistHits(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, wordCol: String = "word"): DataFrame =
    tokens(docs, idCol, textCol)
      .join(broadcast(blocklist.select(col(wordCol).as("token"))), "token")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_blocked"), min("token").as("first_blocked"))

  /** Documents surviving the blocklist: anti-join against
    * [[blocklistHits]] — a doc is dropped iff ANY token is listed. */
  def blocklistFilter(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, wordCol: String = "word"): DataFrame =
    docs.join(blocklistHits(docs, idCol, textCol, blocklist, wordCol)
      .select(idCol), Seq(idCol), "left_anti")

  /** Distinct k-word shingles per row. Output: (idCol, shingle). */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val parts = (0 until k).map(j => s"l[i + ${j - 1}]").mkString(", ' ', ")
    docs
      .withColumn("l", split(lower(col(textCol)), " "))
      .where(size(col("l")) >= k)
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(1, size(l) - ${k - 1}), " +
          s"i -> concat($parts)))")).as("shingle"))
  }

  /** TF-IDF per (id, token) with MLlib's smoothed formula
    * idf = ln((N+1)/(df+1)). One tokenize pass: df derives from tf
    * (already one row per (id, token)), doc count and df join back as
    * broadcasts. Output: (idCol, token, tf, idf, tfidf). */
  def tfidf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), "token").crossJoin(broadcast(n))
      .select(col(idCol), col("token"), col("tf"),
        round(log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6)
          .as("idf"),
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6)
          .as("tfidf"))
  }

  /** BIGRAM-LM PERPLEXITY scoring — the CCNet-style quality filter: a
    * Laplace-smoothed bigram language model is trained on the corpus
    * itself (transition counts + vocabulary size, all exact integers)
    * and every doc is scored by its average negative log transition
    * probability nll = -(1/T) Σ ln((c(w1,w2)+1) / (c(w1,·)+V)) — docs
    * whose nll sits far above the corpus band read as noise/boilerplate
    * and get dropped by the filter stage. Docs with < 2 tokens have no
    * transitions and are absent from the output.
    *
    * Determinism: each transition's log-prob is ln of the SAME exact
    * rational on both engines; the per-doc total is a LEFT FOLD over
    * the ord-sorted transition list (collect_list + array_sort +
    * aggregate here, list(ORDER BY) + list_reduce in the oracle), so
    * the double summation has ONE defined order — a plain SUM would
    * let engine-side accumulation order perturb the 6th decimal on
    * round-boundary docs (§2.0.2).
    *
    * 100 TB: the LM tables are support-sized (bigram counts, keyed
    * shuffle; first-word totals derived FROM the bigram table;
    * vocabulary size a 1-row broadcast); scoring is one equi-join pass
    * over the transitions; the fold state is bounded by doc length.
    * Output: (idCol, n_transitions, nll). */
  def perplexityScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tok = tokens(docs, idCol, textCol)
    // r16: bigrams zip straight out of the per-doc token array —
    // consecutive non-empty tokens, exactly what the old per-doc
    // lead() window produced without shuffling + sorting the
    // row-scale token stream. `ord` only orders the per-doc lp fold,
    // and the filtered position is order-isomorphic to the raw
    // ordinal, so the fold (and every output double) is unchanged.
    val bi = docs
      .select(col(idCol),
        expr(s"filter(split(lower($textCol), ' '), x -> x <> '')")
          .as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(col(idCol), posexplode(expr(
        "transform(sequence(1, size(__ts) - 1)," +
          " i -> struct(__ts[i - 1] as w1, __ts[i] as w2))")))
      .select(col(idCol), col("pos").cast("long").as("ord"),
        col("col.w1").as("w1"), col("col.w2").as("w2"))
    val c12 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val v = tok.agg(countDistinct(col("token")).as("v"))
    bi.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .withColumn("lp",
        log((col("c12") + 1).cast("double") / (col("c1") + col("v"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_transitions"),
        expr("aggregate(array_sort(collect_list(struct(ord, lp))), " +
          "cast(0 as double), (a, x) -> a + x.lp)").as("s"))
      .select(col(idCol), col("n_transitions"),
        round(-col("s") / col("n_transitions"), 6).as("nll"))
  }

  /** BPE MERGE-PAIR LEARNING — the tokenizer-training step after
    * [[collocations]]/vocab counting: starting from characters, run
    * `k` rounds of "merge the corpus-wide most frequent adjacent
    * symbol pair" (count DESC, then (left, right) ASC — a total order,
    * so every round's winner is engine-neutral). Output: one row per
    * learned merge, (merge_idx, lhs, rhs, pair_count), in merge order
    * — the ranked merge list IS the BPE tokenizer artifact a pipeline
    * ships.
    *
    * State is the distinct-WORD frequency table (vocabulary-sized,
    * never corpus-sized — the one full-corpus pass is the initial word
    * count): each word is a space-delimited symbol string, and a
    * round's merge is ONE left-to-right non-overlapping string-replace
    * pass of " l r " -> " lr " (Spark UTF8String.replace and DuckDB
    * replace share this exact scan, so the twins stay byte-identical;
    * a same-round chain like [a,a,a,a] re-merges next round). Pair
    * counts weight each word by its corpus frequency and count
    * OVERLAPPING adjacencies. Each round is a vocab-sized hash agg +
    * TakeOrdered(1) + a 1-row driver collect that parameterizes the
    * next round's replace — the same bounded-driver-state shape as
    * [[Dedup.connectedComponents]]'s convergence probe; rounds
    * localCheckpoint so round k never re-executes rounds 1..k-1. */
  def bpeTrain(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    var cur = tokens(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "), array_join(expr(
          "transform(sequence(1, length(token)), i -> substring(token, i, 1))"),
          " "), lit(" ")).as("syms"), col("freq"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    for (i <- 1 to k if !exhausted) {
      val top = cur
        .select(col("freq"),
          expr("filter(split(syms, ' '), x -> x <> '')").as("a"))
        .where(size(col("a")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "j -> struct(a[j-1] AS l, a[j] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i.toLong, l, r, cnt))
        cur = cur
          .withColumn("syms",
            replace(col("syms"), lit(s" $l $r "), lit(s" $l$r ")))
          .localCheckpoint(true)
      }
    }
    import spark.implicits._
    merges.result().toDF("merge_idx", "lhs", "rhs", "pair_count")
  }

  /** BPE ENCODE with a learned merge list ([[bpeTrain]]'s artifact, in
    * merge order) — the apply side of the tokenizer lifecycle: every
    * whitespace token is symbolized to characters and the merges run
    * in order as a CHAINED single-pass-replace projection (one corpus
    * scan, no joins, no state; same scan semantics bpeTrain pinned).
    * Per doc: whitespace tokens, total BPE pieces, and
    * pieces-per-token in exact ppm — the fertility statistic a
    * tokenizer report quotes.
    * Output: (idCol, ws_tokens, bpe_pieces, fertility_ppm). */
  def bpeApply(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val tok = tokens(docs, idCol, textCol)
    val sym0 = concat(lit(" "), array_join(expr(
      "transform(sequence(1, length(token)), i -> substring(token, i, 1))"),
      " "), lit(" "))
    val encoded = merges.foldLeft(sym0) { case (c, (l, r)) =>
      replace(c, lit(s" $l $r "), lit(s" $l$r "))
    }
    tok
      .withColumn("syms", encoded)
      .select(col(idCol),
        expr("size(filter(split(syms, ' '), x -> x <> ''))")
          .cast("long").as("pieces"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("ws_tokens"), sum("pieces").as("bpe_pieces"))
      .select(col(idCol), col("ws_tokens"), col("bpe_pieces"),
        expr("(1000000 * bpe_pieces) div ws_tokens").as("fertility_ppm"))
  }

  /** Horner polynomial hash of a string column, base 131 mod 1e9+7 —
    * a pure projection usable as a distributed id assignment (no vocab
    * table, no global sort). Engine-neutral: integer-identical to a
    * DuckDB list_reduce fold (see TextOps.polyHashSql). */
  def polyHash(c: String): Column = {
    // r16: the native single-pass Horner expression (bit-identical to
    // the interpreted HOF fold it replaces — TextExprsSpec pins the
    // equality incl. multi-byte code points; the HOF paid a lambda
    // dispatch + O(position) substring re-scan PER CHARACTER).
    // Registered by GraftExtensions at session build; re-registered
    // defensively here for sessions built without the extension.
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(graft.functions.TextExprs.ensureRegistered)
    expr(s"graft_polyhash($c)")
  }

  /** Sequence packing (training-batch construction): assign each row a
    * token-budget bin — bin = floor(cumulative tokens BEFORE this row
    * / budget) within `strataCol`, ordered by `idCol`. A row straddling
    * a boundary overflows its bin (linear packing with overflow), which
    * keeps the assignment a pure window expression: deterministic on
    * any engine, no sequential driver loop. Output: input columns +
    * bin (bigint).
    *
    * 100 TB: the cumsum window is partitioned by stratum; a real
    * pre-training pipeline packs per shard (stratum = shard id), so no
    * single partition ever scans more than one shard. */
  /** Corpus profile per stratum (language/source shard): doc count,
    * exact-ppm average chars, vocabulary size, chars-per-token — the
    * pre-training "what's in this corpus" pass. One tokenize total:
    * sum_tokens falls out of the same explode that feeds the vocab
    * distinct.
    *
    * `approx` is the 100 TB dial (mirrors Profile.columns): the vocab
    * is a genuinely high-cardinality distinct at corpus scale — false
    * = exact countDistinct (oracle-verifiable; the distinct state
    * grows with the vocabulary), true = approx_count_distinct at
    * relative error `rsd` — a mergeable HLL± partial agg whose state
    * is constant-size per stratum regardless of vocabulary. */
  def corpusStats(docs: DataFrame, strataCol: String, textCol: String,
      nCharsCol: String, approx: Boolean = false,
      rsd: Double = 0.05): DataFrame = {
    val nd = if (approx) approx_count_distinct(col("token"), rsd)
      else countDistinct(col("token"))
    val docStats = docs.groupBy(strataCol).agg(
      count(lit(1)).as("n_docs"),
      sum(col(nCharsCol)).as("sum_chars"))
    val vocab = docs
      .select(col(strataCol),
        explode(expr(s"filter(split(lower($textCol), ' '), x -> x <> '')"))
          .as("token"))
      .groupBy(strataCol).agg(count(lit(1)).as("sum_tokens"),
        nd.as("vocab_size"))
    // ppm numerators in DECIMAL(38,0): 1000000 * sum_chars overflows
    // int64 for any stratum above ~9.2e12 chars (~9 TB of text) —
    // real at the scale this profile advertises (review r6). The
    // decimal `div` truncates like the integer one, so the values are
    // bit-identical to the oracle's `//` wherever both fit.
    docStats.join(vocab, strataCol)
      .select(col(strataCol), col("n_docs"),
        expr("cast((1000000 * cast(sum_chars as decimal(38,0))) div n_docs" +
          " as bigint)").as("avg_chars_ppm"),
        col("vocab_size"),
        expr("cast((1000000 * cast(sum_chars as decimal(38,0))) div sum_tokens" +
          " as bigint)").as("chars_per_token_ppm"))
  }

  /** Language ID by lexicon-hit voting: join the token table to a
    * (lang, token) lexicon, count hits per (id, lang), argmax with a
    * deterministic (hits DESC, lang ASC) tie-break. Ids with zero
    * lexicon hits are absent — left-join + fill "und" at the caller.
    * (The graded q_text_langid keeps its original fixed-priority
    * tie-break; this parametric form takes any lexicon.) */
  def langId(tokens: DataFrame, idCol: String, tokenCol: String,
      lexicon: DataFrame): DataFrame = {
    val hits = tokens.join(broadcast(lexicon),
        tokens(tokenCol) === lexicon("token"))
      .groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("hits"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("hits").desc, col("lang").asc)
    hits.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col(idCol), col("lang").as("pred"), col("hits"))
  }

  /** Quality scoring over a token table: stopword ratio (top
    * `topStopwords` corpus tokens), uniqueness ratio, and a composite
    * quality score — all as EXACT parts-per-million integers (integer
    * division; rounding computed double ratios hits exact-half
    * boundaries where engines disagree). One corpus pass derives the
    * stopword list; per-id measures are plain hash aggs. */
  def qualityScore(tokens: DataFrame, idCol: String, tokenCol: String,
      topStopwords: Int = 10): DataFrame = {
    val stop = tokens.groupBy(tokenCol).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col(tokenCol).asc).limit(topStopwords)
      .select(tokenCol)
    val perDoc = tokens.groupBy(idCol).agg(
      count(lit(1)).as("n_tokens"),
      countDistinct(col(tokenCol)).as("n_distinct"))
    val stopHits = tokens.join(broadcast(stop), tokenCol)
      .groupBy(idCol).agg(count(lit(1)).as("stop_hits"))
    perDoc.join(stopHits, Seq(idCol), "left").na.fill(0L)
      .select(col(idCol), col("n_tokens"),
        expr("(1000000 * stop_hits) div n_tokens").as("stop_ppm"),
        expr("(1000000 * n_distinct) div n_tokens").as("uniq_ppm"),
        expr("(1000000 * least(n_tokens, 100) * (n_tokens - stop_hits) * n_distinct) " +
          "div (100 * n_tokens * n_tokens)").as("quality_ppm"))
  }

  def packBins(df: DataFrame, idCol: String, strataCol: String,
      nTokensCol: String, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__cum_before",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__cum_before div $budget"))
      .drop("__cum_before")
  }

  /** PMI collocation mining: adjacent-bigram counts scored by pointwise
    * mutual information pmi = ln(p(xy) / (p(x)p(y))), the standard
    * "fast scan" / "new york" phrase detector run before tokenizer
    * training. Keeps pairs with count >= minCount (low-count PMI is
    * noise), top `k` by (count DESC, w1, w2) — an integer-keyed total
    * order, so the cut is engine-neutral; pmi itself is a computed
    * double (ROUND 6, the tfidf discipline). Output: (w1, w2,
    * pair_count, pmi).
    *
    * 100 TB: bigrams zip straight out of the per-doc token array
    * (consecutive non-empty tokens — what the pre-r16 per-doc lead()
    * window produced, without shuffling + sorting the row-scale token
    * stream, and never a self-join); pair and unigram counts
    * partial-agg map-side; the two unigram joins shuffle on token —
    * fine at any vocab — and the corpus totals are 1-row broadcasts.
    * Top-k is TakeOrdered, no global sort. */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 3L, k: Int = 50): DataFrame = {
    val toks = tokens(docs, idCol, textCol)
    val pairs = docs
      .select(expr(s"filter(split(lower($textCol), ' '), x -> x <> '')")
        .as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__ts) - 1)," +
          " i -> struct(__ts[i - 1] as w1, __ts[i] as w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val pc = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("pair_count"))
    val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
    val nTok = toks.agg(count(lit(1)).as("n_tok"))
    val nPair = pc.agg(sum(col("pair_count")).as("n_pair"))
    pc.join(uni.select(col("token").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("token").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nPair))
      .where(col("pair_count") >= minCount)
      .select(col("w1"), col("w2"), col("pair_count"),
        round(log(col("pair_count").cast("double") * col("n_tok") * col("n_tok")
          / (col("n_pair").cast("double") * col("c1") * col("c2"))), 6)
          .as("pmi"))
      .orderBy(col("pair_count").desc, col("w1"), col("w2"))
      .limit(k)
  }
}

object Dedup {

  /** Exact dedup on `keys`: deterministic survivor = min(idCol), with
    * duplicate counts. groupBy+min, NOT dropDuplicates (whose survivor
    * is partition-order dependent). */
  def exact(df: DataFrame, idCol: String, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(min(col(idCol)).as("survivor"), count(lit(1)).as("dup_cnt"))

  /** Content-addressed exact dedup: md5 of `contentCol` as the group
    * key — shrinks the shuffle key from full content to 32 bytes. */
  def byContentMd5(df: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_md5"))
      .agg(min(col(idCol)).as("survivor"), count(lit(1)).as("dup_cnt"))

  /** MinHash signatures: one row per id with `perms.size` min-hash
    * slots from the given affine permutation constants (perm, a, b).
    * Input must be (idCol, shingle); ids are assigned per-shingle via
    * Text.polyHash — a projection, so the whole computation is one
    * aggregation. Output: (idCol, perm, minh) — band-join two of these
    * on (perm, minh) for LSH candidates. */
  def minhashSignatures(sh: DataFrame, idCol: String,
      perms: Seq[(Int, Long, Long)]): DataFrame =
    minhashSignaturesOfSid(
      sh.withColumn("sid", Text.polyHash("shingle")), idCol, perms)

  /** Signature builder over PRE-HASHED shingle ids — the sid-level
    * core of [[minhashSignatures]], reusable by producers whose
    * shingling isn't a string column (e.g. byte-gram hashes computed
    * in a partition kernel over a binary payload). All `perms.size`
    * slots come from ONE aggregation pass (16 min-columns, then
    * stack), never a perms cross join. Input: (idCol, sid) rows;
    * sid must be < 1e9+7 so the affine maps stay in int64. */
  def minhashSignaturesOfSid(withSid: DataFrame, idCol: String,
      perms: Seq[(Int, Long, Long)]): DataFrame = {
    val minCols = perms.map { case (i, a, b) =>
      min((lit(a) * col("sid") + lit(b)) % lit(2147483647L)).as(s"m$i")
    }
    val stackExpr = s"stack(${perms.size}, " +
      perms.map { case (i, _, _) => s"$i, m$i" }.mkString(", ") +
      ") AS (perm, minh)"
    withSid.groupBy(col(idCol)).agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), expr(stackExpr))
  }

  /** LSH candidate pairs from signatures: ids agreeing on at least
    * `minMatches` of the signature slots. Equi-join on (perm, minh) —
    * never an all-pairs product. */
  def minhashCandidates(sig: DataFrame, idCol: String,
      minMatches: Int): DataFrame = {
    val s1 = sig.select(col(idCol).as("d1"), col("perm"), col("minh"))
    val s2 = sig.select(col(idCol).as("d2"), col("perm"), col("minh"))
    s1.join(s2, Seq("perm", "minh")).where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("matches"))
      .where(col("matches") >= minMatches)
  }

  /** [[minhashCandidates]] with a HOT-BAND CAP — the 100 TB guard for
    * template-heavy corpora (boilerplate pages, near-identical log
    * lines) where one (perm, minh) bucket can hold thousands of docs
    * and the band self-join expands it QUADRATICALLY: buckets with
    * more than `maxBucket` members are excluded from pairing
    * wholesale (skipping beats splitting here — a salt would still
    * emit the quadratic pair set, just across more tasks, and a
    * bucket that hot is boilerplate the band carries no signal for;
    * near-dup pairs inside it still surface through their OTHER,
    * colder bands, which is why fixture recall is unchanged at any
    * honest cap — DedupCapSpec pins that and the bound).
    *
    * No-silent-caps rule: the skipped buckets are RETURNED, not
    * dropped — (perm, minh, bucket_n) — so a pipeline can count/log
    * exactly what was excluded. `maxBucket = Int.MaxValue` returns
    * byte-identical pairs to [[minhashCandidates]] with an empty
    * skip frame. The bucket-size pass is one extra agg over the
    * signature frame (16 rows/doc), never over pairs. */
  def minhashCandidatesCapped(sig: DataFrame, idCol: String,
      minMatches: Int, maxBucket: Int): (DataFrame, DataFrame) = {
    val base = sig.select(col(idCol).as("d"), col("perm"), col("minh"))
    val skipped = base.groupBy("perm", "minh")
      .agg(count(lit(1)).as("bucket_n"))
      .where(col("bucket_n") > maxBucket)
    val kept =
      if (maxBucket == Int.MaxValue) base
      else base.join(skipped.select("perm", "minh"),
        Seq("perm", "minh"), "left_anti")
    val s1 = kept.select(col("d").as("d1"), col("perm"), col("minh"))
    val s2 = kept.select(col("d").as("d2"), col("perm"), col("minh"))
    val pairs = s1.join(s2, Seq("perm", "minh"))
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("matches"))
      .where(col("matches") >= minMatches)
    (pairs, skipped)
  }

  /** k-word shingle ARRAY per row from a pre-split token-array column —
    * the no-explode form of Text.shingles, usable where aggregation and
    * explode-regroup are unavailable (a STREAMING ingestion row signs
    * itself). Caller must filter `size(tokCol) >= k` first (Spark's
    * `sequence` descends when the computed stop < start). */
  def shingleArray(tokCol: String, k: Int): Column = {
    val parts = (0 until k).map(j => s"$tokCol[i + ${j - 1}]").mkString(", ' ', ")
    expr(s"array_distinct(transform(sequence(1, size($tokCol) - ${k - 1}), " +
      s"i -> concat($parts)))")
  }

  /** Per-ROW MinHash signature (array<bigint>, one slot per perm, in
    * perm order) from a shingle-array column — the aggregation-free
    * twin of [[minhashSignatures]]: identical integers (same polyHash,
    * same affine maps, min over the same shingle set), but computed as
    * a pure projection on the row. This is the STREAMING ingestion
    * form: a stream of new documents signs itself statelessly, then
    * band-joins (posexplode of the array = (perm, minh)) against the
    * stored corpus signatures — StreamingSpec asserts the stream-static
    * pipeline equals batch [[newVsCorpus]]. */
  def rowMinhashSig(shArrCol: String,
      perms: Seq[(Int, Long, Long)]): Column =
    array(perms.map { case (_, a, b) =>
      expr(s"array_min(transform($shArrCol, s -> ($a * " +
        "aggregate(sequence(1, length(s)), 0L, " +
        "(acc, j) -> (acc * 131 + ascii(substring(s, j, 1))) % 1000000007) " +
        s"+ $b) % 2147483647))")
    }: _*)

  /** Incremental dedup — the ingestion-pipeline shape: candidates of a
    * NEW batch against an EXISTING corpus, by band-joining the batch's
    * MinHash signatures ([[minhashSignatures]]) against the corpus's
    * signatures on (perm, minh). At 100 TB the corpus signatures are
    * computed once and STORED (16 small rows per doc); each incoming
    * batch only signs its own docs and equi-joins — the corpus text is
    * never re-shingled, and there is no batch-internal or corpus-
    * internal pair blowup. The STREAMING form of the same join is
    * [[rowMinhashSig]] + posexplode + stream-static band join (see
    * StreamingSpec). Output: (new_id, corpus_id, matches). */
  def newVsCorpus(newSigs: DataFrame, corpusSigs: DataFrame,
      idCol: String, minMatches: Int): DataFrame = {
    val n = newSigs.select(col(idCol).as("new_id"), col("perm"), col("minh"))
    val c = corpusSigs.select(col(idCol).as("corpus_id"), col("perm"), col("minh"))
    n.join(c, Seq("perm", "minh"))
      .groupBy("new_id", "corpus_id").agg(count(lit(1)).as("matches"))
      .where(col("matches") >= minMatches)
  }

  /** Benchmark decontamination: training rows sharing at least
    * `minShared` exact n-grams with a probe/benchmark set — the
    * pre-training hygiene step that removes eval-set leakage. Inputs
    * are (idCol, gramCol) tables (e.g. Text.shingles with k=8+; long
    * grams make accidental overlap ~impossible, so any hit is real
    * contamination). Pure equi-join on the gram + count: the probe
    * side is small by construction (a benchmark), so Catalyst
    * broadcasts it and the training corpus streams through one scan —
    * no pair blowup at any scale. Output:
    * (train_id, probe_id, shared_grams). */
  def contamination(trainGrams: DataFrame, probeGrams: DataFrame,
      idCol: String, gramCol: String = "gram",
      minShared: Int = 1): DataFrame = {
    val t = trainGrams.select(col(idCol).as("train_id"), col(gramCol))
    val p = probeGrams.select(col(idCol).as("probe_id"), col(gramCol))
    t.join(p, gramCol)
      .groupBy("train_id", "probe_id").agg(count(lit(1)).as("shared_grams"))
      .where(col("shared_grams") >= minShared)
  }

  /** SimHash signatures over a tf-weighted token table
    * (idCol, tokenCol, tfCol): `bits`-bit signature per id, token
    * hashes from the polynomial string hash mapped through a fixed
    * affine permutation — one grouped aggregation with `bits`
    * conditional sums, no vocabulary table. Ids sharing a signature
    * are near-dup bucket candidates. */
  def simhash(tf: DataFrame, idCol: String, tokenCol: String,
      tfCol: String, bits: Int = 16): DataFrame = {
    val hashed = tf
      .withColumn("tid", Text.polyHash(tokenCol))
      .withColumn("h",
        (lit(1103515245L) * col("tid") + lit(12345L)) % lit(2147483647L))
    val bitSums = (0 until bits).map { j =>
      sum(when(expr(s"(h div ${1L << j}) % 2") === 1, col(tfCol))
        .otherwise(-col(tfCol))).as(s"s$j")
    }
    hashed.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash",
        (0 until bits).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _))
      .select(col(idCol), col("simhash"))
  }

  /** Exact pairwise Jaccard >= `threshold` over a (idCol, shingle)
    * table, group-then-pair with a posting-list cap as the skew guard
    * (a shingle shared by more than `maxPosting` ids contributes no
    * pairs — bounds per-key fanout at any scale). */
  def jaccardPairs(sh: DataFrame, idCol: String, threshold: Double,
      maxPosting: Int = 1000): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = sh.groupBy("shingle")
      .agg(array_sort(collect_list(col(idCol))).as("ds"))
      .where(size(col("ds")).between(2, maxPosting))
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))"))
        .as("p"))
      .select(col("p.d1"), col("p.d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "jaccard")
  }

  /** Exact Jaccard VERIFICATION of a candidate-pair frame (d1, d2) —
    * the second stage of the standard two-stage near-dup pipeline:
    * MinHash banding proposes ([[minhashCandidates]]), exact Jaccard
    * disposes. Unlike [[jaccardPairs]] (which generates pairs from
    * posting lists and counts intersections for ALL of them, discarding
    * most below the threshold), this counts intersections ONLY for the
    * given candidates — at any scale the exact-count cost is
    * proportional to the near-dup rate, not to the shingle-collision
    * rate.
    *
    * 100 TB: candidates are the band-join survivors — by construction
    * a tiny fraction of the corpus (if they aren't, the corpus is
    * mostly duplicates and banding parameters are wrong), so the pair
    * frame broadcasts; both shingle sides are then pre-filtered to
    * candidate docs before the (doc, shingle) equi-join. No full
    * self-join of the shingle table ever happens. */
  def jaccardVerify(sh: DataFrame, idCol: String, candidates: DataFrame,
      threshold: Double): DataFrame =
    pairStats(sh, idCol, candidates)
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz1") + col("sz2") - col("inter")), 6))
      .where(col("jaccard") >= threshold)
      .select("d1", "d2", "inter", "jaccard")

  /** Exact CONTAINMENT on candidate pairs — the asymmetric twin of
    * [[jaccardVerify]]: containment = |A∩B| / min(|A|,|B|) flags a
    * short document embedded in a longer one (a quote, a boilerplate
    * block, a subsumed snippet), which symmetric Jaccard dilutes —
    * |A∩B|/|A∪B| shrinks as the size gap grows even at full overlap.
    * Same candidate-restricted topology and cost as jaccardVerify. */
  def containmentVerify(sh: DataFrame, idCol: String,
      candidates: DataFrame, threshold: Double): DataFrame =
    pairStats(sh, idCol, candidates)
      .withColumn("containment",
        round(col("inter").cast("double") /
          least(col("sz1"), col("sz2")), 6))
      .where(col("containment") >= threshold)
      .select("d1", "d2", "inter", "containment")

  /** Shared exact-overlap base of the verify family: for each
    * candidate (d1, d2), the shingle-intersection count plus both doc
    * sizes. Candidates broadcast (band-join survivors are tiny by
    * construction); both shingle sides pre-filter to candidate docs
    * before the (doc, shingle) equi-join — no shingle self-join. */
  private def pairStats(sh: DataFrame, idCol: String,
      candidates: DataFrame): DataFrame = {
    // distinct: a caller-supplied candidates frame with a repeated
    // (d1, d2) row would count each intersecting shingle once per
    // duplicate, inflating inter while sz1/sz2 stay fixed — jaccard
    // could exceed 1.0 (review r6). Cheap: runs on the tiny pair set.
    val cand = broadcast(candidates.select(col("d1"), col("d2")).distinct())
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val lhs = sh.select(col(idCol).as("d1"), col("shingle")).join(cand, "d1")
    val rhs = sh.select(col(idCol).as("d2"), col("shingle"))
      .join(broadcast(cand.select("d2").distinct()), "d2")
    lhs.join(rhs, Seq("d2", "shingle"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      .join(sizes.select(col(idCol).as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col(idCol).as("d2"), col("sz").as("sz2")), "d2")
  }

  /** Connected components over an undirected edge list — the canonical
    * "collapse near-dup pairs into clusters, keep one doc per cluster"
    * step after any of the pair generators above. Iterative min-label
    * propagation: every node starts labeled with itself; each round a
    * node adopts the smallest label among itself and its neighbors;
    * converged when no label shrinks. Output: (node, label) where label
    * = the component's minimum node id.
    *
    * 100 TB notes: this is the Pregel-style CC loop (each round = one
    * edge-labels hash join + one hash agg, both partitioned by node —
    * never a global sort or driver-side graph). Rounds needed = graph
    * diameter; near-dup graphs are unions of small near-cliques, so it
    * converges in 2-3 rounds. Each round's result is localCheckpoint'ed
    * (eager) to cut lineage — without it, round k re-executes rounds
    * 1..k-1 and the plan grows superlinearly; stale checkpoint RDDs are
    * released by Spark's ContextCleaner once the loop drops them. */
  def connectedComponents(edges: DataFrame, a: String = "d1",
      b: String = "d2", maxIter: Int = 25): DataFrame = {
    // checkpoint the directed edges BEFORE mirroring: union(e, e.swap)
    // over the raw input would execute the (possibly expensive) pair-
    // generation pipeline once per union branch.
    val e0 = edges
      .select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .localCheckpoint(true)
    val und = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    // labels only ever shrink, so sum(label) strictly decreases iff any
    // node changed — one scalar agg per round, no join-diff.
    def tot(df: DataFrame): BigDecimal = {
      val r = df.agg(sum(col("label")).cast("decimal(38,0)")).head()
      if (r.isNullAt(0)) BigDecimal(0) else BigDecimal(r.getDecimal(0))
    }
    var prev = tot(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val prop = und.join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val next = labels.union(prop)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      val cur = tot(next)
      converged = cur == prev
      prev = cur
      labels = next
      iter += 1
    }
    labels
  }

  /** Chunk-level (paragraph-style) exact dedup, the C4/RefinedWeb line
    * dedup adapted to unstructured word streams: each doc is cut into
    * fixed `w`-word chunks, a chunk SURVIVES iff it is the first
    * occurrence of its text corpus-wide (survivor = lexicographically
    * min (id, chunk_idx) — deterministic). Output per doc: (idCol,
    * n_chunks, n_kept, kept_ppm) — the per-doc surviving fraction a
    * pipeline uses to drop boilerplate-heavy docs.
    *
    * 100 TB: the dedup key is md5(chunk_text) — a fixed 32-byte
    * shuffle key regardless of chunk width; first-occurrence is a
    * row_number window partitioned by that hash (group sizes = dup
    * multiplicity, tiny), then one hash-agg back on the doc id. Never
    * materializes a doc-to-doc pair space. */
  /** Per-row chunk hashes — the STATELESS projection form of chunk
    * dedup's front half: each doc's (lowercased, empty-dropped) tokens
    * packed into `w`-word chunks, one output row per chunk with its
    * md5. No groupBy/window anywhere, so it runs unchanged on a
    * STREAMING frame (the ingestion side: arriving docs chunk-hash
    * themselves, then anti-join the stored corpus chunk-hash frame —
    * the chunk-level twin of [[rowMinhashSig]]'s topology; see
    * StreamingSpec). Unlike [[chunkDedup]], which buckets by raw token
    * ordinal, chunks here are packed from the FILTERED token sequence
    * (exactly `w` tokens per chunk except the tail).
    * Output: (idCol, chunk_idx, chunk_md5). */
  def chunkSplit(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 32): DataFrame =
    docs
      .withColumn("__l",
        expr(s"filter(split(lower($textCol), ' '), x -> x <> '')"))
      .where(size(col("__l")) >= 1)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, (size(__l) - 1) div $w), " +
          s"c -> array_join(slice(__l, c * $w + 1, $w), ' '))")))
      .select(col(idCol), col("pos").cast("long").as("chunk_idx"),
        md5(col("col")).as("chunk_md5"))

  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 32): DataFrame = {
    val toks = Text.tokens(docs, idCol, textCol)
    val chunks = toks
      .withColumn("chunk_idx", expr(s"(ord - 1) div $w"))
      .groupBy(col(idCol), col("chunk_idx"))
      .agg(expr("array_join(transform(array_sort(collect_list(" +
        "struct(ord, token))), x -> x.token), ' ')").as("chunk_text"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("chunk_text")))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("rk", row_number().over(win))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rk") === 1, 1L).otherwise(0L)).as("n_kept"))
      .select(col(idCol), col("n_chunks"), col("n_kept"),
        expr("(1000000 * n_kept) div n_chunks").as("kept_ppm"))
  }

  /** Blocked FUZZY-DUPLICATE pairs by EDIT DISTANCE — the
    * record-linkage rung between exact dedup (hash equality) and
    * set-based near-dup (MinHash/Jaccard, which ignores token ORDER):
    * two docs pair when the Levenshtein distance of their
    * `prefixLen`-char prefixes is <= `maxDist`. All-pairs edit
    * distance is an O(n^2) cross product; here candidates are
    * restricted to equal BLOCKS (`block`, e.g. language + a coarse
    * length bucket — true near-identical texts cannot disagree much
    * on either), so pair generation is a self-EQUI-join on the block
    * key and the O(prefixLen^2) DP runs only inside blocks. Output:
    * (a_id, b_id, lev) with a_id < b_id.
    *
    * 100 TB: one shuffle of each (id, prefix) projection on the block
    * key — never the full text; block granularity is the CALLER'S
    * scale lever and must bound the quadratic term. A coarse key
    * (language × a length bucket) yields ~tens of corpus-fraction
    * blocks — the quadratic scale-killer (r7 verdict). Conjoin a
    * FINE second component so blocks stay near-dup-sized: a
    * first-k-char bucket (edit-near prefixes almost always agree on
    * a short head; measured on the fixtures, first-8-chars keeps
    * 100% of sub-threshold pairs at every SF while cutting the pair
    * space ~390x) or a stored MinHash band. The join's hash shuffle
    * on the fine key then parallelizes across ~thousands of blocks
    * by itself — no explicit repartition (which would pin the corpus
    * onto |coarse blocks| reducers). The DP runs BANDED (Spark's
    * thresholded `levenshtein` — O(maxDist*L) per pair, -1 past the
    * bound, instead of the full O(L^2) table). */
  /** SPAN-level exact duplicate detection — the substring-dedup
    * operator of the train-data-dedup literature (find repeated spans
    * ACROSS documents, the boilerplate/license-header/quoted-reply
    * mass that document-level near-dup never sees), at fixed `n`-word
    * granularity with POSITIONS: every doc emits all rolling n-gram
    * occurrences (posexplode — occurrences, not the distinct grams
    * the decontamination probe uses), grouped by gram; grams present
    * in >= 2 DISTINCT docs come back with doc count, occurrence
    * count, and the first occurrence (min over the doc*1000+pos
    * ordinal — deterministic; pos < 1000 words per doc by fixture
    * bound). Output: (gram, n_docs, n_occ, first_doc, first_pos).
    *
    * 100 TB: the shuffle key is md5(gram) — fixed 32 bytes however
    * wide the gram; the output is support-sized (duplicated grams
    * only), and per-gram state is counters + a min, never a posting
    * list. A pipeline cuts the flagged spans from all but first_doc. */
  def spanDuplicates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame =
    docs
      .withColumn("__l", split(lower(col(textCol)), " "))
      .where(size(col("__l")) >= n)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, size(__l) - $n), " +
          s"i -> array_join(slice(__l, i + 1, $n), ' '))")))
      .select(col(idCol), col("pos"), col("col").as("gram"),
        md5(col("col")).as("__k"))
      // two-stage agg instead of COUNT(DISTINCT doc): the per-(gram,
      // doc) stage collapses within-doc repeats map-side and avoids
      // the Expand a distinct-count would plan over the full exploded
      // stream; the second stage is support-sized (one row per
      // gram-doc).
      .groupBy(col("__k"), col(idCol))
      .agg(min("gram").as("gram"), count(lit(1)).as("occ"),
        min("pos").as("__mp"))
      .groupBy("__k")
      // first occurrence = lexicographic min (doc, pos): min doc +
      // min_by on its per-doc min pos — doc ids are unique per gram
      // here, so min_by is deterministic; no arithmetic encoding, so
      // arbitrary id magnitudes and >=1000-token docs are safe
      .agg(min("gram").as("gram"), count(lit(1)).as("n_docs"),
        sum("occ").as("n_occ"), min(col(idCol)).as("first_doc"),
        min_by(col("__mp"), col(idCol)).cast("long").as("first_pos"))
      .where(col("n_docs") >= 2)
      .select(col("gram"), col("n_docs"), col("n_occ"),
        col("first_doc"), col("first_pos"))

  def fuzzyPairs(docs: DataFrame, idCol: String, textCol: String,
      block: Column, prefixLen: Int, maxDist: Int): DataFrame = {
    val a = docs.select(col(idCol).as("a_id"), block.as("__blk"),
      substring(col(textCol), 1, prefixLen).as("__pa"))
    val b = docs.select(col(idCol).as("b_id"), block.as("__blk"),
      substring(col(textCol), 1, prefixLen).as("__pb"))
    a.join(b, "__blk")
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        levenshtein(col("__pa"), col("__pb"), maxDist)
          .cast("long").as("lev"))
      .where(col("lev") >= 0L && col("lev") <= maxDist)
  }
}

object Vec {

  /** Int8 quantization (the storage-shrink step before ANN indexing):
    * per-`groupCol` max-abs scale, q = floor(x*127/mx) — floor has no
    * half-way tie, so results are engine-exact on identical doubles.
    * Output: input columns + `scale` (double) + `q` (array<bigint>,
    * values in [-128, 127]). */
  def quantizeInt8(vecs: DataFrame, vecCol: String,
      groupCol: String): DataFrame = {
    val mx = vecs.select(col(groupCol), explode(col(vecCol)).as("v"))
      .groupBy(col(groupCol))
      .agg(greatest(max(abs(col("v"))), lit(1e-12)).as("mx"))
    vecs.join(broadcast(mx), groupCol)
      .withColumn("q",
        expr(s"transform($vecCol, x -> cast(floor(x * 127.0 / mx) AS bigint))"))
      .withColumnRenamed("mx", "scale")
  }
}

object Sim {

  /** Random-hyperplane LSH bucket assignment
    * (BucketedRandomProjectionLSH semantics, deterministic reimpl):
    * `tables` hash tables of `bits` sign-bits each from seeded
    * pseudo-random planes. One posexplode + broadcast-planes join +
    * (tables*bits)-column sum — a single corpus scan and a narrow
    * shuffle; at scale this is a map-side join + partial agg.
    * Output: (idCol, tbl, bkt) — equi-join two of these on (tbl, bkt)
    * for ANN candidates. */
  def lshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
      dim: Int, tables: Int, bits: Int, seed: Long): DataFrame = {
    import org.apache.spark.sql.{Row, types => T}
    val nPlanes = tables * bits
    val rnd = new scala.util.Random(seed)
    val planes: Array[Array[Double]] = Array.fill(nPlanes, dim)(rnd.nextGaussian())
    val planeRows = (0 until dim).map { d =>
      Row.fromSeq(d +: (0 until nPlanes).map(j => planes(j)(d)))
    }
    val planeSchema = T.StructType(
      T.StructField("dim", T.IntegerType) +:
        (0 until nPlanes).map(j => T.StructField(s"w$j", T.DoubleType)))
    val s = vecs.sparkSession
    val planesDf = s.createDataFrame(
      s.sparkContext.parallelize(planeRows, 1), planeSchema)
    val exploded = vecs
      .select(col(idCol), posexplode(col(vecCol)))
      .select(col(idCol), col("pos").as("dim"), col("col").as("v"))
    val dotCols = (0 until nPlanes).map(j => sum(col("v") * col(s"w$j")).as(s"d$j"))
    val dots = exploded.join(broadcast(planesDf), "dim")
      .groupBy(col(idCol)).agg(dotCols.head, dotCols.tail: _*)
    val bktCols = (0 until tables).map { t =>
      (0 until bits).map { b =>
        when(col(s"d${t * bits + b}") > 0, 1).otherwise(0) * (1 << b)
      }.reduce(_ + _).as(s"bkt_$t")
    }
    val bucketed = dots.select(col(idCol) +: bktCols: _*)
    val stackExpr = s"stack($tables, " +
      (0 until tables).map(t => s"$t, bkt_$t").mkString(", ") + ") AS (tbl, bkt)"
    bucketed.select(col(idCol), expr(stackExpr))
  }

  /** Exact cosine top-k: each probe row against the whole corpus.
    * Probes are broadcast (must be small — the caller picks them); the
    * corpus streams through one scan. Norms are computed ONCE per
    * vector before the pair blowup; the per-pair dot is the native
    * loop-codegen `graft_dot` expression. Ranked on the ROUNDED cosine
    * with id tie-break so float noise cannot flip orderings. Both
    * inputs: (idCol, vecCol: array<double>). Output:
    * (probe_id, idCol, cos, rn). */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.VectorExprs.ensureRegistered(corpus.sparkSession)
    val all = corpus.select(col(idCol), col(vecCol).as("e2"))
      .withColumn("n2", expr("sqrt(graft_dot(e2, e2))"))
    val pr = probes.select(col(idCol).as("probe_id"), col(vecCol).as("e1"))
      .withColumn("n1", expr("sqrt(graft_dot(e1, e1))"))
    val pairs = all.crossJoin(broadcast(pr))
      .where(col(idCol) =!= col("probe_id"))
      .withColumn("cos",
        round(expr("graft_dot(e1, e2)") / (col("n1") * col("n2")), 6))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col(idCol).asc)
    pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("probe_id"), col(idCol), col("cos"),
        col("rn").cast("long").as("rn"))
  }
}

object Ml {

  /** Deterministic k-way split on an integer id column: returns the
    * rows whose `id mod k == fold`. Arithmetic, so stable across
    * engines, partitionings, and reruns (a seeded randomSplit is
    * partition-order sensitive). */
  def fold(df: DataFrame, idCol: String, k: Int, fold: Int): DataFrame =
    df.where(pmod(col(idCol), lit(k)) === fold)

  /** Complement of [[fold]] — the training side of the split. */
  def exceptFold(df: DataFrame, idCol: String, k: Int, fold: Int): DataFrame =
    df.where(pmod(col(idCol), lit(k)) =!= fold)

  /** Per-class confusion summary from a scored frame with integer
    * (labelCol, predCol): support, true positives, predicted count,
    * recall/precision as exact ppm integers. */
  def confusionSummary(scored: DataFrame, labelCol: String,
      predCol: String): DataFrame = {
    val byLabel = scored.groupBy(col(labelCol).as("label")).agg(
      count(lit(1)).as("support"),
      sum(when(col(predCol) === col(labelCol), 1L).otherwise(0L)).as("tp"))
    val byPred = scored.groupBy(col(predCol).as("label"))
      .agg(count(lit(1)).as("predicted"))
    byLabel.join(byPred, Seq("label"), "left")
      .na.fill(0L, Seq("predicted"))
      .select(col("label"), col("support"), col("tp"), col("predicted"),
        expr("(1000000 * tp) div support").as("recall_ppm"),
        expr("CASE WHEN predicted > 0 THEN (1000000 * tp) div predicted " +
          "ELSE 0 END").as("precision_ppm"))
  }

  /** StringIndexer(frequencyDesc) domain table, engine-neutral: index
    * = rank by (frequency DESC, value ASC) — MLlib's default order with
    * its alphabetical tie-break, but arithmetic instead of
    * collect-based. Output: (valueCol, sidx). The window sorts only the
    * AGGREGATED domain (one row per distinct value) — broadcast it back
    * onto the fact side; the fact table itself never shuffles. */
  def stringIndex(df: DataFrame, valueCol: String): DataFrame =
    df.groupBy(valueCol).agg(count(lit(1)).as("freq"))
      .withColumn("sidx", (row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col(valueCol).asc)) - 1).cast("long"))
      .select(valueCol, "sidx")

  /** DENSE-ID dictionary over an arbitrary key column — the standard
    * ALS prep step (spark.ml ALS ids are Int, real user/item keys are
    * arbitrary longs/strings; VERDICT r9 #3): returns (key, id) with
    * `id` a contiguous deterministic 0-based Int over the DISTINCT
    * non-null keys. The rank is [[Dist.bandedRank]] over the key's
    * xxhash64 (shifted non-negative) with the key's string form as the
    * tie-break — per-(band) local row_number + broadcast band offsets,
    * NEVER a global sort, so the dictionary builds with one hash agg +
    * one banded window at any key cardinality. Deterministic across
    * partitionings/engines (pure hash arithmetic), bijective (hash
    * collisions break on the distinct string form), and id < 2^31
    * holds up to Int.MaxValue distinct keys — past that ALS itself is
    * the blocker, not this dictionary.
    *
    * Restriction (inherited from the string tie-break): two DISTINCT
    * keys must render to distinct strings — true for any atomic key
    * type; don't feed struct/array keys. */
  def denseIds(df: DataFrame, keyCol: String): DataFrame = {
    val bandW = (1L << 62) / 4096 + 1 // uniform hash → ~4096 even bands
    val keys = df.select(col(keyCol).as("key")).where(col("key").isNotNull)
      .distinct()
      .withColumn("__h", pmod(xxhash64(col("key")), lit(1L << 62)))
      .withColumn("__t", col("key").cast("string"))
    Dist.bandedRank(keys, Seq(), "__h", "__t", bandWidth = bandW)
      .select(col("key"), (col("rank") - 1).cast("int").as("id"))
  }

  /** Millionths DCG weight table for [[rankingMetricsAt5]]:
    * floor(1e6 / log2(rank + 1)) for ranks 1..5, FIXED as literals so
    * both the Spark projection and any SQL oracle evaluate identical
    * integers (libm log2 never runs at query time — VERDICT r9 #2's
    * "log2 via literal table" discipline). Prefix sums are the ideal
    * DCG at 1..5 relevant items. */
  val dcgWeightsMillionths: Seq[Long] =
    Seq(1000000L, 630929L, 500000L, 430676L, 386852L)
  val idcgPrefixMillionths: Seq[Long] =
    dcgWeightsMillionths.scanLeft(0L)(_ + _).tail // 1e6,1630929,…,2948457

  /** RANKING-metrics evaluator at k = 5 — the recommender's eval half
    * (precision@5 / AP@5 / NDCG@5), all EXACT integer ppm so the same
    * math is SQL-twin-able:
    *  - `recs`: (userCol, rankCol 1-based ≤ 5, itemCol) — one ranked
    *    list per user (e.g. an ALS or popularity top-5);
    *  - `rel`:  (userCol, itemCol) — the held-out relevant set.
    * Per user with ≥ 1 relevant item: n_rel, hits = |top-5 ∩ rel|,
    * prec5_ppm = 1e6·hits div 5, AP@5 via the ×60 lcm trick (60/i is
    * integral for i ≤ 5, so Σ relᵢ·cumᵢ·(60/i) is exact; normalized
    * by min(5, n_rel)), and NDCG@5 from the fixed millionths weight
    * table with IDCG = prefix[min(5, n_rel)]. Users absent from `rel`
    * are dropped (metrics are undefined at n_rel = 0).
    *
    * 100 TB: `rel` aggregates per user (map-side partial), the rec/rel
    * join is co-keyed on (user, item), and the per-user cumulative-hit
    * window partitions on user with ≤ 5 rows each — no global sort,
    * no driver materialization. */
  def rankingMetricsAt5(recs: DataFrame, rel: DataFrame,
      userCol: String = "user", rankCol: String = "rank",
      itemCol: String = "item"): DataFrame = {
    val w = dcgWeightsMillionths
    val relCnt = rel.select(col(userCol), col(itemCol)).distinct()
      .groupBy(userCol).agg(count(lit(1)).as("n_rel"))
    val marked = recs
      .join(rel.select(col(userCol), col(itemCol))
        .distinct().withColumn("__hit", lit(1L)),
        Seq(userCol, itemCol), "left")
      .na.fill(0L, Seq("__hit"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(rankCol).asc)
      .rowsBetween(Long.MinValue, 0)
    val weightCase = (1 to 5).zip(w)
      .map { case (i, wi) => s"WHEN $i THEN ${wi}L" }
      .mkString(s"CASE $rankCol ", " ", " ELSE 0L END")
    val idcgCase = (1 to 5).zip(idcgPrefixMillionths)
      .map { case (i, s) => s"WHEN $i THEN ${s}L" }
      .mkString("CASE least(n_rel, 5L) ", " ", " ELSE 0L END")
    marked
      .withColumn("__cum", sum("__hit").over(wc))
      .groupBy(userCol)
      .agg(sum("__hit").as("hits"),
        sum(expr(s"__hit * __cum * (60L div $rankCol)")).as("__apnum"),
        sum(expr(s"__hit * ($weightCase)")).as("__dcg"))
      .join(relCnt, userCol)
      .select(col(userCol), col("n_rel"), col("hits"),
        expr("(1000000 * hits) div 5").as("prec5_ppm"),
        expr("(1000000 * __apnum) div (60 * least(n_rel, 5L))")
          .as("ap5_ppm"),
        expr(s"(1000000 * __dcg) div ($idcgCase)").as("ndcg5_ppm"))
  }

  /** Per-class CONFUSION-MATRIX metrics in exact ppm
    * (MulticlassClassificationEvaluator semantics) over any row-level
    * (actual, pred) frame: per class — support, predicted
    * count, true positives, precision/recall ppm and
    * F1 = 2·TP div (n_pred + n_actual) (pure rationals, no doubles).
    * Rows are keyed on the FULL union of actual and predicted classes
    * (ADVICE r10): a class predicted but never actual gets a row with
    * n_actual = 0 and precision/recall/f1 = 0 — without it, callers
    * macro-averaging the returned rows silently average over a
    * different class set than the evaluator defines.
    *
    * 100 TB: ONE map-side-partial hash agg to the ≤|classes|²
    * confusion frame; everything after is support arithmetic. */
  def confusionMatrixPpm(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val conf = df.groupBy(col(actualCol).as("__cma"),
        col(predCol).as("__cmp"))
      .agg(count(lit(1)).as("__cmn"))
      .localCheckpoint() // ≤ |classes|² rows; three consumers
    val act = conf.groupBy("__cma").agg(sum("__cmn").as("n_actual"))
    val prd = conf.groupBy("__cmp").agg(sum("__cmn").as("n_pred"))
      .select(col("__cmp").as("__cma"), col("n_pred"))
    val tp = conf.where(col("__cma") === col("__cmp"))
      .select(col("__cma"), col("__cmn").as("tp"))
    act.join(prd, Seq("__cma"), "full")
      .join(broadcast(tp), Seq("__cma"), "left")
      .na.fill(0L, Seq("n_actual", "n_pred", "tp"))
      .select(col("__cma").as("class"), col("n_actual"), col("n_pred"),
        col("tp"),
        expr("case when n_pred = 0 then 0L" +
          " else (1000000 * tp) div n_pred end").as("precision_ppm"),
        expr("case when n_actual = 0 then 0L" +
          " else (1000000 * tp) div n_actual end").as("recall_ppm"),
        expr("(2000000 * tp) div (n_pred + n_actual)").as("f1_ppm"))
  }

  /** COHEN'S KAPPA + multiclass MATTHEWS correlation over any
    * row-level (actual, pred) frame — chance-corrected agreement from
    * exact integer moments (n_a·n_p products in decimal(38,0)); the
    * two SIGNED ratios are single IEEE double dags rounded 6 dp
    * (Spark div truncates where DuckDB // floors, so signed numerators
    * never reach an integer division). One row out:
    * (n, po_ppm, pe_ppm, kappa, mcc). */
  def kappaMcc(df: DataFrame, actualCol: String,
      predCol: String): DataFrame = {
    val conf = df.groupBy(col(actualCol).as("__cma"),
        col(predCol).as("__cmp"))
      .agg(count(lit(1)).as("__cmn"))
      .localCheckpoint()
    val act = conf.groupBy("__cma").agg(sum("__cmn").as("na"))
    val prd = conf.groupBy("__cmp").agg(sum("__cmn").as("np"))
      .select(col("__cmp").as("__cma"), col("np"))
    val cls = act.join(broadcast(prd), Seq("__cma"), "full")
      .na.fill(0L, Seq("na", "np"))
    val stp = conf.where(col("__cma") === col("__cmp"))
      .agg(coalesce(sum("__cmn"), lit(0L)).as("stp"))
    cls.agg(sum("na").as("n"),
        sum(expr("cast(na as decimal(19,0)) * np")).as("snanp"),
        sum(expr("cast(na as decimal(19,0)) * na")).as("sna2"),
        sum(expr("cast(np as decimal(19,0)) * np")).as("snp2"))
      .crossJoin(broadcast(stp))
      .select(col("n"),
        expr("(1000000 * stp) div n").as("po_ppm"),
        expr("cast(snanp * 1000000" +
          " div (cast(n as decimal(38,0)) * n) as bigint)").as("pe_ppm"),
        expr("round(cast(cast(n as decimal(38,0)) * stp - snanp as double)" +
          " / cast(cast(n as decimal(38,0)) * n - snanp as double), 6)")
          .as("kappa"),
        expr("round(cast(cast(n as decimal(38,0)) * stp - snanp as double)" +
          " / (sqrt(cast(cast(n as decimal(38,0)) * n - snp2 as double))" +
          " * sqrt(cast(cast(n as decimal(38,0)) * n - sna2 as double)))," +
          " 6)").as("mcc"))
  }

  /** CUMULATIVE GAINS / LIFT at population deciles over any
    * (score, pos) frame, exact ppm: descending-score banded
    * cumulative (Dist.bandedCumSum — no global sort), decile cuts by
    * the weighted-median min-when pattern, capture/share/lift as the
    * fixed ppm floor-div dag. `scoreShift` must satisfy
    * scoreShift − score ≥ 0 for every row (integer div is not
    * monotone across negatives — same contract as Dist). */
  def liftGains(df: DataFrame, scoreCol: String, posCol: String,
      scoreShift: Long, bandWidth: Long = 128L): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("__lgs"))
      .agg(sum(when(col(posCol), 1L).otherwise(0L)).as("np"),
        sum(when(col(posCol), 0L).otherwise(1L)).as("nn"))
      .withColumn("__lgh", lit(scoreShift) - col("__lgs"))
    val tot = g.agg(sum("np").as("n_pos"),
      (sum("np") + sum("nn")).as("n"))
    val c = Dist.bandedCumSum(g, Seq(), "__lgh", bandWidth,
        sumCols = Seq("np", "nn"), inclusive = true)
      .crossJoin(broadcast(tot))
      .select(col("__lgs"), col("__lgh"),
        (col("cum_np") + col("cum_nn")).as("cum_n"),
        col("cum_np"), col("n"), col("n_pos"))
      .localCheckpoint() // support frame; probed once per decile
    val deciles = df.sparkSession.range(1, 11)
      .select(col("id").as("decile"))
    val cuts = c.crossJoin(broadcast(deciles))
      .where(col("cum_n") * 10 >= col("decile") * col("n"))
      .groupBy("decile").agg(min("__lgh").as("__lgh"))
    cuts.join(c, "__lgh")
      .select(col("decile"), col("__lgs").as("threshold_score"),
        col("cum_n"), col("cum_np").as("cum_pos"),
        expr("(1000000 * cum_np) div n_pos").as("capture_ppm"),
        expr("(1000000 * cum_n) div n").as("share_ppm"),
        expr("((1000000 * cum_np) div n_pos) * 1000000" +
          " div ((1000000 * cum_n) div n)").as("lift_ppm"))
  }

  /** EXACT DECISION STUMP over any (score, pos) frame: weighted-Gini
    * argmin over every distinct threshold "score ≤ t", impurities as
    * pure rationals in ppm (decimal(38,0) products), argmin =
    * TakeOrdered(1) on (cost asc, score asc). Same `scoreShift`
    * contract as [[liftGains]]. One row out. */
  def decisionStump(df: DataFrame, scoreCol: String, posCol: String,
      scoreShift: Long, bandWidth: Long = 128L): DataFrame = {
    val g = df.groupBy(col(scoreCol).as("__dss"))
      .agg(sum(when(col(posCol), 1L).otherwise(0L)).as("np"),
        sum(when(col(posCol), 0L).otherwise(1L)).as("nn"))
      .withColumn("__dsh", col("__dss") + lit(scoreShift))
    val tot = g.agg(sum("np").as("n_pos"),
      (sum("np") + sum("nn")).as("n"))
    def gini(p: String, q: String): String =
      s"1000000 - cast((cast($p as decimal(38,0)) * $p" +
        s" + cast($q as decimal(38,0)) * $q) * 1000000" +
        s" div (cast($p + $q as decimal(38,0)) * ($p + $q)) as bigint)"
    Dist.bandedCumSum(g, Seq(), "__dsh", bandWidth,
        sumCols = Seq("np", "nn"), inclusive = true)
      .crossJoin(broadcast(tot))
      .select(col("__dss"),
        col("cum_np").as("pl"), col("cum_nn").as("ql"),
        (col("n_pos") - col("cum_np")).as("pr"),
        (col("n") - col("n_pos") - col("cum_nn")).as("qr"),
        col("n"))
      .where(col("pl") + col("ql") < col("n"))
      .select(col("__dss"), (col("pl") + col("ql")).as("n_left"),
        col("pl").as("pos_left"),
        (col("pr") + col("qr")).as("n_right"), col("pr").as("pos_right"),
        expr(gini("pl", "ql")).as("gini_left_ppm"),
        expr(gini("pr", "qr")).as("gini_right_ppm"), col("n"))
      .select(col("__dss").as("split_score"), col("n_left"),
        col("pos_left"), col("n_right"), col("pos_right"),
        col("gini_left_ppm"), col("gini_right_ppm"),
        expr("(n_left * gini_left_ppm + n_right * gini_right_ppm)" +
          " div n").as("weighted_gini_ppm"))
      .orderBy(col("weighted_gini_ppm").asc, col("split_score").asc)
      .limit(1)
  }

  /** EXACT squared-euclidean SILHOUETTE per cluster, in ppm
    * (ClusteringEvaluator semantics made engine-exact): `vecs` carries
    * an INTEGER vector column `qCol` (quantize floats first — e.g.
    * floor(x·127)) and a cluster assignment `clusterCol`. All pairwise
    * mass comes from moment algebra, never a pair join:
    * Σ_{y∈c} ‖x−y‖² = n_c·‖x‖² − 2·x·S_c + ssq_c over exact integer
    * per-cluster moments. a(x) = own-cluster mean (self included,
    * div n_c — documented), b(x) = min over other clusters of the
    * FLOORED ppm mean (both engines floor identically, so the argmin
    * is engine-exact even at rational ties), s(x) = (b−a)/max(a,b) in
    * ppm with the sign-safe split (negate AFTER a non-negative floor
    * div — Spark div truncates where DuckDB // floors). Returns one
    * row per cluster: (cluster, n_points, sum_s_ppm, mean_s_ppm).
    *
    * Headroom: n_c·‖x‖²·1e6 forms in decimal(38,0) (int64 wraps past
    * ~4e12 rows at int8 quantization).
    *
    * 100 TB: per-point work is O(d·|clusters|) — the blowup a KMeans
    * transform pays; moments are ONE posexplode hash agg and the
    * per-point dots a broadcast join on the d·|clusters| moment
    * frame. */
  def silhouettePpm(vecs: DataFrame, idCol: String, qCol: String,
      clusterCol: String): DataFrame = {
    val q = vecs.select(col(idCol).as("__sid"),
        col(clusterCol).cast("long").as("__scl"), col(qCol).as("__sq"))
      .withColumn("__ssq",
        expr("aggregate(__sq, 0L, (a, x) -> a + x * x)"))
    val cm = q.groupBy("__scl")
      .agg(count(lit(1)).as("n_c"), sum("__ssq").as("ssq_c"))
      .localCheckpoint() // |clusters| rows
    val dm = q.select(col("__scl"), posexplode(col("__sq")))
      .groupBy(col("__scl").as("c2"), col("pos").as("dim"))
      .agg(sum("col").as("s_cd"))
      .localCheckpoint() // |clusters|·d rows
    val dots = q.select(col("__sid"), posexplode(col("__sq")))
      .join(broadcast(dm), col("pos") === col("dim"))
      .groupBy(col("__sid"), col("c2"))
      .agg(sum(expr("col * s_cd")).as("dot"))
    val d2 = q.select(col("__sid"), col("__scl"), col("__ssq"))
      .join(dots, "__sid")
      .join(broadcast(cm.select(col("__scl").as("c2"), col("n_c"),
        col("ssq_c"))), "c2")
      .select(col("__sid"), col("__scl"), col("c2"),
        expr("cast((cast(n_c as decimal(38,0)) * __ssq - 2 * dot" +
          " + ssq_c) * 1000000 div n_c as bigint)").as("m_ppm"))
    d2.groupBy("__sid", "__scl")
      .agg(min(when(col("c2") === col("__scl"), col("m_ppm"))).as("a"),
        min(when(col("c2") =!= col("__scl"), col("m_ppm"))).as("b"))
      .select(col("__sid"), col("__scl"),
        expr("case when a = 0 and b = 0 then 0L" +
          " when b >= a then ((b - a) * 1000000) div" +
          "   (case when a > b then a else b end)" +
          " else -(((a - b) * 1000000) div" +
          "   (case when a > b then a else b end)) end").as("s_ppm"))
      .groupBy(col("__scl").as("cluster"))
      .agg(count(lit(1)).as("n_points"), sum("s_ppm").as("sum_s_ppm"))
      .select(col("cluster"), col("n_points"), col("sum_s_ppm"),
        expr("case when sum_s_ppm >= 0 then sum_s_ppm div n_points" +
          " else -((-sum_s_ppm) div n_points) end").as("mean_s_ppm"))
  }

  /** LEAKAGE-SAFE train/val/test assignment: a doc's split is decided
    * by its near-dup CLUSTER representative, not its own id, so two
    * near-duplicate documents can never land in different splits (the
    * eval-contamination failure mode a plain per-doc hash split has).
    * `clusters` is any (nodeCol, labelCol) component assignment — e.g.
    * Dedup.connectedComponents over MinHash candidate pairs; docs
    * absent from it (singletons) represent themselves. The split is
    * the same engine-neutral multiplicative hash as Sample.hashMod,
    * applied to the representative: deterministic across engines,
    * partitionings, and reruns, and a cluster member added TOMORROW
    * joins the split its cluster was already assigned to. One equi-
    * join against the (small) cluster map + a projection — the corpus
    * never shuffles on anything but the join key.
    * Output: input columns + rep + split. */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      nodeCol: String = "node", labelCol: String = "label",
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val cmap = clusters.select(col(nodeCol).as("__lss_node"),
      col(labelCol).as("__lss_label"))
    val bucket = pmod(col("rep") * lit(1103515245L) + lit(12345L),
      lit(1000000007L)) % 100
    df.join(cmap, col(idCol) === col("__lss_node"), "left")
      .withColumn("rep", coalesce(col("__lss_label"), col(idCol)))
      .drop("__lss_node", "__lss_label")
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }
}

object Sample {

  /** Deterministic stratified cap: at most `k` rows per stratum,
    * keeping the lowest ids — the engine-neutral sampleBy (seeded
    * Bernoulli sampling is partition-order sensitive). The rn <= k
    * filter compiles to WindowGroupLimit: each partition keeps its
    * local top-k before the shuffle, so no stratum is ever fully
    * sorted. Output: input columns + rn (1-based within stratum). */
  def stratifiedCap(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol)).orderBy(col(idCol))))
      .where(col("rn") <= k)

  /** Reproducible ~pct% sample by multiplicative hash of an integer
    * key: membership depends only on the key, so re-runs, re-orderings
    * and re-partitionings give the SAME sample, and a pipeline can
    * re-derive the split from the key alone. Pure filter: no shuffle,
    * and larger pct strictly contains smaller (nested samples). */
  def byKeyHash(df: DataFrame, keyCol: String, pct: Int): DataFrame =
    df.where(pmod(col(keyCol) * lit(1103515245L) + lit(12345L),
      lit(1000000007L)) % 100 < pct)

  /** Data-MIXTURE sampling (training-mix construction): downsample each
    * stratum to its share of a target `total`, shares given as integer
    * `parts` (stratum -> weight) — per-stratum quota
    * k_s = min(n_s, total * part_s div sum(parts)), exact integer
    * arithmetic, so the quota is engine-neutral. WITHIN each stratum
    * the kept rows are chosen by multiplicative-hash order of the key
    * (pseudo-random but deterministic — re-runs, re-partitionings and
    * both engines pick the SAME rows), with the id as tie-break.
    *
    * 100 TB: one count per stratum (tiny agg, broadcast back) + one
    * partitioned window per stratum — no global sort; a stratum is a
    * language/source shard, so the window partitions are the natural
    * data shards. Output: input columns + rn (1-based hash-order rank
    * within stratum). */
  def mixtureCap(df: DataFrame, strataCol: String, idCol: String,
      parts: Seq[(String, Long)], total: Long): DataFrame = {
    val sumParts = parts.map(_._2).sum
    val quota = df.sparkSession.createDataFrame(parts)
      .toDF(strataCol, "part")
    val ks = df.groupBy(strataCol).agg(count(lit(1)).as("ns"))
      .join(quota, strataCol)
      .select(col(strataCol),
        least(col("ns"), expr(s"($total * part) div $sumParts")).as("ks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(pmod(col(idCol) * lit(1103515245L) + lit(12345L),
        lit(1000000007L)).asc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w))
      .join(broadcast(ks), strataCol)
      .where(col("rn") <= col("ks"))
      .drop("ks")
  }

  /** TEMPERATURE-scaled mixture (alpha = 0.5): per-stratum quota
    * proportional to sqrt(n_s) — the standard multilingual rebalance
    * that upweights tail languages without letting the head dominate
    * (mixtureCap's fixed `parts` made explicit as a function of the
    * observed counts). Weights are floor(sqrt(n_s)) as BIGINT —
    * sqrt is IEEE-exact-rounded in every engine, and everything after
    * is integer arithmetic, so quotas are engine-neutral; within a
    * stratum rows are picked in multiplicative-hash order of the key
    * (same deterministic order as mixtureCap). Output: input columns
    * + rn (1-based hash-order rank within stratum).
    *
    * 100 TB: one tiny count-per-stratum agg broadcast back + one
    * window partitioned by stratum — no global sort, no driver loop;
    * strata are language/source shards, the natural partitions. */
  def temperatureCap(df: DataFrame, strataCol: String, idCol: String,
      total: Long): DataFrame = {
    val ws = df.groupBy(strataCol).agg(count(lit(1)).as("ns"))
      .withColumn("wgt", floor(sqrt(col("ns"))).cast("long"))
    val sumW = ws.agg(sum(col("wgt")).as("sum_w"))
    val ks = ws.crossJoin(broadcast(sumW))
      .select(col(strataCol),
        least(col("ns"), expr(s"($total * wgt) div sum_w")).as("ks"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(pmod(col(idCol) * lit(1103515245L) + lit(12345L),
        lit(1000000007L)).asc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w))
      .join(broadcast(ks), strataCol)
      .where(col("rn") <= col("ks"))
      .drop("ks")
  }

  /** Weighted PPS (probability-proportional-to-size) SYSTEMATIC
    * sample of ~`k` rows — the weighted complement of [[byKeyHash]]:
    * rows are laid on a line in multiplicative-hash order of the key
    * (pseudo-random but engine-neutral and re-run-stable), each
    * occupying a segment of its weight; a row is kept iff its segment
    * contains one of the k systematic grid points m·W/k. All
    * selection arithmetic is exact integers ((k·cum) div W crossing),
    * so both engines keep the SAME rows; a row heavier than W/k is
    * kept once (standard PPS-systematic; |sample| ≤ k, = k when all
    * weights < W/k). Output: (key, weight, cum, pick_idx).
    *
    * 100 TB: the global prefix sum is computed the DISTRIBUTED way —
    * rows bucket by hash range (hash div (p/buckets), monotone in the
    * global order), per-bucket totals are a |buckets|-row frame whose
    * cumulative offsets come from a broadcast theta self-join (the
    * keySkew idiom), and the within-bucket running sum is a window
    * partitioned BY BUCKET — no SinglePartition exchange, no global
    * sort; 1000 executors each cumsum their own hash range. */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
      k: Long, buckets: Int = 64): DataFrame = {
    val p = 1000000007L
    val bw = p / buckets + 1
    val base = df
      .select(col(idCol), col(weightCol).cast("long").as("weight"))
      .withColumn("__h",
        pmod(col(idCol) * lit(1103515245L) + lit(12345L), lit(p)))
      .withColumn("__b", expr(s"__h div $bw"))
    val btot = base.groupBy("__b").agg(sum("weight").as("bsum"))
    val off = btot
      .join(broadcast(btot.select(col("__b").as("b2"),
        col("bsum").as("s2"))), col("b2") < col("__b"), "left")
      .groupBy("__b")
      .agg(coalesce(sum("s2"), lit(0L)).as("boff"))
    val tot = btot.agg(sum("bsum").as("W"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col("__h").asc, col(idCol).asc)
      .rowsBetween(Long.MinValue, 0)
    base.withColumn("__c", sum("weight").over(w))
      .join(broadcast(off), "__b")
      .crossJoin(broadcast(tot))
      .withColumn("cum", col("boff") + col("__c"))
      .where(expr(s"($k * cum) div W > ($k * (cum - weight)) div W"))
      .select(col(idCol), col("weight"), col("cum"),
        expr(s"($k * cum) div W").as("pick_idx"))
  }
}

object Events {

  /** Ordered-funnel conversion: a user reaches step i iff they did
    * steps 0..i in strictly increasing event-time order, using
    * FIRST-qualifying times (t_0 = min ts of step 0; t_i = min ts of
    * step i with ts > t_{i-1}) — the standard product-analytics funnel
    * semantic. Output one row per step: (step 1-based, event_type,
    * users, conv_from_prev_ppm; step 1 = 1000000).
    *
    * 100 TB: each stage filters to ONE event type (predicate reaches
    * the scan), hash-aggregates min(ts) per user, and equi-joins the
    * previous stage's (user, t) frame — per-user state is a single
    * timestamp, never a collected event array, so a power user with
    * 10^6 events costs the same as anyone else. Step counts are 1-row
    * aggs; the ppm chain is a window over a rows=|steps| frame. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stage0 = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    val stages = steps.tail.scanLeft(stage0) { (prev, st) =>
      events.where(col(typeCol) === st)
        .join(prev.select(col(userCol), col("t").as("t_prev")),
          Seq(userCol))
        .where(col(tsCol) > col("t_prev"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
    }
    val counts = stages.zip(steps).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1L).as("step"), lit(st).as("event_type"),
          col("users"))
    }.reduce(_.unionAll(_))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("step"))
    counts
      .withColumn("prev_users", lag(col("users"), 1).over(w))
      // Only step 1 gets the 1000000 sentinel; a later step whose
      // PREDECESSOR had 0 users reports 0 conversion, not the 100%
      // that a blanket coalesce over (0 div 0 -> NULL) would claim.
      .withColumn("conv_from_prev_ppm",
        when(col("prev_users").isNull, lit(1000000L))
          .when(col("prev_users") === 0L, lit(0L))
          .otherwise(expr("(1000000 * users) div prev_users")))
      .drop("prev_users")
  }

  /** COHORT RETENTION matrix — the other core product-analytics view
    * next to [[funnel]]: users are cohorted by the DATE of their first
    * `anchorType` event (e.g. signup), and each later active day
    * counts toward (cohort_day, day_offset). Sparse output — only
    * observed offsets appear. Output: (cohort_day, day_offset,
    * active_users, cohort_size, retention_ppm).
    *
    * 100 TB: first-anchor is one filtered min-agg per user; activity
    * is a distinct projection (user, date); the join is user-keyed
    * (never day-expanded); cohort sizes are a support-sized frame.
    * No windows, no sorts. */
  def retention(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, anchorType: String): DataFrame = {
    val cohort = events.where(col(typeCol) === anchorType)
      .groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_day"))
    val activity = events
      .select(col(userCol), to_date(col(tsCol)).as("d")).distinct()
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohort, userCol)
      .where(col("d") >= col("cohort_day"))
      .select(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("active_users"),
        col("cohort_size"),
        expr("(1000000 * active_users) div cohort_size")
          .as("retention_ppm"))
  }

  /** Hourly GAP-FILL + FORWARD-FILL — the resampling step that turns
    * an irregular event stream into the dense per-key time series a
    * monitoring dashboard or feature pipeline consumes: each key gets
    * one row per hour between its first and last event (quiet hours
    * included, n_events = 0), and `ffill_max` carries the last
    * observed hourly max of `valCol` forward across the gaps. The
    * hourly max (not avg) is the filled statistic because max is
    * accumulation-order-insensitive — bit-identical across engines.
    * Output: (key, hr, n_events, ffill_max).
    *
    * 100 TB: the raw stream collapses to per-(key, hour) partial aggs
    * FIRST (map-side combine; at most 720 rows per key-month
    * afterwards), the spine is a per-key `sequence` explode of the
    * same bounded size, the join is a (key, hour) shuffle equi-join,
    * and the forward-fill window partitions by key over <= 720 rows —
    * no global sort, no unbounded state, skew capped by the spine
    * arithmetic itself. */
  def gapfillHourly(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val hourly = events
      .select(col(keyCol), date_trunc("hour", col(tsCol)).as("hr"),
        col(valCol).as("__v"))
      .groupBy(col(keyCol), col("hr"))
      .agg(count(lit(1)).as("n_events"), max("__v").as("hr_max"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min("hr").as("h0"), max("hr").as("h1"))
      .select(col(keyCol),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hr"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("hr"))
      .rowsBetween(Long.MinValue, 0)
    spine.join(hourly, Seq(keyCol, "hr"), "left")
      .select(col(keyCol), col("hr"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("hr_max"), ignoreNulls = true).over(w).as("ffill_max"))
  }

  /** Rolling z-score ANOMALY detection over the hourly event-count
    * series — the telemetry monitor that pages before a bad shard
    * poisons a corpus: counts per (series, hour), each hour scored
    * against its trailing `win` OBSERVED hours (rows frame; quiet
    * hours are simply absent — the standard sparse-series monitor).
    * All moments are EXACT integer window sums (n, Σc, Σc²); the
    * z-score is one fixed dag of IEEE-exactly-rounded double ops on
    * those integers — ((c·n − Σc)/n) / √((n·Σc² − (Σc)²)/(n·(n−1))) —
    * rounded to 6 dp, so it is engine-neutral WITHOUT trusting any
    * engine's stddev kernel (Welford vs naive differ in final ulps).
    * Warm-up rows (fewer than `win` trailing hours) and zero-variance
    * windows score NULL and are never flagged. Output: (series, hr,
    * n_events, z, anomaly = |z| > zThresh).
    *
    * 100 TB: the raw stream collapses to (series, hour) partials
    * FIRST (map-side combine), so the window input is support-sized
    * (|series| × hours, ~9k rows per series-year) and the rows-frame
    * window streams incrementally — no raw-event state anywhere. */
  /** DAU / MAU / stickiness — the engagement profile next to
    * [[retention]]: per observed activity day, the count of distinct
    * active users that day (DAU), the count of distinct users active
    * in the trailing 28 days (MAU), and stickiness = DAU/MAU in ppm
    * (exact integer div). Rolling DISTINCT aggregates don't decompose
    * into window sums, so MAU is computed the scale-safe way: the raw
    * stream collapses to the DISTINCT (user, day) activity frame
    * FIRST (support-sized: users × active days), each activity row
    * explodes to the <= 28 future days it keeps the user "monthly
    * active" for, and a second distinct + hash agg counts users per
    * day — bounded 28x blowup of a support-sized frame, never a
    * distinct-over-window state machine. Days with no activity are
    * absent (DAU undefined). */
  def dauMau(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 28): DataFrame = {
    val act = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val dau = act.groupBy("d").agg(count(lit(1)).as("dau"))
    val span = act
      .select(col("u"), explode(
        expr(s"sequence(d, date_add(d, ${windowDays - 1}))")).as("d"))
      .distinct()
    val mau = span.groupBy("d").agg(count(lit(1)).as("mau"))
    dau.join(mau, "d")
      .select(col("d").as("day"), col("dau"), col("mau"),
        expr("(1000000 * dau) div mau").as("stickiness_ppm"))
  }

  def rollingAnomaly(events: DataFrame, seriesCol: String, tsCol: String,
      win: Int = 24, zThresh: Double = 3.0): DataFrame = {
    val hourly = events
      .select(col(seriesCol), date_trunc("hour", col(tsCol)).as("hr"))
      .groupBy(col(seriesCol), col("hr"))
      .agg(count(lit(1)).as("n_events"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(seriesCol)).orderBy(col("hr"))
      .rowsBetween(-(win - 1), 0)
    hourly
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("n_events")).over(w))
      .withColumn("__ss", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("z",
        when(col("__n") < win ||
            col("__n") * col("__ss") === col("__s") * col("__s"),
          lit(null).cast("double"))
        .otherwise(round(
          ((col("n_events") * col("__n") - col("__s")).cast("double")
            / col("__n"))
          / sqrt((col("__n") * col("__ss") - col("__s") * col("__s"))
            .cast("double") / (col("__n") * (col("__n") - lit(1L)))), 6)))
      .select(col(seriesCol), col("hr"), col("n_events"), col("z"),
        coalesce(abs(col("z")) > zThresh, lit(false)).as("anomaly"))
  }
}

object Rel {

  /** Z-ORDER value of two bounded non-negative integer columns — the
    * data-LAYOUT operator a 100 TB write pipeline clusters by: sorting
    * rows by the bit-interleaved z-value before writing gives every
    * parquet row group a tight min/max envelope on BOTH dimensions, so
    * later scans filtering on either column (or both) prune row groups
    * instead of reading them. Inputs must lie in [0, 2^bits); the
    * z-value is a sum of 2*bits integer terms — pure int64 arithmetic
    * (div/%/literal powers, no shift builtins), identical on any
    * engine. */
  def zorderValue(xCol: String, yCol: String, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { i =>
      Seq(s"(($xCol div ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($yCol div ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }
    expr(terms.mkString(" + "))
  }

  /** PURE range join (no shared equi-key) via TIME-BUCKETING — the
    * scale plan for point-in-interval joins where neither side offers
    * an equi-key: a naive `p.ts BETWEEN i.start AND i.end` join plans
    * as a nested-loop cross product (every point against every
    * interval). Here both sides key on coarse time buckets of width
    * `bucketMicros`: each point lands in exactly ONE bucket, each
    * interval explodes to the buckets it overlaps (sequence — an
    * interval costs ceil(len/W)+1 rows), the join is a plain shuffle
    * EQUI-join on the bucket, and the exact (open, closed]
    * `start < ts <= end` predicate filters residually. No pair is
    * duplicated (a point has one bucket), none is missed (its
    * interval's bucket list covers that bucket). Size `bucketMicros`
    * near the typical interval length: smaller buckets replicate
    * intervals, larger ones admit more residual candidates.
    * Output: all columns of both inputs for the matching pairs
    * (caller disambiguates column names). */
  def rangeJoinBucketed(points: DataFrame, pTs: String,
      intervals: DataFrame, iStart: String, iEnd: String,
      bucketMicros: Long): DataFrame = {
    val p = points.withColumn("__b",
      expr(s"unix_micros($pTs) div $bucketMicros"))
    val i = intervals.withColumn("__b", explode(expr(
      s"sequence(unix_micros($iStart) div $bucketMicros, " +
        s"unix_micros($iEnd) div $bucketMicros)")))
    p.join(i, "__b")
      .where(col(pTs) > col(iStart) && col(pTs) <= col(iEnd))
      .drop("__b")
  }

  /** CDC MERGE (upsert + delete) of a compacted change batch into a
    * base snapshot — the table-maintenance operator every 100 TB
    * ingest pipeline runs: `changes` carries at most ONE row per key
    * (the CDC compaction contract) with `opCol` = 'U' (upsert: update
    * or insert) or 'D' (delete); the result is last-writer-wins.
    * Non-key/op columns of `changes` must match `base`'s schema.
    *
    * Computed as base ANTI-JOIN touched-keys UNION ALL upserts. The
    * touched-key set is broadcast (a CDC delta is small relative to
    * the snapshot), so the 100 TB base is NEVER shuffled — one
    * broadcast probe pass plus a union, and predicates composed on
    * the result still push down to the base scan on both union
    * branches. The grouped/windowed alternatives (max_by(version) or
    * row_number over key) shuffle the whole base on the key; this
    * shape is why merge-on-read readers win at scale.
    *
    * `broadcastChanges = false` drops the broadcast hint for the rare
    * backfill-sized delta that exceeds executor memory: the anti-join
    * then plans as a shuffle join on the key — pay one base shuffle
    * rather than an OOM. Same results either way. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", broadcastChanges: Boolean = true): DataFrame = {
    val touched = changes.select(col(keyCol)).distinct()
    val probe = if (broadcastChanges) broadcast(touched) else touched
    base.join(probe, Seq(keyCol), "left_anti")
      .unionByName(changes.where(col(opCol) === "U").drop(opCol))
  }

  /** SCD TYPE-2 history build from a change log — the dimension-
    * history operator: per key, collapse the (ts, tie)-ordered log to
    * its CHANGE POINTS (rows where `attrCol` differs from the
    * previous row, null-safely) and emit versioned validity
    * intervals: `valid_from` = the change's timestamp, `valid_to` =
    * the NEXT change's (NULL while current), `version` 1-based.
    *
    * NULL-attr semantics: the change-point filter is
    * `NOT (prev <=> attr)` — the SQL `prev IS DISTINCT FROM attr`.
    * A NULL→NULL repeat is NOT a change (dropped), a value→NULL or
    * NULL→value transition IS (kept), and a key's first row is a
    * change iff its attr is non-NULL (lag(1) yields NULL-prev, so a
    * key whose log STARTS with NULL attrs opens its history at the
    * first non-NULL — an all-NULL key emits no versions). An oracle twin
    * must use IS DISTINCT FROM, not `prev IS NULL OR prev <> attr`,
    * which diverges on NULL attrs in both directions.
    * Timestamp ties break by `tieCol` (a unique row id), so the
    * history is deterministic under duplicate timestamps.
    *
    * 100 TB: ONE shuffle on the key — both windows use the same
    * (key, ts, tie) sort order, and the change-point filter runs
    * between them, so the second window re-sorts only the support-
    * sized change-point frame. Per-key state is a single lookback row
    * (lag 1): a hot key with 10^6 log rows streams through, nothing
    * is collected. */
  def scd2History(log: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val points = log
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(!(col("__prev") <=> col(attrCol)))
    points.select(col(keyCol),
      row_number().over(w).cast("long").as("version"),
      col(attrCol),
      col(tsCol).as("valid_from"),
      lead(col(tsCol), 1).over(w).as("valid_to"))
  }

  /** The same z-value term sum as ANSI SQL (DuckDB `//`), for oracle
    * twins of [[zorderValue]]. */
  def zorderSql(xCol: String, yCol: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"(($xCol // ${1L << i}) % 2) * ${1L << (2 * i)}",
        s"(($yCol // ${1L << i}) % 2) * ${1L << (2 * i + 1)}")
    }.mkString(" + ")

  /** Bloom-prefiltered exact equi-join: builds a bloom filter over the
    * dim keys (one aggregation action, like a broadcast build), drops
    * fact rows that cannot match BEFORE the join shuffle, then runs the
    * exact join — false positives are erased by the join, so the result
    * is exact. Spark's runtime row-level filtering made explicit and
    * scale-tunable. `expectedDimKeys` is an upper bound (from table
    * stats); fpp holds while actual <= expected.
    *
    * Pushdown boundary: `mightContain` has no Column form, so the bloom
    * membership test is a scala UDF — OPAQUE to Catalyst. Predicates on
    * `fact` that should reach the parquet scan (PushedFilters / row-
    * group skipping) must be applied to `fact` BEFORE calling this
    * function; Catalyst does still reorder deterministic filters below
    * the UDF, but source-level pushdown of a filter composed on the
    * RESULT is not guaranteed across the join. ApiSpec pins that a
    * pre-applied fact filter reaches the scan. */
  def bloomPrefilteredJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedDimKeys: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedDimKeys, fpp)
    val bfB = fact.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bfB.value.mightContain(k))
    fact.where(might(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}

object Graph {

  /** Integer-mass PAGERANK over an undirected edge list, a FIXED
    * number of iterations — the other classic iterative graph
    * operator next to [[Dedup.connectedComponents]] (centrality of
    * docs inside near-dup clusters, influence in an interaction
    * graph). DETERMINISTIC BY CONSTRUCTION: the total mass is an
    * integer (`totalMicro` micro-units), every redistribution is a
    * floor-div (`r div deg`, damping as `(85 * x) div 100`), and all
    * per-node inflows are INTEGER sums — no float accumulation
    * anywhere, so any engine, partitioning, or schedule produces
    * bit-identical ranks (floor-div loses mass to rounding; ranking
    * and ratios are unaffected and determinism is what a graded
    * pipeline needs). Nodes are the edge endpoints (deg >= 1 by
    * construction, so no dangling-mass term).
    *
    * 100 TB: each iteration is one equi-join of the rank frame onto
    * the edge list plus one hash agg on the destination — the same
    * shuffle-per-superstep shape as connectedComponents; edges, deg
    * and each rank frame are localCheckpoint'd so the lineage stays
    * flat across iterations. Fixed `iters` (not convergence) keeps
    * the oracle expressible as an unrolled CTE chain. */
  def pagerankMicro(edges: DataFrame, a: String = "d1", b: String = "d2",
      iters: Int = 3, totalMicro: Long = 1000000000000L): DataFrame = {
    val e0 = edges
      .select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
      .localCheckpoint(true)
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val nn = deg.agg(count(lit(1)).as("n"))
    var rank = deg.crossJoin(broadcast(nn))
      .select(col("src").as("node"), col("deg"), col("n"),
        expr(s"$totalMicro div n").as("r"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val inflow = und
        .join(rank.select(col("node").as("src"),
          expr("r div deg").as("c")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("c")).as("inflow"))
      rank = rank.select("node", "deg", "n").join(inflow, "node")
        .select(col("node"), col("deg"), col("n"),
          (expr(s"(15 * ($totalMicro div n)) div 100")
            + expr("(85 * inflow) div 100")).as("r"))
        .localCheckpoint(true)
    }
    rank.select(col("node"), col("r").as("rank_micro"))
  }
}

object Sketch {

  /** Two-level mergeable-sketch rollup: HLL sketches of `keyCol` at
    * the `fine` grouping, then re-aggregated to the `coarse` grouping
    * by sketch UNION — the store-once/roll-up-anywhere pattern that
    * avoids re-scanning the fact table for every coarser level.
    * `lgK` is the accuracy/size dial: RSE ~ 1.04/sqrt(2^lgK), so 12 →
    * ±~1.6% at 4 KB/sketch; raise it at 100 TB cardinalities where the
    * default's error band matters. Output: coarse keys + estimate
    * (bigint) + n_groups. */
  def hllRollup(df: DataFrame, keyCol: String, fine: Seq[String],
      coarse: Seq[String], lgK: Int = 12): DataFrame =
    df.groupBy(fine.map(col): _*)
      .agg(expr(s"hll_sketch_agg($keyCol, $lgK)").as("sk"))
      .groupBy(coarse.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("estimate"),
        count(lit(1)).as("n_groups"))

  /** Theta-sketch aggregate of a BIGINT column (set-algebra-capable:
    * see graft.functions.SketchExprs), with the same lgK dial as
    * [[hllRollup]] — exact below 2^lgK distincts, ±1/sqrt(2^lgK)
    * beyond. Registers the session function on first use. */
  def thetaAgg(df: DataFrame, child: String, lgK: Int = 12): Column = {
    graft.functions.SketchExprs.ensureRegistered(df.sparkSession)
    expr(s"graft_theta_agg($child, $lgK)")
  }

  /** Two-level mergeable-QUANTILE rollup — the percentile twin of
    * [[hllRollup]], on the native KLL aggregates (functions.KllExprs):
    * KLL sketches of `valueCol` at the `fine` grouping, re-aggregated
    * to `coarse` by sketch MERGE, quantile estimates at `ranks`
    * (columns p50, p90, ... from the rank×100). Store the fine
    * sketches once; any coarser percentile dashboard is a merge over
    * sketches, never a re-scan/re-sort of the fact table. `k` dials
    * normalized rank error (~1.65% at the default 200) and threads
    * through the merge buffers too (KLL merge takes the MIN k of its
    * inputs — a default-k buffer would downgrade finer sketches).
    * Estimates are rounded to 4dp; column names keep the rank's full
    * precision (p50, p99, p99_9 — not a rounded percent, which would
    * collide ranks >= 0.995 at p100). Output: coarse keys + p-columns
    * + n_groups. */
  def kllRollup(df: DataFrame, valueCol: String, fine: Seq[String],
      coarse: Seq[String], ranks: Seq[Double], k: Int = 200): DataFrame = {
    graft.functions.KllExprs.ensureRegistered(df.sparkSession)
    val merged = df.groupBy(fine.map(col): _*)
      .agg(expr(s"graft_kll_agg($valueCol, $k)").as("sk"))
      .groupBy(coarse.map(col): _*)
      .agg(expr(s"graft_kll_merge_agg(sk, $k)").as("sk"),
        count(lit(1)).as("n_groups"))
    val qCols = ranks.map { r =>
      val pct = (BigDecimal(r.toString) * 100).underlying
        .stripTrailingZeros.toPlainString.replace('.', '_')
      expr(s"round(graft_kll_quantile(sk, ${r}D), 4)").as(s"p$pct")
    }
    merged.select(coarse.map(col) ++ qCols :+ col("n_groups"): _*)
  }

  /** Mergeable TOP-K rollup (heavy hitters): build one frequent-items
    * sketch per `fine` grouping, merge to `coarse`, emit the top `k`
    * items per coarse group as (coarse..., rank, item, est) rows.
    * Store-once/roll-up-anywhere like [[hllRollup]]/[[kllRollup]]: the
    * fine-sketch frame is the storable ingest product; any coarser
    * top-k is a merge over it, never a re-scan of the item rows — and
    * unlike an exact top-k, the shuffled state per group is a
    * FIXED-SIZE binary, not an unbounded (group, item) count table.
    * `maxMapSize` (power of 2) is the size/error dial: estimates are
    * within ~3.5/maxMapSize of the stream length, EXACT while a
    * group's distinct items stay under ~0.75*maxMapSize (FreqSpec
    * bounds the constrained regime; the graded query runs exact). */
  def freqTopkRollup(df: DataFrame, itemCol: String, fine: Seq[String],
      coarse: Seq[String], k: Int, maxMapSize: Int = 128): DataFrame = {
    graft.functions.FreqExprs.ensureRegistered(df.sparkSession)
    df.groupBy(fine.map(col): _*)
      .agg(expr(s"graft_freq_agg($itemCol, $maxMapSize)").as("sk"))
      .groupBy(coarse.map(col): _*)
      .agg(expr(s"graft_freq_merge_agg(sk, $maxMapSize)").as("sk"))
      // _outer: a coarse group whose merged sketch is empty (all-null
      // items) keeps its row with null rank/item/est instead of
      // vanishing — matches hllRollup/kllRollup, which keep every
      // group (review r6).
      .select(coarse.map(col) :+
        posexplode_outer(expr(s"graft_freq_topk(sk, $k)")): _*)
      .select(coarse.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("item"),
        col("col.est").as("est")): _*)
  }
}

object Profile {

  /** Column profiling ("analyze table" before training): per-column
    * non-null / distinct / min / max in ONE pass — a single wide agg
    * (multi-distinct compiles to one Expand + aggregation, no
    * per-column rescans), stack() unpivoted to a row per column.
    * min/max are taken in each column's native type and cast to string
    * only for the uniform output schema.
    *
    * `approx` is the 100 TB dial: false = exact countDistinct (the
    * oracle-verifiable default; the Expand multiplies rows by the
    * number of distinct-measures); true = approx_count_distinct per
    * column at relative error `rsd` — a mergeable HLL± partial agg
    * with NO Expand, so the pass stays one narrow scan regardless of
    * how many columns are profiled.
    *
    * The exact path executes `df` k+1 times (one pruned branch per
    * column + the n_rows branch) and assumes a SCAN-BACKED input:
    * for a bare parquet relation each branch prunes to one column,
    * so total bytes read equal one wide scan. A derived or expensive
    * upstream frame multiplies its cost k+1×, and a non-deterministic
    * one can make branches mutually inconsistent — callers in that
    * position should `localCheckpoint()` (or persist) the input
    * first, or use `approx = true`, whose single agg executes the
    * input exactly once. */
  def columns(df: DataFrame, cols: Seq[(String, Column)],
      approx: Boolean = false, rsd: Double = 0.05): DataFrame = {
    if (approx) {
      // approx path: ONE agg over one scan — approx_count_distinct is
      // a plain partial aggregate, so no Expand appears
      val measures = count(lit(1)).as("n_rows") +: cols.flatMap {
        case (n, v) =>
          Seq(count(v).as(s"nn_$n"), approx_count_distinct(v, rsd)
            .as(s"nd_$n"),
            min(v).cast("string").as(s"mn_$n"),
            max(v).cast("string").as(s"mx_$n"))
      }
      val stackArgs = cols.map { case (n, _) =>
        s"'$n', nn_$n, nd_$n, mn_$n, mx_$n" }.mkString(", ")
      df.agg(measures.head, measures.tail: _*)
        .select(col("n_rows"), expr(s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nonnull, n_distinct, min_val, max_val)"))
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
    } else {
      // exact path: one branch PER COLUMN — a single distinct
      // aggregate plans as a two-phase hash agg (no Expand), and each
      // branch's parquet scan prunes to exactly its one column, so k
      // narrow scans read the same total bytes as one k-column scan
      // did — minus the k+1-way Expand row blowup the old multi-
      // distinct single agg paid (was the #1 CPU query at sf0.1;
      // 7.6 -> 1.4 CPU-s measured)
      val nRows = df.agg(count(lit(1)).as("n_rows"))
      cols.map { case (n, v) =>
        df.agg(count(v).as("n_nonnull"), countDistinct(v).as("n_distinct"),
            min(v).cast("string").as("min_val"),
            max(v).cast("string").as("max_val"))
          .select(lit(n).as("col_name"), col("n_nonnull"),
            col("n_distinct"), col("min_val"), col("max_val"))
      }.reduce(_.unionAll(_))
        .crossJoin(broadcast(nRows))
        .select(col("col_name"), col("n_rows"), col("n_nonnull"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
  }

  /** Distribution DRIFT profile (PSI decomposition): how far each
    * side's `valueCol` distribution sits from the pooled corpus
    * distribution, per equal-width bucket — the data-quality check a
    * pipeline runs when a new source/shard lands. Values are binned on
    * exact integer cents (fixture doubles carry <= 2 fractional
    * digits, so round(v*100) is the engine-neutral integerization —
    * the Det decimal rule applied to binning); bucket = ((c - min) *
    * buckets) div (max - min + 1), all integer. Per (side, bucket) the
    * population-stability-index CONTRIBUTION (p - q) * ln(p / q) with
    * Laplace-smoothed shares p = (n_sb + 1)/(n_s + buckets), q =
    * (n_b + 1)/(n + buckets); per-bucket rows rather than a summed PSI
    * so no cross-row double summation enters the graded output (sum
    * order is engine-dependent; the per-row value is not), and the
    * bucket decomposition is what a debugging engineer actually reads.
    * Output: (side, bucket, n, psi_contrib) — dense over sides x
    * buckets, zeros included.
    *
    * 100 TB: one 1-row min/max agg broadcast back, one (side, bucket)
    * hash agg (partial map-side — cardinality sides x buckets, tiny),
    * then broadcast-size arithmetic; the value column is the only
    * thing scanned. */
  def drift(df: DataFrame, sideCol: String, valueCol: String,
      buckets: Int = 10): DataFrame = {
    val cents = df.select(col(sideCol).as("side"),
      round(col(valueCol) * 100).cast("long").as("cents"))
    val mm = cents.agg(min(col("cents")).as("mn"), max(col("cents")).as("mx"))
    val binned = cents.crossJoin(broadcast(mm))
      .select(col("side"),
        expr(s"((cents - mn) * $buckets) div (mx - mn + 1)").as("bucket"))
    val nsb = binned.groupBy("side", "bucket").agg(count(lit(1)).as("n_raw"))
    val spark = df.sparkSession
    val grid = nsb.select("side").distinct()
      .crossJoin(spark.range(buckets).select(col("id").as("bucket")))
    val dense = grid.join(nsb, Seq("side", "bucket"), "left")
      .select(col("side"), col("bucket"),
        coalesce(col("n_raw"), lit(0L)).as("n_sb"))
    val ns = dense.groupBy("side").agg(sum(col("n_sb")).as("n_s"))
    val nb = dense.groupBy("bucket").agg(sum(col("n_sb")).as("n_b"))
    val n = dense.agg(sum(col("n_sb")).as("n"))
    val p = (col("n_sb").cast("double") + 1) / (col("n_s") + buckets)
    val q = (col("n_b").cast("double") + 1) / (col("n") + buckets)
    dense.join(broadcast(ns), "side").join(broadcast(nb), "bucket")
      .crossJoin(broadcast(n))
      .select(col("side"), col("bucket"), col("n_sb").as("n"),
        round((p - q) * log(p / q), 6).as("psi_contrib"))
  }

  /** KEY-SKEW diagnostics — the profile an engineer runs BEFORE a big
    * join/agg to find the keys that will kill it: group-size max,
    * exact discrete p50/p99 of group sizes, the heaviest key, and
    * max/mean ratio in ppm. One 1-row summary.
    *
    * The percentiles are EXACT yet need no global sort: group sizes
    * are first histogrammed (distinct sizes — a frame bounded by the
    * group-size SUPPORT, tiny at any data scale), the cumulative count
    * comes from a broadcast theta self-join of that tiny frame, and
    * p = min size whose cumulative key-count reaches ceil(p * n_keys)
    * — all integer arithmetic, engine-neutral. Every post-histogram
    * frame is broadcast-sized; the only full-data pass is the initial
    * count-per-key hash agg (map-side partial). */
  def keySkew(df: DataFrame, keyCol: String): DataFrame = {
    // One full-data pass (count-per-key hash agg, map-side partial);
    // the support histogram then carries EVERYTHING downstream —
    // per-size key-count AND the min key per size, so neither the raw
    // frame nor the counts frame is re-derived (the first cut of this
    // query re-derived counts 3x across ~10 distinct codegen units and
    // paid ~6 CPU-s of Janino compile for a 1-row answer).
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val dist = counts.groupBy("cnt")
      .agg(count(lit(1)).as("freq"), min("key").as("min_key"))
    val cum = dist.as("a")
      .join(broadcast(dist.select("cnt", "freq").as("b")),
        col("b.cnt") <= col("a.cnt"))
      .groupBy(col("a.cnt").as("cnt"), col("a.freq").as("freq"),
        col("a.min_key").as("min_key"))
      .agg(sum(col("b.freq")).as("cumk"))
    // cumk at the largest size is the total key count, so the 1-row
    // totals frame is itself support-sized work; max_by(min_key, cnt)
    // is deterministic because cnt is unique within dist.
    val tot = cum.agg(max("cumk").as("n_keys"),
      sum(expr("cnt * freq")).as("n_rows"), max("cnt").as("max_cnt"),
      expr("max_by(min_key, cnt)").as("top_key"))
    cum.crossJoin(broadcast(tot))
      .agg(
        min(when(col("cumk") >= expr("(1 * n_keys + 2 - 1) div 2"),
          col("cnt"))).as("p50_cnt"),
        min(when(col("cumk") >= expr("(99 * n_keys + 100 - 1) div 100"),
          col("cnt"))).as("p99_cnt"),
        first("n_keys").as("n_keys"), first("n_rows").as("n_rows"),
        first("max_cnt").as("max_cnt"), first("top_key").as("top_key"))
      .select(col("n_keys"), col("n_rows"), col("max_cnt"),
        col("p50_cnt"), col("p99_cnt"), col("top_key"),
        // ppm numerator through decimal(38,0): 1e6 * max_cnt * n_keys
        // exceeds int64 once max_cnt*n_keys > ~9.2e12 (1e8 keys with a
        // 1e5-row hot key — realistic at 100 TB). Same rule as
        // Text.corpusStats; bit-identical to the oracle's // wherever
        // both fit.
        expr("cast((1000000 * cast(max_cnt as decimal(38,0)) * n_keys)" +
          " div n_rows as bigint)").as("skew_ratio_ppm"))
  }

  /** JOIN-CARDINALITY estimate WITHOUT running the join — the other
    * pre-flight profile (sibling of [[keySkew]]): exact output rows of
    * `a ⋈ b` on an equi-key = Σ over shared keys of cnt_a·cnt_b,
    * computed from the two per-key count frames. Each side is one
    * hash-agg pass (map-side partial); the per-key join is
    * key-cardinality-sized, never row-sized — at 100 TB you pay two
    * count-aggs to learn whether the real join would emit 10^9 or
    * 10^13 rows, and WHICH key dominates it (tie on contribution
    * breaks to the smallest key, so the answer is deterministic).
    * One row: key counts per side, shared keys, exact join rows, the
    * worst key + its contribution, and that key's share in ppm. */
  def joinCardinality(a: DataFrame, aKey: String,
      b: DataFrame, bKey: String): DataFrame = {
    // r9 fuse (VERDICT r8 task 7): the old shape ran THREE serial
    // localCheckpoint jobs (ca, cb, contrib) before the final action —
    // 4.42 s wall vs 1.76 CPU-s at sf0.1, pure job serialization. Now
    // both sides union into ONE tagged count-agg (same total shuffle
    // volume: rows_a + rows_b), the per-key frame checkpoints once
    // (eager — it feeds the totals and the side counts), and every
    // remaining consumer is a support-sized scan inside the single
    // final action: 2 jobs total instead of 4.
    val grouped = a.select(col(aKey).as("key"), lit(1L).as("__sa"))
      .unionAll(b.select(col(bKey).as("key"), lit(0L).as("__sa")))
      .groupBy("key")
      .agg(sum("__sa").as("cnt_a"), sum(lit(1L) - col("__sa")).as("cnt_b"))
      .localCheckpoint(true)
    // NULL keys never join: they count toward each side's key
    // cardinality (as in the per-side aggs of the old shape) but are
    // excluded from the shared-key contribution frame.
    val contrib = grouped
      .where(col("key").isNotNull && col("cnt_a") > 0 && col("cnt_b") > 0)
      .select(col("key"), (col("cnt_a") * col("cnt_b")).as("rows_k"))
    // One agg produces totals AND the dominant key: min_by over
    // (-rows_k, key) = largest contribution, smallest key on ties —
    // deterministic (key is unique) and identical to the oracle's
    // MIN(key) WHERE rows_k = MAX(rows_k). rows_k > 0 so the negation
    // cannot overflow. Empty contrib (disjoint key sets) yields
    // count=0 with NULL sum/max/top_key — exactly the oracle's
    // aggregate-over-empty semantics (r7 edge-case fix preserved).
    val tot = contrib.agg(count(lit(1)).as("n_keys_common"),
      sum("rows_k").as("join_rows"), max("rows_k").as("max_key_rows"),
      min_by(col("key"), struct((-col("rows_k")).as("nr"), col("key")))
        .as("top_key"))
    val sides = grouped.agg(
      coalesce(sum(when(col("cnt_a") > 0, 1L).otherwise(0L)), lit(0L))
        .as("n_keys_a"),
      coalesce(sum(when(col("cnt_b") > 0, 1L).otherwise(0L)), lit(0L))
        .as("n_keys_b"))
    tot.crossJoin(broadcast(sides))
      .select(col("n_keys_a"), col("n_keys_b"), col("n_keys_common"),
        col("join_rows"), col("max_key_rows"), col("top_key"),
        // decimal(38,0) numerator: 1e6 * max_key_rows overflows int64
        // once the hot key contributes > ~9.2e12 join rows.
        expr("cast((1000000 * cast(max_key_rows as decimal(38,0)))" +
          " div join_rows as bigint)").as("top_key_share_ppm"))
  }

  /** WINSORIZED (value-trimmed) mean per group — the robust average a
    * metrics pipeline wants when a group's tail is garbage: per group,
    * the discrete p-lo/p-hi bounds on EXACT integer cents (the Det
    * decimal rule — round(v*100) before any comparison) and the mean
    * of rows whose value lies within [lo, hi] INCLUSIVE. Trimming is
    * by VALUE, not rank, so ties at the boundary are kept
    * symmetrically and the result is engine-neutral: the value at
    * sorted position k is deterministic even though row_number breaks
    * ties arbitrarily.
    *
    * `approx` is the 100 TB dial. false (the oracle-checked default):
    * bounds from a per-group sort window — exact, but each window
    * partition is a whole group on one reducer, the full-sort-on-
    * skewed-key plan that dies when one group is 1/5 of a 100 TB
    * table. true: bounds from a KLL sketch (functions.KllExprs) — one
    * hash agg with map-side partial merge, NO sort anywhere; the
    * bounds are actual stream values within the KLL rank band
    * (~±1.65% of rank at k=200), and the rest of the plan (inclusive
    * value filter + filtered agg) is unchanged. ApiSpec bounds the
    * approx bounds' true ranks against the band.
    * Output: (groupCol, n, lo_cents, hi_cents, n_kept, trimmed_mean). */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      loPct: Int = 5, hiPct: Int = 95, approx: Boolean = false,
      k: Int = 200): DataFrame = {
    val c = df.select(col(groupCol).as("g"),
      expr(s"CAST(ROUND($valueCol * 100) AS BIGINT)").as("cents"))
    val bounds = if (approx) {
      graft.functions.KllExprs.ensureRegistered(df.sparkSession)
      // cents are integers |v| <= 2^53, exact as doubles; getQuantile
      // returns a retained stream item, so the cast back is lossless.
      c.groupBy("g").agg(count(lit(1)).as("n"),
          expr(s"graft_kll_agg(cast(cents as double), $k)").as("sk"))
        .select(col("g"), col("n"),
          expr(s"cast(graft_kll_quantile(sk, ${loPct / 100.0}D) as bigint)")
            .as("lo_cents"),
          expr(s"cast(graft_kll_quantile(sk, ${hiPct / 100.0}D) as bigint)")
            .as("hi_cents"))
    } else {
      val n = c.groupBy("g").agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy("cents")
      c.join(n, "g")
        .withColumn("rk", row_number().over(w))
        .groupBy("g", "n").agg(
          min(when(col("rk") === expr(s"($loPct * n + 99) div 100"),
            col("cents"))).as("lo_cents"),
          min(when(col("rk") === expr(s"($hiPct * n + 99) div 100"),
            col("cents"))).as("hi_cents"))
    }
    c.join(bounds, "g")
      .where(col("cents") >= col("lo_cents") &&
        col("cents") <= col("hi_cents"))
      .groupBy(col("g"), col("n"), col("lo_cents"), col("hi_cents"))
      .agg(count(lit(1)).as("n_kept"), sum("cents").as("s"))
      .select(col("g").as(groupCol), col("n"), col("lo_cents"),
        col("hi_cents"), col("n_kept"),
        round(col("s").cast("double") / col("n_kept") / 100.0, 6)
          .as("trimmed_mean"))
  }

  /** CROSS-CORPUS shingle overlap — the corpus-level contamination /
    * redundancy metric between two sources: distinct k-shingle set
    * sizes per side, the shared count, directed containment (what
    * fraction of B's content A already covers — the number that says
    * "skip ingesting B") and Jaccard, all as exact ppm integers. One
    * pass: distinct (side, shingle) → per-shingle presence flags
    * (shuffle keyed on shingle — never a doc pair space) → 1-row agg. */
  def corpusOverlap(docs: DataFrame, groupCol: String, textCol: String,
      ga: String, gb: String, k: Int = 3): DataFrame = {
    val sh = Text.shingles(
      docs.where(col(groupCol).isin(ga, gb))
        .select(col(groupCol).as("grp"), col(textCol)),
      "grp", textCol).distinct()
    sh.groupBy("shingle").agg(
        max(when(col("grp") === ga, 1L).otherwise(0L)).as("in_a"),
        max(when(col("grp") === gb, 1L).otherwise(0L)).as("in_b"))
      .agg(sum("in_a").as("n_a"), sum("in_b").as("n_b"),
        sum(col("in_a") * col("in_b")).as("n_common"))
      .select(col("n_a"), col("n_b"), col("n_common"),
        expr("(1000000 * n_common) div n_a").as("a_in_b_cover_ppm"),
        expr("(1000000 * n_common) div n_b").as("b_in_a_cover_ppm"),
        expr("(1000000 * n_common) div (n_a + n_b - n_common)")
          .as("jaccard_ppm"))
  }

  /** END-TO-END corpus-pipeline report — the composition check for the
    * stages a training-data pipeline chains: length gate → blocklist →
    * repetition filter → near-dup dedup (MinHash candidates → connected
    * components, cluster representative survives) → benchmark
    * decontamination vs an external probe set. Emits one row PER STAGE:
    * (stage, stage_name, n_in, n_kept, n_dropped) — row-conserving by
    * construction (n_in = n_kept + n_dropped; stage i+1's n_in = stage
    * i's n_kept), which is where composed operator contracts actually
    * break (double-counted drops, survivors resurrected by a later
    * join).
    *
    * Plan shape: stages 1-3 gate on per-doc metrics that all come out
    * of ONE tokenize pass (the metrics frame and the stage-3/4 survivor
    * frames localCheckpoint eagerly, so the six stage counts and the
    * downstream stages never re-execute the upstream chain — the
    * report would otherwise cost O(stages²) corpus scans). Stage 4
    * accepts the STORED signature frame via `precomputedSigs` (a doc's
    * signature is corpus-independent) and then touches only stage-3
    * survivor ids. At 100 TB a production run materializes each stage
    * to storage (the StoreOps pattern) and this report is the
    * bookkeeping emitted alongside; every stage is individually
    * scale-shaped (broadcast blocklist probe, per-doc aggs, banded
    * MinHash — never a pair space, probe grams broadcast). */
  def pipelineReport(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, probes: DataFrame,
      perms: Seq[(Int, Long, Long)], minTokens: Long = 25L,
      maxBlockHits: Long = 5L, maxDupTokenPpm: Long = 650000L,
      minMatches: Int = 8, gramK: Int = 8,
      precomputedSigs: Option[DataFrame] = None): DataFrame = {
    val stages = pipelineStageFrames(docs, idCol, textCol, blocklist,
      probes, perms, minTokens, maxBlockHits, maxDupTokenPpm,
      minMatches, gramK, precomputedSigs)
    val counts = stages.zipWithIndex.map { case ((nm, df), i) =>
      df.agg(count(lit(1)).as("n_kept"))
        .select(lit(i.toLong).as("stage"), lit(nm).as("stage_name"),
          col("n_kept"))
    }.reduce(_.unionAll(_))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
    counts
      .withColumn("n_in", lag(col("n_kept"), 1).over(w))
      .where(col("stage") >= 1)
      .select(col("stage"), col("stage_name"), col("n_in"), col("n_kept"),
        (col("n_in") - col("n_kept")).as("n_dropped"))
  }

  /** Stage names of the corpus pipeline, index-aligned with
    * [[pipelineStageMap]]'s `last_stage` values (0 = input). */
  val pipelineStageNames: Seq[String] =
    Seq("input", "length", "blocklist", "repetition", "neardup",
      "decontaminate")

  /** Per-doc stage MEMBERSHIP of the corpus pipeline — the same stage
    * chain as [[pipelineReport]] (one code path, no drift), collapsed
    * to one row per input doc: (id, last_stage) where `last_stage` is
    * the highest stage index the doc survived (0 = failed the first
    * gate, 5 = full survivor). This is the pipeline's storable
    * bookkeeping artifact: stage frames are strictly nested, so every
    * stage count is `count(last_stage >= i)` and the survivor set is
    * `last_stage = 5` — one stored doc-sized frame replaces re-running
    * the chain for both the report and the output leg. */
  def pipelineStageMap(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, probes: DataFrame,
      perms: Seq[(Int, Long, Long)], minTokens: Long = 25L,
      maxBlockHits: Long = 5L, maxDupTokenPpm: Long = 650000L,
      minMatches: Int = 8, gramK: Int = 8,
      precomputedSigs: Option[DataFrame] = None): DataFrame =
    pipelineStageFrames(docs, idCol, textCol, blocklist, probes, perms,
      minTokens, maxBlockHits, maxDupTokenPpm, minMatches, gramK,
      precomputedSigs)
      .zipWithIndex
      .map { case ((_, df), i) =>
        df.select(col("id"), lit(i.toLong).as("last_stage"))
      }
      .reduce(_.unionAll(_))
      .groupBy("id").agg(max("last_stage").as("last_stage"))

  /** The graded pipeline report recomputed from a STORED
    * [[pipelineStageMap]] frame — identical output to
    * [[pipelineReport]] (nested stages make `n_kept(i) =
    * count(last_stage >= i)` exact), but the cost is one scan of the
    * doc-sized map + a 6x6 broadcast theta-join, not a re-run of the
    * 5-stage chain. */
  def pipelineReportFromMap(stageMap: DataFrame): DataFrame = {
    val s = stageMap.sparkSession
    import s.implicits._
    val names = pipelineStageNames.zipWithIndex
      .map { case (nm, i) => (i.toLong, nm) }.toDF("stage", "stage_name")
    val byLast = stageMap.groupBy("last_stage")
      .agg(count(lit(1)).as("c"))
    val kept = names
      .join(broadcast(byLast), col("last_stage") >= col("stage"), "left")
      .groupBy("stage", "stage_name")
      .agg(coalesce(sum("c"), lit(0L)).as("n_kept"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
    kept
      .withColumn("n_in", lag(col("n_kept"), 1).over(w))
      .where(col("stage") >= 1)
      .select(col("stage"), col("stage_name"), col("n_in"), col("n_kept"),
        (col("n_in") - col("n_kept")).as("n_dropped"))
  }

  /** SURVIVORS of the corpus pipeline — the same stage chain as
    * [[pipelineReport]] (one code path, so the report and the frame a
    * downstream consumer trains on can never drift), returning the
    * final-stage document frame (idCol, textCol) instead of counts.
    * This is the input to the OUTPUT leg: mixture/temperature quota →
    * leakage-safe split → shard materialization. localCheckpoint'd
    * eagerly: the consumer fans out into several aggregations and must
    * not re-execute the 5-stage chain per use. */
  def pipelineSurvivors(docs: DataFrame, idCol: String, textCol: String,
      blocklist: DataFrame, probes: DataFrame,
      perms: Seq[(Int, Long, Long)], minTokens: Long = 25L,
      maxBlockHits: Long = 5L, maxDupTokenPpm: Long = 650000L,
      minMatches: Int = 8, gramK: Int = 8,
      precomputedSigs: Option[DataFrame] = None): DataFrame =
    pipelineStageFrames(docs, idCol, textCol, blocklist, probes, perms,
      minTokens, maxBlockHits, maxDupTokenPpm, minMatches, gramK,
      precomputedSigs)
      .last._2.select(col("id").as(idCol), col("txt").as(textCol))
      .localCheckpoint(true)

  /** The shared stage chain behind [[pipelineReport]] /
    * [[pipelineSurvivors]]: (stage_name, frame) pairs in pipeline
    * order; every frame carries the stage's surviving `id`s (doc-frame
    * stages also carry `txt`). See pipelineReport's doc for the
    * per-stage semantics and scale shape. */
  private def pipelineStageFrames(docs: DataFrame, idCol: String,
      textCol: String, blocklist: DataFrame, probes: DataFrame,
      perms: Seq[(Int, Long, Long)], minTokens: Long,
      maxBlockHits: Long, maxDupTokenPpm: Long,
      minMatches: Int, gramK: Int,
      precomputedSigs: Option[DataFrame]): Seq[(String, DataFrame)] = {
    val base = docs.select(col(idCol).as("id"), col(textCol).as("txt"))
      .localCheckpoint(true)
    // Stages 1-3 gate on PER-DOC metrics (token count, blocked-token
    // occurrences, duplicate-token mass) — subset-invariant, so all
    // three come out of ONE tokenize pass over the input instead of one
    // per stage (measured 3 corpus explodes -> 1; the gates themselves
    // become filters on this doc-sized checkpointed frame).
    val metrics = Text.tokens(base, "id", "txt")
      .join(broadcast(blocklist
        .select(col(blocklist.columns.head).as("token"))
        .withColumn("__b", lit(1L))), Seq("token"), "left")
      .groupBy("id", "token")
      .agg(count(lit(1)).as("c"), max("__b").as("b"))
      .groupBy("id")
      .agg(sum("c").as("n_tok"), count(lit(1)).as("nd_tok"),
        sum(when(col("b") === 1L, col("c")).otherwise(0L)).as("n_blocked"))
      .localCheckpoint(true)
    // stage 1 — length gate: too-short docs carry no signal
    val s1ids = metrics.where(col("n_tok") >= minTokens)
    // stage 2 — blocklist: drop docs with >= maxBlockHits blocked-token
    // occurrences (occurrence threshold, not any-hit: one stray word in
    // a long doc is noise, a saturated doc is spam)
    val s2ids = s1ids.where(col("n_blocked") < maxBlockHits)
    // stage 3 — repetition gate (Gopher-style): duplicate-token mass
    val s3ids = s2ids.where(
      expr("(1000000 * (n_tok - nd_tok)) div n_tok") <= maxDupTokenPpm)
    // only stage 3's survivors need their text again (stage 4/5 shingle
    // them); stages 1-2 are counted off the metrics frame directly
    val s3 = base.join(s3ids.select("id"), Seq("id")).localCheckpoint(true)
    // stage 4 — near-dup dedup: banded MinHash candidates -> min-label
    // components; the cluster representative (min id) survives. A doc's
    // signature is corpus-independent, so when the ingest product
    // already exists (`precomputedSigs`: (idCol, perm, minh) — e.g. the
    // stored full-corpus frame) the stage semi-joins it on the stage-3
    // survivor ids instead of re-shingling the corpus.
    val sig = precomputedSigs match {
      case Some(st) => st
        .select(col(idCol).as("id"), col("perm"), col("minh"))
        .join(s3ids.select("id"), "id")
      case None => Dedup.minhashSignatures(
        Text.shingles(s3, "id", "txt"), "id", perms)
    }
    val members = Dedup.connectedComponents(
        Dedup.minhashCandidates(sig, "id", minMatches).select("d1", "d2"))
      .where(col("node") =!= col("label"))
      .select(col("node").as("id"))
    val s4 = s3.join(members, Seq("id"), "left_anti").localCheckpoint(true)
    // stage 5 — decontamination: drop survivors sharing a gramK-gram
    // with the external probe/benchmark set
    def grams(df: DataFrame) = Text.shingles(df, "id", "txt", gramK)
      .withColumnRenamed("shingle", "gram")
    val contaminated = Dedup.contamination(grams(s4),
        grams(probes.select(col(idCol).as("id"), col(textCol).as("txt"))),
        "id")
      .select(col("train_id").as("id")).distinct()
    val s5 = s4.join(contaminated, Seq("id"), "left_anti")
    Seq(("input", base), ("length", s1ids), ("blocklist", s2ids),
      ("repetition", s3), ("neardup", s4), ("decontaminate", s5))
  }

  /** OUTPUT-SHARD balance report: assign each row to one of `nShards`
    * output shards by the engine-neutral multiplicative hash of its id
    * (the stable assignment a shard writer would use — a re-run or a
    * different engine lands every row in the same shard), then report
    * per-shard row count, total weight (e.g. chars/tokens — the thing
    * that actually costs at training time), and the shard's weight
    * share in ppm vs the ideal 1e6/n. One projection + an n-group agg:
    * the check that a 100 TB materialization is not about to write one
    * fat shard. Output: (shard, n_rows, weight, share_ppm). */
  def shardBalance(df: DataFrame, idCol: String, weightCol: String,
      nShards: Int): DataFrame = {
    val sh = df.select(
      (pmod(col(idCol) * lit(1103515245L) + lit(12345L),
        lit(1000000007L)) % nShards).as("shard"),
      col(weightCol).cast("long").as("w"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"), sum("w").as("weight"))
    sh.crossJoin(broadcast(sh.agg(sum("weight").as("tot_w"))))
      .select(col("shard"), col("n_rows"), col("weight"),
        // decimal(38,0) numerator (corpusStats rule): 1e6 * weight
        // overflows int64 past ~9.2e12 chars/tokens per shard.
        expr("cast((1000000 * cast(weight as decimal(38,0)))" +
          " div tot_w as bigint)").as("share_ppm"))
  }

  /** Per-group IQR-fence OUTLIER report (Tukey fences) — the
    * data-quality profile that flags measurement glitches before they
    * poison a training run: per group, exact p25/p75 set the fences
    * lo = p25 - 1.5*IQR, hi = p75 + 1.5*IQR, and the second pass
    * counts values strictly outside. Fences are ROUNDED to 6 dp
    * before comparing so the classify step sees the same boundary on
    * any engine (the quantile interpolation arithmetic is the only
    * cross-engine wobble; §2.0.2). Output: (group, n, n_outliers,
    * outlier_ppm, lo, hi).
    *
    * `approx` is the 100 TB dial (the [[trimmedMean]] pattern).
    * false (the oracle-checked default): exact `percentile` — whose
    * per-group aggregation state is EVERY value of the group on one
    * reducer; fine while groups fit, the scale-killer when one event
    * type is 1/5 of a 100 TB table. true: p25/p75 from the KLL sketch
    * (functions.KllExprs) — one hash agg with map-side partial merge,
    * bounded state (~k*log n per group), quantiles are retained
    * stream values within the KLL rank band (~±1.65% of rank at
    * k=200). Fence arithmetic, rounding, broadcast-back classify are
    * identical in both paths; Pipeline6Spec bounds approx-vs-exact
    * fence drift by the band. */
  def iqrOutliers(df: DataFrame, groupCol: String,
      valCol: String, approx: Boolean = false,
      k: Int = 200): DataFrame = {
    val pcts = if (approx) {
      graft.functions.KllExprs.ensureRegistered(df.sparkSession)
      df.groupBy(col(groupCol))
        .agg(expr(s"graft_kll_agg(cast($valCol as double), $k)").as("sk"))
        .select(col(groupCol),
          expr("graft_kll_quantile(sk, 0.25D)").as("p25"),
          expr("graft_kll_quantile(sk, 0.75D)").as("p75"))
    } else {
      df.groupBy(col(groupCol))
        .agg(expr(s"percentile($valCol, 0.25D)").as("p25"),
          expr(s"percentile($valCol, 0.75D)").as("p75"))
    }
    val fences = pcts
      .select(col(groupCol),
        round(expr("p25 - 1.5 * (p75 - p25)"), 6).as("lo"),
        round(expr("p75 + 1.5 * (p75 - p25)"), 6).as("hi"))
    df.join(broadcast(fences), groupCol)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valCol) < col("lo") || col(valCol) > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        max("lo").as("lo"), max("hi").as("hi"))
      .select(col(groupCol), col("n"), col("n_outliers"),
        expr("(1000000 * n_outliers) div n").as("outlier_ppm"),
        col("lo"), col("hi"))
  }
}

/** Distributed ordered statistics over banded partitions — the shared
  * machinery behind every "global cumulative / global rank without a
  * global sort" operator (Gini ranks, ROC-AUC and KS CDF scans,
  * hash-rank balanced sampling, PPS prefix sums): rows bucket by
  * `orderCol div bandWidth` (monotone in the order key, so
  * within-band local work + cross-band offsets compose to the exact
  * global answer — PropertySpec pins the algebra), local window per
  * (partition, band), and band offsets ride a broadcast theta
  * self-join over the support-sized band-totals frame.
  *
  * REQUIREMENTS: `orderCol` must be a non-negative integral column
  * (shift first — integer `div` is not monotone across negatives),
  * `partCols` must be NON-NULL (the final offset equi-join is a
  * USING join, so a null partition key would silently drop its rows;
  * the offset theta-join itself is null-safe `<=>` so the two joins
  * can never disagree), and for [[bandedCumSum]] the (partCols,
  * orderCol) rows should be unique (pre-group) so "cumulative at a
  * key" is well-defined.
  *
  * 100 TB: the only row-scale work is one window whose partitions are
  * (partition, band) — balanced by construction for a uniform order
  * key and AQE-splittable otherwise; the offsets frame is
  * |partitions|·|bands| rows, broadcast.
  */
object Dist {

  /** Adds `cum_<c>` for each sum column: the exact cumulative sum of
    * `c` over ascending `orderCol` within `partCols` — inclusive of
    * the current row when `inclusive`, else strictly-preceding (the
    * Mann-Whitney "mass below" form). */
  def bandedCumSum(df: DataFrame, partCols: Seq[String], orderCol: String,
      bandWidth: Long, sumCols: Seq[String],
      inclusive: Boolean = true): DataFrame = {
    val d = df.withColumn("__band", expr(s"$orderCol div ${bandWidth}L"))
    val pb = partCols :+ "__band"
    val bt = d.groupBy(pb.map(col): _*)
      .agg(sum(sumCols.head).as(s"__bt_${sumCols.head}"),
        sumCols.tail.map(c => sum(c).as(s"__bt_$c")): _*)
    val btR = bt.select(
      (partCols.map(c => col(c).as(s"__r_$c")) :+
        col("__band").as("__band2")) ++
        sumCols.map(c => col(s"__bt_$c").as(s"__r_$c-sum")): _*)
    val cond = partCols.map(c => col(s"__r_$c") <=> col(c))
      .foldLeft(col("__band2") < col("__band"))(_ && _)
    val off = bt.join(broadcast(btR), cond, "left")
      .groupBy(pb.map(col): _*)
      .agg(coalesce(sum(s"__r_${sumCols.head}-sum"), lit(0L))
          .as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(s"__r_$c-sum"), lit(0L)).as(s"__off_$c")): _*)
      .select(pb.map(col) ++ sumCols.map(c => col(s"__off_$c")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pb.map(col): _*).orderBy(col(orderCol).asc)
      .rowsBetween(Long.MinValue, if (inclusive) 0 else -1)
    val local = sumCols.foldLeft(d) { (acc, c) =>
      acc.withColumn(s"__loc_$c",
        coalesce(sum(c).over(w), lit(0L)))
    }
    val joined = local.join(broadcast(off), pb)
    sumCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(s"cum_$c", col(s"__off_$c") + col(s"__loc_$c"))
    }.drop(("__band" +: sumCols.flatMap(c =>
      Seq(s"__off_$c", s"__loc_$c"))): _*)
  }

  /** Adds `rank`: the 1-based global row_number over
    * (orderCol asc, tieCol asc) within `partCols`, banded — identical
    * to the naive per-partition window rank (module specs pin the
    * equality) with no per-partition global sort: local row_number per
    * (partition, band) + the broadcast count of rows in preceding
    * bands (band-level offsets, so order-key ties never straddle an
    * offset boundary). */
  def bandedRank(df: DataFrame, partCols: Seq[String], orderCol: String,
      tieCol: String, bandWidth: Long): DataFrame = {
    val d = df.withColumn("__band", expr(s"$orderCol div ${bandWidth}L"))
    val pb = partCols :+ "__band"
    val bcnt = d.groupBy(pb.map(col): _*).agg(count(lit(1)).as("__bn"))
    val bcntR = bcnt.select(
      (partCols.map(c => col(c).as(s"__r_$c")) :+
        col("__band").as("__band2")) :+ col("__bn").as("__bn2"): _*)
    val cond = partCols.map(c => col(s"__r_$c") <=> col(c))
      .foldLeft(col("__band2") < col("__band"))(_ && _)
    val off = bcnt.join(broadcast(bcntR), cond, "left")
      .groupBy(pb.map(col): _*)
      .agg(coalesce(sum("__bn2"), lit(0L)).as("__boff"))
      .select((pb :+ "__boff").map(col): _*)
    val wl = org.apache.spark.sql.expressions.Window
      .partitionBy(pb.map(col): _*)
      .orderBy(col(orderCol).asc, col(tieCol).asc)
    d.withColumn("__lr", row_number().over(wl).cast("long"))
      .join(broadcast(off), pb)
      .withColumn("rank", col("__boff") + col("__lr"))
      .drop("__band", "__lr", "__boff")
  }
}
