package graft

import org.apache.spark.sql.SparkSession

/** Whole-catalog plan audit: plans every registered query and flags the
  * patterns that do not survive a 100x scale-up — cartesian products,
  * non-codegen aggregates in the hot path, unkeyed single-partition
  * windows over big inputs, scans with no column pruning. A complement
  * to `PlanAuditSpec` (which pins a curated set of shapes): this sweeps
  * EVERYTHING registered, so a newly added query with a regressed plan
  * is visible even before it gets a dedicated pin.
  *
  * `sbt "runMain graft.Audit [sfDir]"` — prints one line per query:
  * codegen-node count plus any flags; a summary block lists flagged
  * queries. Exit code stays 0 (diagnostic, not a gate): some flags are
  * deliberate (the O(n^2) correctness baselines use guarded
  * cross-joins; tiny-frame global windows are documented inline).
  */
object Audit {
  // deliberate exceptions, each documented at its definition site:
  //  - q34/q37/q39: declared all-pairs correctness baselines (ScaleGuards)
  //  - q14/q65/q72/q40/q45: broadcast-grid / centroid fan-out crossJoins
  //    (the broadcast IS the scale plan)
  //  - q87: broadcast time-spine fan-out (gap fill); q110: broadcast
  //    O(#sources) quota/total frames; q116: cross of three 1-row
  //    count aggregates; q133/q136/q137: 1-row scalar attach (totals /
  //    FK-violation count crossed onto the result — F5-class bounded)
  //  - q144/q145: broadcast bounded-query-sample fan-out (ADC LUTs /
  //    ground-truth probes — the audit contract is a sampled query set);
  //    q146/q152: 1-row corpus-total attach
  private val expectedCross = Set(
    "q34_ngram_jaccard", "q37_cosine_topk", "q39_neardup_pairs",
    "q14_field_control", "q65_semantic_dedup", "q72_kmeans_step",
    "q40_ivf_ann", "q45_label_centroids", "q50_dedup_pipeline",
    "q70_unigram_logprob", "q110_budget_mixture", "q87_gap_fill",
    "q116_triangle_census", "q133_dq_audit", "q136_bigram_pmi",
    "q137_group_kfold", "q140_curriculum_cut",
    "q144_pq_adc_topk", "q145_ann_recall", "q146_kl_drift",
    "q152_bm25_topk",
    // q156: probe×centroid scoring is a deliberate broadcast product
    // (centroid table is constant-size); q159: the 120×53 grid fan-out
    // broadcasts the GRID, tracking side never shuffles (plan-pinned in
    // PlanAuditSpec — the Mahalanobis filter cuts the product below
    // the aggregate)
    "q156_ivf_multiprobe", "q159_field_control_pruned")

  // q77: PivotFirst is a TypedImperativeAggregate whose rotation buffer
  // Catalyst only plans as Object/Sort aggregate — inherent to pivot,
  // bounded by the pivoted-domain size, not a regression
  private val expectedSortAgg = Set("q77_pivot_measures")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val builder = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    // AQE off for the audit ONLY: the adaptive wrapper defers physical
    // finalization to execution time, which hides WholeStageCodegen spans
    // (and join selections) from an unexecuted plan's toString. The
    // static plan is what codegen/aggregate selection is decided on.
    builder.config("spark.sql.adaptive.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var flagged = List.empty[(String, List[String])]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.executedPlan.toString
        // codegen stages print as "*(id) Op" prefixes; distinct ids =
        // WholeStageCodegen span count
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(p).map(_.group(1)).toSet.size
        var flags = List.empty[String]
        if (p.contains("CartesianProduct")) flags ::= "cartesian"
        if (p.contains("BroadcastNestedLoopJoin") && !expectedCross(name))
          flags ::= "bnl-join"
        // SortAggregate appears when an agg buffer can't hash (string /
        // complex buffer types) — a per-partition sort at scale
        if (p.contains("SortAggregate") && !expectedSortAgg(name)) flags ::= "sort-agg"
        // a Window with an empty partition spec sorts EVERYTHING into
        // one task; only acceptable on provably tiny frames
        if (p.contains("windowspecdefinition(") &&
            "windowspecdefinition\\([a-z_]".r.findFirstIn(p).isEmpty)
          flags ::= "global-window"
        if (flags.nonEmpty) flagged ::= (name, flags)
        println(f"$name%-28s codegen=$codegen%-3d ${flags.mkString(" ")}")
      } catch {
        case e: Throwable =>
          flagged ::= (name, List("ERROR"))
          println(f"$name%-28s ERROR ${e.getMessage.take(80)}")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    println()
    if (flagged.isEmpty) println("[audit] no flags")
    else {
      println(s"[audit] ${flagged.size} flagged (deliberate shapes listed in Audit.expectedCross):")
      flagged.reverse.foreach { case (n, f) => println(s"  $n: ${f.mkString(", ")}") }
    }
    spark.stop()
  }
}
