package graft

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Scale invariants asserted over the physical plan of EVERY driver
  * query, so a regression in the 100 TB story (an accidental cartesian
  * product, a global single-partition window, an inequality join
  * planned as a nested loop) fails CI at sf0.001 instead of surfacing
  * on a cluster.
  */
class PlanShapeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // crossJoins against BROADCAST ≤16-row sides (query vectors, seeded
  // centroids, scalar aggregates) plan as BroadcastNestedLoopJoin by
  // design — bounded by the tiny broadcast side, not a scale hazard
  private val intendedNestedLoop = Set(
    "q24_knn_brute", "q25_ann_lsh", "q33_ivf_ann",
    "q36_pack_stats", "q39_doc_frequency",
    // q51's corpus-wide source count is a broadcast 1-row aggregate
    // crossJoined into the scoring plan (q39's pattern)
    "q51_tfidf",
    // signature self-join on s1 < s2: one row PER SOURCE (dozens, not
    // documents) on each side — bounded by group cardinality; a
    // many-thousand-source corpus would switch to banded signatures
    "q41_source_minhash",
    // two single-row scalar aggregates (edge count × triangle count)
    // crossJoined into the one-row result
    "q72_triangles",
    // vocabulary size is a broadcast 1-row aggregate crossJoined into
    // the scoring join (q39/q51's pattern)
    "q76_lm_score",
    // five single-row audit aggregates crossJoined into the one-row
    // report
    "q77_fk_audit",
    // grand total is a broadcast 1-row aggregate crossJoined into the
    // daily-share frame
    "q86_ratio_to_total",
    // avgdl/N is a broadcast 1-row scalar aggregate crossJoined into
    // the per-(doc, term) scoring frame
    "q91_bm25",
    // the date×hour×type spine: crossJoins of a generated day sequence
    // (one row exploded), 24 hour rows, and the ~5 distinct event
    // types — bounded by slots, never by event volume
    "q92_gap_fill",
    // corpus token total is a broadcast 1-row aggregate crossJoined
    // into the pair-scoring frame (q39/q51/q86/q91's pattern); the
    // positive-PMI inequality rides on that 1-row join
    "q100_collocations",
    // feasible-sample-size scalar (1-row min aggregate) crossJoined
    // into the languages-sized rate table
    "q103_mixture_sample",
    // SemDeDup cell assignment: the 16-row refined-centroid frame is
    // broadcast-crossJoined into the max_by assignment (q33's shape)
    "q118_semdedup",
    // Rocchio assignment: the 10-row label-centroid frame is
    // broadcast-crossJoined into the max_by assignment (q33's shape)
    "q123_rocchio",
    // contrastive pair builder: the 10-row query frame is broadcast-
    // crossJoined into both rankings (q24's shape)
    "q126_train_pairs",
    // corpus-count scalar: a broadcast 1-row aggregate crossJoined
    // into the shard arithmetic (q86/q91's pattern)
    "q131_shard_balance",
    // power iteration's renorm: the max-|y| scalar (1-row aggregate)
    // is broadcast-crossJoined into the dim-sized x frame each round
    "q139_power_iter",
    // corpus-count scalar crossJoined into the decile arithmetic
    // (q131's pattern), twice: token stream + first-occurrence frame
    "q143_vocab_growth",
    // session-count scalar (1-row aggregate) crossJoined into the
    // item-pair scoring frame (q86/q91's pattern)
    "q146_assoc_pairs",
    // train-bigram-mass scalar (1-row aggregate) crossJoined into the
    // backoff scoring stream (q76's pattern)
    "q149_stupid_backoff",
    // bigram-type-count scalar (1-row aggregate) crossJoined into the
    // Kneser-Ney scoring stream (q149's pattern)
    "q179_kneser_ney",
    // anchor-day scalar (1-row max aggregate) crossJoined into the
    // user-sized RFM frame (q86/q91's pattern)
    "q153_rfm",
    // vocabulary-count scalar (1-row aggregate) crossJoined into the
    // degree histogram (q86/q91's pattern)
    "q154_degree_dist",
    // order-count scalar (1-row aggregate) crossJoined into the 9-row
    // digit frame (q86/q91's pattern)
    "q156_benford",
    // corpus-count scalar crossJoined into the ranked frame AND the
    // support spine (q86/q91's pattern, twice)
    "q157_quantile_norm",
    // support-spine × source-census grid: the census side is a
    // broadcast source-count-sized frame; the corpus-total scalar
    // rides the same pattern
    "q151_ks_drift",
    // total-weight scalar (1-row aggregate) crossJoined into the
    // crossing test (q131's pattern)
    "q152_pps_sample",
    // RRF's semantic arm is q24's brute-force shape: the ≤10-row query
    // set broadcast-crossJoined into the corpus scan
    "q165_rrf_fusion",
    // IVF-PQ coarse pass: the 8-row centroid frame is broadcast-
    // crossJoined into the assignment and probe scans (q33's shape)
    "q166_ivfpq",
    // Σweights/total scalar (1-row aggregate) crossJoined into the
    // source-sized allocation table (q103's pattern)
    "q168_temperature_mix",
    // rank-eval's ground truth + semantic arm are q24's brute-force
    // shape (broadcast ≤10-row query set)
    "q171_rank_eval",
    // target/raw-mass scalar (1-row aggregate) crossJoined into the
    // bigram scoring stream (q76/q149's pattern)
    "q188_dsir_weights")

  // ranking over the ≥5%-document-frequency vocabulary: the filter
  // shrinks the set to the shared vocabulary before this single
  // partition; documented funnel
  private val intendedGlobalWindow = Set("q39_doc_frequency",
    // the per-partition offset prefix sum: one row PER PARTITION
    // (spark_partition_id cardinality), not per data row — the tiny
    // spine that replaces the banned global row_number over the corpus
    "q124_stable_ids",
    // both rolling windows run on DAY-level aggregates (7 rows: the
    // per-day register frame and the first-day novelty histogram),
    // never on corpus rows
    "q130_hll_rolling",
    // q131 composes q124, inheriting its partition-count-sized offset
    // prefix sum (same justification)
    "q131_shard_balance",
    // skyline sweep's carry spine: one row PER PARTITION of the range
    // exchange (q124's two-phase prefix pattern, here a prefix MAX)
    "q138_skyline",
    // composes q124 (pid spine) and adds its own 10-row decile-spine
    // cumulative windows — both bounded by spine size, never data rows
    "q143_vocab_growth",
    // sorted-neighborhood rank via the q124 two-phase pattern: the
    // offset prefix sum is one row per range partition
    "q144_sorted_neighbors",
    // corpus CDF over the SUPPORT spine (distinct metric values, not
    // documents — bucket first for continuous metrics at scale)
    "q151_ks_drift",
    // global cumulative weight via the q124 two-phase pattern: the
    // weight prefix sum spine is one row per range partition
    "q152_pps_sample",
    // RFM ntile codes over the USER-sized aggregate — a documented
    // funnel like q39: at 10M+ users the codes switch to broadcast
    // quartile thresholds (exact ntile needs the total order)
    "q153_rfm",
    // CCDF over the degree-SUPPORT spine (distinct degree values,
    // never tokens — q151's support-spine justification)
    "q154_degree_dist",
    // pooled CDF over the length-SUPPORT spine (q151's justification)
    "q157_quantile_norm",
    // epoch-shuffle global rank via the q124 two-phase pattern: the
    // offset prefix sum is one row per range partition
    "q162_epoch_shuffle",
    // concat-and-slice global token offset via the q124 two-phase
    // pattern: the offset prefix sum is one row per range partition
    "q170_example_pack")

  // plan each query ONCE and share across the three assertions
  private lazy val plans = SparkEntry.queries.map { case (name, fn) =>
    name -> fn(spark, sfDir).queryExecution.sparkPlan
  }

  test("every query plans without cartesian products") {
    plans.foreach { case (name, plan) =>
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      assert(cartesian.isEmpty, s"$name plans a CartesianProduct")
    }
  }

  test("nested-loop joins appear only where a tiny broadcast side is intended") {
    plans.foreach { case (name, plan) =>
      val bnlj = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      if (!intendedNestedLoop.contains(name))
        assert(bnlj.isEmpty,
          s"$name plans a BroadcastNestedLoopJoin — inequality join gone wrong?")
    }
  }

  test("no unpartitioned (single-task) windows outside the allowed set") {
    plans.foreach { case (name, plan) =>
      val global = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (!intendedGlobalWindow.contains(name))
        assert(global.isEmpty,
          s"$name has a global window — all rows funnel into one task")
    }
  }

  // queries whose plans must never read the (dominant-width) text column
  // — a pruning regression here multiplies scan bytes at 100 TB
  private val textFreeQueries = Seq(
    "q29_topk_per_source", "q37_length_percentiles",
    "q46_approx_percentiles", "q55_window_rank", "q63_string_agg")

  test("column pruning reaches the parquet scans (text never read when unused)") {
    textFreeQueries.foreach { name =>
      val scanned = plans(name).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.requiredSchema.fieldNames.toSeq
      }.flatten
      assert(scanned.nonEmpty, s"$name: no FileSourceScanExec found")
      assert(!scanned.contains("text"),
        s"$name reads the text column it never uses: $scanned")
    }
  }

  test("q54's order-side threshold is pushed into the scan") {
    val pushed = plans("q54_semi_join").collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.requiredSchema.fieldNames.contains("o_totalprice") =>
        f.metadata.getOrElse("PushedFilters", "")
    }.mkString
    assert(pushed.contains("o_totalprice"),
      s"o_totalprice filter not pushed: $pushed")
  }
}
