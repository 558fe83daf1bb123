package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The t57 sketch-accuracy certification (HLL++ / approx-percentile vs
  * their exact arms), factored out for library use with an explicit
  * memory-profile knob.
  *
  * The three arms are DELIBERATELY separate aggregations cross-joined at
  * one row each (see the t57 registry comment for why a fused agg forces
  * Catalyst's Expand plan and ~300k sketch buffers). The default plan
  * leaves all three arms in ONE job, so a scheduler is free to run their
  * corpus-wide stages concurrently — which is also the failure mode on a
  * memory-tight cluster: at the 60M-row rehearsal the three arms
  * co-resident on a shared local[32] heap spilled gigabytes while EACH
  * ARM ISOLATED spilled zero (the stage probe in SCALE.md).
  * `sequentialArms = true` runs each single-row arm to completion alone
  * AND frees the blocks it pinned before the next arm starts, so the
  * peak memory profile equals the isolated probes — same output
  * row-for-row (proven in SketchCertifySpec), different schedule.
  */
object SketchCertify {

  /** (exact_n, hll_ok, pct_ok) over a lineitem-shaped frame: exact
    * distinct-key count and exact p50 (distributed selection via
    * [[GroupedQuantiles.exact]] on one constant group) certify
    * approx_count_distinct at 1% rsd within 5% and approx_percentile at
    * 10k accuracy within 1%. */
  def sketchAccuracy(
      li: DataFrame,
      parallelism: Int,
      sequentialArms: Boolean = false): DataFrame = {
    // Arms are THUNKS, not frames: GroupedQuantiles.exact materializes its
    // internal checkpoints EAGERLY at build (the sorted corpus — rows ×
    // ~86 B, 5.2 GB at the 60M-row rehearsal, pinned until the job-level
    // sweep), so building all three arms up front leaves those storage
    // blocks resident while the other arms aggregate. That residency IS
    // the li100 spill: the stage probe showed exact_n's 60M-row distinct
    // spilling ~the corpus size whenever it shares the unified pool with
    // the pinned sort, and zero with a clean heap — scheduling the arms
    // sequentially without freeing the blocks changed nothing.
    val exactN = () => li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("exact_n"))
    val exactP = () => GroupedQuantiles
      .exact(
        li.select(lit("all").as("g"), col("l_extendedprice")),
        "g", "l_extendedprice", Seq(0.5),
        parallelism)
      .select(col("p50").as("p50_exact"))
    val sketches = () => li.agg(
      approx_count_distinct(col("l_orderkey"), 0.01).as("est_n"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est"))
    // Sequential mode (run-and-free, see [[ArmScheduler]] — factored out
    // in round 14 so t92/t108/t150 share the discipline): each single-row
    // arm runs to completion alone and frees the blocks it pinned; output
    // is row-identical to the concurrent plan (SketchCertifySpec).
    val Seq(n, p, sk) = ArmScheduler.runAndFree(
      li.sparkSession, Seq(exactN, exactP, sketches), sequentialArms)
    n.crossJoin(p).crossJoin(sk)
      .select(
        col("exact_n"),
        (abs(col("est_n") - col("exact_n")) / col("exact_n") <= 0.05).as("hll_ok"),
        (abs(col("p50_est") - col("p50_exact")) / col("p50_exact") <= 0.01).as("pct_ok"))
  }
}
