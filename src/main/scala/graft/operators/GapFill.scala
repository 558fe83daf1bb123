package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed time-series densification (gap-fill / resample-to-grid).
  *
  * Given rows keyed by `keys` with an integral bucket column (epoch-hour,
  * epoch-day, any ladder rung), emits one row per key per bucket in that
  * key's observed [min, max] span, carrying the input's value columns where
  * a bucket exists and the caller's fill expressions where it doesn't —
  * the precondition for window functions over regular grids (moving
  * averages, lag-based deltas), which silently mis-compute over sparse
  * series because ROWS frames count rows, not time.
  *
  * Shape: one partial-agg'd groupBy(keys) for the spans, one
  * `explode(sequence(mn, mx))` to generate the dense grid executor-side
  * (never a driver loop or a collected calendar), and one left join back
  * on (keys, bucket) — two shuffles total, both on the natural keys. The
  * generated grid is data-dependent: a single key spanning years of
  * fine-grained buckets explodes into span-many rows, so [[gapFill]] fails
  * fast (codegen'd `raise_error`, no extra pass) when any key's span
  * exceeds `maxBucketsPerKey` instead of silently materializing a
  * runaway grid.
  *
  * Input must be unique per (keys, bucket) — pre-aggregate first, as any
  * resample does; duplicate buckets would survive into the dense output.
  * A NULL grouping key is a legitimate group (matched null-safely on the
  * way back); rows with a NULL bucket are excluded — the grid is defined
  * over observed non-null buckets only.
  */
object GapFill {

  /** @param df               pre-aggregated input: (keys..., bucket, values...)
    * @param keys             grouping key column names
    * @param bucket           integral bucket column (long-valued grid index)
    * @param fills            value column → fill expression for absent
    *                         buckets (e.g. `lit(0L)`); value columns not
    *                         listed stay null in gap rows
    * @param maxBucketsPerKey fail-fast ceiling on any single key's
    *                         (max − min + 1) span
    */
  def gapFill(
      df: DataFrame,
      keys: Seq[String],
      bucket: String,
      fills: Map[String, Column],
      maxBucketsPerKey: Long = 10_000_000L): DataFrame = {
    require(keys.nonEmpty, "gapFill needs at least one key column")
    val valueCols = df.columns.filterNot(c => keys.contains(c) || c == bucket)
    val unknown = fills.keySet.diff(valueCols.toSet)
    require(unknown.isEmpty, s"fill columns not in input: ${unknown.mkString(", ")}")

    val spans = df.groupBy(keys.map(col): _*)
      .agg(min(col(bucket)).as("__mn"), max(col(bucket)).as("__mx"))
      .withColumn("__span", col("__mx") - col("__mn") + 1)
      .withColumn("__mx",
        when(col("__span") > maxBucketsPerKey,
          raise_error(concat(lit(s"gapFill: key span exceeds $maxBucketsPerKey buckets ("),
            col("__span"), lit(s"); coarsen the bucket or raise maxBucketsPerKey"))))
          .otherwise(col("__mx")))
    val dense = spans.select(
      keys.map(col) :+ explode(sequence(col("__mn"), col("__mx"))).as(bucket): _*)
      .alias("__gf_d")
    // Join back null-safely (a NULL grouping key is a legitimate group —
    // plain equality would miss it and silently fill over observed rows),
    // and detect gaps by join-miss marker, NOT value nullness: an observed
    // row whose value is genuinely NULL keeps its NULL.
    require(!df.columns.contains(ObservedCol),
      s"input already has a column named $ObservedCol; rename it before gapFill")
    val observed = df.withColumn(ObservedCol, lit(true)).alias("__gf_o")
    val joinCond = (keys :+ bucket)
      .map(c => col(s"__gf_d.$c") <=> col(s"__gf_o.$c"))
      .reduce(_ && _)
    val outKeys = keys.map(c => col(s"__gf_d.$c").as(c)) :+ col(s"__gf_d.$bucket").as(bucket)
    val outVals = valueCols.map { c =>
      fills.get(c) match {
        case Some(f) => when(col(ObservedCol).isNull, f).otherwise(col(s"__gf_o.$c")).as(c)
        case None => col(s"__gf_o.$c").as(c)
      }
    }
    dense.join(observed, joinCond, "left").select(outKeys ++ outVals: _*)
  }

  private val ObservedCol = "__graft_observed"
}
