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
  * Shape: one partial-agg'd groupBy(keys) for the spans, a chunked
  * two-level `explode(sequence(...))` to generate the dense grid
  * executor-side (never a driver loop or a collected calendar, and never
  * more than [[GridChunk]] buckets in any one generated array), and one
  * left join back on (keys, bucket) — two shuffles total, both on the
  * natural keys. The
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

    // every reference to a USER column goes through backtick quoting: a
    // bare col("a.b") would parse the '.' as a qualifier separator and
    // mis-resolve (or miss) a column genuinely named "a.b"
    def q(c: String): Column = col(s"`${c.replace("`", "``")}`")

    // span arithmetic runs in LongType regardless of the bucket's width: an
    // IntegerType bucket with a ±2G span would wrap the int subtraction,
    // slip past the ceiling check, and silently truncate the grid. A LONG
    // bucket can still overflow the subtraction itself (mx − mn past 2^63)
    // — that surfaces as span ≤ 0, which fails the same loud way.
    val spans = df.groupBy(keys.map(q): _*)
      .agg(min(q(bucket)).cast("long").as("__mn"), max(q(bucket)).cast("long").as("__mx"))
      .withColumn("__span", col("__mx") - col("__mn") + 1)
      .withColumn("__mx",
        when(col("__span") > maxBucketsPerKey || col("__span") <= 0,
          raise_error(concat(lit(s"gapFill: key span exceeds $maxBucketsPerKey buckets ("),
            col("__span"), lit(s"); coarsen the bucket or raise maxBucketsPerKey"))))
          .otherwise(col("__mx")))
    // Grid generation is CHUNKED: explode chunk indexes first, then a
    // ≤ GridChunk-wide sequence per chunk. A single wide span therefore
    // never materializes one span-sized array in one row (10M longs is an
    // ~80 MB row the allowed ceiling would otherwise permit) — peak per-row
    // allocation is GridChunk longs, and chunk rows parallelize across the
    // partition like any other rows. `div`, not `/`: Column `/` widens to
    // double, inexact past 2^53 for caller-raised ceilings.
    val chunked = spans.select(
      keys.map(q) ++ Seq(col("__mn"), col("__mx")) :+
        explode(sequence(lit(0L), expr(s"(__span - 1) div $GridChunk"))).as("__chunk"): _*)
    val dense = chunked.select(
      keys.map(q) :+
        explode(sequence(
          col("__mn") + col("__chunk") * GridChunk,
          least(col("__mx"), col("__mn") + (col("__chunk") + 1) * GridChunk - 1)))
          .as(bucket): _*)
      // the long span arithmetic must not leak into the output schema: the
      // generated bucket narrows back to the input's exact type (values are
      // within the observed [min, max], so the cast is lossless)
      .withColumn(bucket, q(bucket).cast(df.schema(bucket).dataType))
    // Join back null-safely (a NULL grouping key is a legitimate group —
    // plain equality would miss it and silently fill over observed rows),
    // and detect gaps by join-miss marker, NOT value nullness: an observed
    // row whose value is genuinely NULL keeps its NULL. Qualified
    // references are backtick-escaped: a bare "__gf_d.$c" would treat a
    // '.' inside a user column name as a qualifier separator and
    // mis-resolve. (Frame-based dense(c)/observed(c) refs are not an
    // option here: both frames share df's lineage and trip
    // DetectAmbiguousSelfJoin on the value columns.)
    require(!df.columns.contains(ObservedCol),
      s"input already has a column named $ObservedCol; rename it before gapFill")
    def d(c: String) = col(s"__gf_d.`${c.replace("`", "``")}`")
    def o(c: String) = col(s"__gf_o.`${c.replace("`", "``")}`")
    val denseA = dense.alias("__gf_d")
    val observed = df.withColumn(ObservedCol, lit(true)).alias("__gf_o")
    val joinCond = (keys :+ bucket)
      .map(c => d(c) <=> o(c))
      .reduce(_ && _)
    val outKeys = keys.map(c => d(c).as(c)) :+ d(bucket).as(bucket)
    val outVals = valueCols.map { c =>
      fills.get(c) match {
        case Some(f) => when(o(ObservedCol).isNull, f).otherwise(o(c)).as(c)
        case None => o(c).as(c)
      }
    }
    denseA.join(observed, joinCond, "left").select(outKeys ++ outVals: _*)
  }

  private val ObservedCol = "__graft_observed"

  /** Per-row ceiling on generated-grid array width (64 Ki buckets ≈ 512 KB
    * of longs): the chunked two-level explode in [[gapFill]] bounds every
    * materialized sequence to this many elements regardless of span. */
  private val GridChunk = 65536L
}
