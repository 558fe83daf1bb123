package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed point-in-time ("as-of") join.
  *
  * For each probe row, attaches the payload of the build row with the
  * greatest build-time ≤ probe-time (or strictly <) within the same key.
  * Probe rows with no admissible build row keep a null payload (left
  * semantics) — filter on a payload column for inner semantics.
  *
  * Formulation: tag both sides, union, then one running
  * `last(payload, ignoreNulls)` over a (key)-partitioned (time, side)-ordered
  * window. Exactly one shuffle on the key and one per-partition sort — never
  * a per-row probe, a broadcast of the build side, or an O(n·m) interval
  * product — so the plan survives arbitrarily large inputs as long as no
  * single key's history exceeds a partition (the same contract as any
  * windowed computation).
  *
  * The build side must be unique per (key, time): at a duplicated build
  * timestamp the winner would be partition-order dependent. Deduplicate with
  * a deterministic tie-break (e.g. max of a unique column) first, as
  * t55_asof_join does.
  */
object AsofJoin {

  /** @param probe      left side; all its columns survive in the output
    * @param build      right side; its non-key, non-time columns become the
    *                   attached payload
    * @param keys       equi-key column names present on both sides
    * @param probeTime  ordering column on `probe`
    * @param buildTime  ordering column on `build` (same type as probeTime)
    * @param strict     false → match at buildTime ≤ probeTime (ASOF ≥ in
    *                   DuckDB terms); true → strictly earlier only
    */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      strict: Boolean = false): DataFrame = {
    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTime)
    require(payloadCols.nonEmpty, "build side carries no payload columns")
    val keyCols: Seq[Column] = keys.map(col)

    val b = build.select(
      keyCols ++ Seq(
        col(buildTime).as("__t"),
        struct(payloadCols.map(col): _*).as("__pay"),
        lit(0).as("__side")): _*)
    val payType = b.schema("__pay").dataType

    val probeStruct = struct(probe.columns.map(col): _*)
    val p = probe.select(
      keyCols ++ Seq(
        col(probeTime).as("__t"),
        lit(null).cast(payType).as("__pay"),
        lit(1).as("__side"),
        probeStruct.as("__probe")): _*)
    val probeType = p.schema("__probe").dataType

    val bb = b.withColumn("__probe", lit(null).cast(probeType))

    // inclusive: build (side 0) sorts before probe (side 1) at equal time, so
    // the running last() already contains it; strict: probe first, so it
    // doesn't.
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(col("__t").asc +: sideOrder +: Nil: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    bb.unionByName(p)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__probe.*") +: payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
