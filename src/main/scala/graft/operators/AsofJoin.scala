package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed point-in-time ("as-of") join.
  *
  * For each probe row, attaches the payload of the nearest admissible build
  * row within the same key: backward mode takes the greatest build-time ≤
  * probe-time (or strictly <), forward mode the smallest build-time ≥
  * probe-time (or strictly >), optionally discarding matches farther than a
  * `tolerance` (pandas merge_asof's parameter surface). Probe rows with no
  * admissible build row keep a null payload (left semantics) — filter on a
  * payload column for inner semantics.
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
    * @param forward    false (default) → most recent build row at-or-before
    *                   the probe time; true → earliest build row at-or-after
    *                   (strict flips both bounds to strictly-before/-after)
    * @param tolerance  optional max |probeTime − buildTime| as a Column
    *                   expression in the time column's native arithmetic
    *                   (e.g. `expr("INTERVAL 1 HOUR")` for timestamps,
    *                   `lit(50L)` for longs); a match farther away than this
    *                   is discarded (payload null, left semantics preserved)
    */
  def asof(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      probeTime: String,
      buildTime: String,
      strict: Boolean = false,
      forward: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    val q = (c: String) => col(s"`${c.replace("`", "``")}`")
    val payloadCols = build.columns.filterNot(c => keys.contains(c) || c == buildTime)
    require(payloadCols.nonEmpty, "build side carries no payload columns")
    val collisions = payloadCols.toSet.intersect(probe.columns.toSet)
    require(collisions.isEmpty,
      s"build payload columns collide with probe columns: ${collisions.mkString(", ")} — " +
        "rename one side before joining (the output would carry ambiguous duplicates)")
    val keyCols: Seq[Column] = keys.map(q)

    // the matched build time rides inside the payload struct so tolerance
    // can compare it against the probe time after the window pass.
    // NULL build times are dropped up front: a row with no time can never be
    // an as-of match, but NULLS FIRST/LAST ordering would otherwise let its
    // payload seed (or terminate) the running last() and fabricate matches.
    // NULL build KEYS are dropped for the same reason: equi-join/ASOF
    // semantics never match NULL keys, but the window's partitionBy groups
    // the NULL-key build and probe rows into ONE partition and would
    // fabricate matches between them. (A null-keyed PROBE row stays — its
    // partition then holds no build rows, so it gets the null payload an
    // equi-join would give it.)
    val b = keys.foldLeft(build.where(q(buildTime).isNotNull))((d, k) => d.where(q(k).isNotNull))
      .select(
        keyCols ++ Seq(
          q(buildTime).as("__t"),
          struct(q(buildTime).as("__bt") +: payloadCols.map(q): _*).as("__pay"),
          lit(0).as("__side")): _*)
    val payType = b.schema("__pay").dataType

    val probeStruct = struct(probe.columns.map(q): _*)
    val p = probe.select(
      keyCols ++ Seq(
        q(probeTime).as("__t"),
        lit(null).cast(payType).as("__pay"),
        lit(1).as("__side"),
        probeStruct.as("__probe")): _*)
    val probeType = p.schema("__probe").dataType

    val bb = b.withColumn("__probe", lit(null).cast(probeType))

    // backward: ascending time, running last() of seen payloads. forward:
    // DESCENDING time — the running last() then yields the earliest
    // at-or-after row, by symmetry. At equal times the side order decides
    // whether the same-timestamp build row is admissible: inclusive sorts
    // build before probe in window order (so last() already contains it),
    // strict sorts probe first.
    val timeOrder = if (forward) col("__t").desc else col("__t").asc
    val sideOrder = if (strict) col("__side").desc else col("__side").asc
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(timeOrder, sideOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = bb.unionByName(p)
      .withColumn("__m", last(col("__pay"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      // a NULL probe time matches nothing (as-of semantics); without this
      // gate its window position (NULLS FIRST/LAST) would decide its match
      .withColumn("__m", when(col("__t").isNotNull, col("__m")))
    val gated = tolerance match {
      case Some(tol) =>
        val dist = if (forward) col("__m.__bt") - col("__t") else col("__t") - col("__m.__bt")
        matched.withColumn("__m", when(dist <= tol, col("__m")))
      case None => matched
    }
    // getField, not col("__m.$c"): a payload column genuinely named "a.b"
    // must resolve as one struct field, not a nested path
    gated.select(col("__probe.*") +: payloadCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
