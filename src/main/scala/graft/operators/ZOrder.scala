package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional data skipping —
  * the write-side complement to the read-side pruning t75/t80 assert.
  *
  * A table sorted on one column prunes scans on THAT column only: every
  * file still spans the full range of every other column, so min/max
  * stats never exclude a file for a second predicate. Interleaving the
  * bits of two (or more) normalized keys gives a single sort key whose
  * contiguous ranges are axis-aligned squares in key space — each written
  * file covers a bounded sub-rectangle of BOTH dimensions, and footer
  * min/max stats prune files for predicates on either dimension or both
  * (the Delta/Iceberg OPTIMIZE ZORDER layout, done with plain Spark
  * primitives: an expression, repartitionByRange, sortWithinPartitions).
  *
  * At 100 TB this is a one-shuffle layout pass at write time; reads get
  * row-group/file skipping forever after. The curve quality degrades
  * gracefully: keys are clamped into the bits-wide grid, ties keep rows
  * together, and skew in one dimension only widens that dimension's
  * stripes. ZOrderSpec quantifies the effect on uniform data: a
  * quarter-per-axis 2-D box touches ~1/16 of z-ordered files, while a
  * linear sort still prunes its OWN axis (~1/4 of files survive) but
  * gets nothing from the second predicate — the gap widens with more
  * files and more dimensions. The spec also pins the bit-interleave
  * against a reference implementation.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integer columns
    * (a's bit i lands at 2i+1, b's at 2i — a is the "major" dimension).
    * Pure built-in bit ops (shiftright/and/shiftleft/or), fully codegen'd;
    * inputs outside [0, 2^bits) are clamped so a stray outlier cannot
    * scatter the curve. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val max = (1L << bits) - 1L
    def clamp(c: Column): Column =
      least(greatest(c.cast("long"), lit(0L)), lit(max))
    val (ca, cb) = (clamp(a), clamp(b))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ca, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(cb, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Affine-map an integer column (by name) into the [0, 2^bits) grid given
    * its value range — the normalization step before interleaving (ranges
    * come from a stats pass or catalog metadata; at scale you compute them
    * once per layout job). Integer `div` keeps the mapping exact where
    * double division could mis-bucket near cell edges. Degenerate ranges
    * (min == max) map to 0. */
  def gridKey(colName: String, minV: Long, maxV: Long, bits: Int): Column = {
    require(maxV >= minV, s"empty range [$minV, $maxV]")
    val cells = (1L << bits) - 1L
    val escaped = s"`${colName.replace("`", "``")}`"
    // the multiply runs in DECIMAL(38,0): (c − min) can span the full Long
    // range and cells is up to 2^31, so a Long product wraps at wide value
    // ranges (a year of epoch-micros × 2^31 ≈ 6.6e22) and the Morton curve
    // would silently degenerate; 38 decimal digits hold the exact product
    // (< 2e28) and `div` stays an exact integral divide.
    if (maxV == minV) lit(0L)
    else expr(s"CAST(CAST(($escaped - ($minV)) AS DECIMAL(38,0)) * $cells" +
      s" div ${maxV - minV} AS BIGINT)")
  }

  /** Write `df` z-ordered on two integer-like columns: one range shuffle on
    * the interleaved key, sorted within partitions, `numFiles` output
    * files. Every file then covers a contiguous Morton range = a bounded
    * rectangle in (dimA, dimB) space, which is what makes footer stats
    * selective on both columns. */
  def writeZOrdered(
      df: DataFrame, dimA: Column, dimB: Column, bits: Int,
      numFiles: Int, path: String): Unit = {
    // the working column must not shadow user data: withColumn would
    // overwrite a real __zv and drop() would then delete it from the
    // written dataset with no error (same guard as SaltedJoin/GapFill)
    require(!df.columns.contains("__zv"),
      "writeZOrdered uses a working column named __zv; rename the input's __zv column")
    val keyed = df.withColumn("__zv", zValue(dimA, dimB, bits))
    keyed
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
  }
}
