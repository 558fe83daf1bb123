package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Bit-level correctness of the Morton interleave, and the layout claim
  * itself: a 2-D box predicate must touch far fewer z-ordered files than
  * linearly-sorted ones, with file min/max stats standing in for the
  * parquet footer stats the scan consults (one row group per small file,
  * so file-level min/max IS the footer stat).
  */
class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  private def mortonRef(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    (0 until bits).foreach { i =>
      z |= ((a >> i) & 1L) << (2 * i + 1)
      z |= ((b >> i) & 1L) << (2 * i)
    }
    z
  }

  test("zValue matches the reference interleave and clamps out-of-grid input") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 0L),
      (0L, 255L), (255L, 255L), (170L, 85L), (128L, 64L))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cases.foreach { case (a, b) =>
      assert(out((a, b)) == mortonRef(a, b, 8), s"interleave($a, $b)")
    }
    // clamping: negatives floor to 0, overflow saturates to the grid edge
    val clamped = Seq((-5L, 300L)).toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b"), 8)).head().getLong(0)
    assert(clamped == mortonRef(0L, 255L, 8))
  }

  test("gridKey maps range ends to grid ends, exactly") {
    val out = Seq(100L, 150L, 200L).toDF("v")
      .select(ZOrder.gridKey("v", 100L, 200L, 8).as("g")).collect().map(_.getLong(0))
    assert(out(0) == 0L && out(2) == 255L)
    assert(out(1) == 127L, "midpoint lands mid-grid (integer div)")
  }

  test("gridKey survives year-of-epoch-micros ranges without Long overflow") {
    // range ≈ 3.2e13 × cells 2^31−1 ≈ 6.6e22 — wraps a Long multiply; the
    // DECIMAL(38,0) product must keep the affine map exact at both ends
    val lo = 1704067200000000L                 // 2024-01-01 in epoch-micros
    val hi = lo + 365L * 24 * 3600 * 1000000L  // one year later
    val cells = (1L << 31) - 1L
    val out = Seq(lo, (lo + hi) / 2, hi).toDF("v")
      .select(ZOrder.gridKey("v", lo, hi, 31).as("g")).collect().map(_.getLong(0))
    assert(out(0) == 0L && out(2) == cells, s"range ends must hit grid ends: ${out.toSeq}")
    assert(out(1) >= cells / 2 - 1 && out(1) <= cells / 2 + 1,
      s"midpoint must land mid-grid, not on a wrapped value: ${out.toSeq}")
  }

  test("writeZOrdered rejects an input that already has a __zv column") {
    val dir = java.nio.file.Files.createTempDirectory("zorder-guard").toString
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeZOrdered(Seq((1L, 2L, 3L)).toDF("a", "b", "__zv"),
        col("a"), col("b"), bits = 4, numFiles = 1, path = s"$dir/out")
    }
    assert(e.getMessage.contains("__zv"))
  }

  test("a 2-D box predicate touches ~¼ of z-ordered files but ~all linear ones") {
    // uniform 64×64 lattice over (x, y) ∈ [0, 256)², like
    // (user, time-bucket) after gridKey normalization
    val pts = spark.range(4096).select(
      (col("id") % 64 * 4).as("x"),
      (col("id") / 64 * 4).as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("linear").toString
    ZOrder.writeZOrdered(pts, col("x"), col("y"), 8, 16, zDir)
    pts.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)

    // per-file min/max stats (footer-stat stand-in), then count files whose
    // stats intersect the box x,y ∈ [0, 64) — the pruning decision a
    // stats-aware scan makes
    def touched(dir: String): (Long, Long) = {
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
      val total = stats.count()
      val hit = stats.filter(col("x0") < 64 && col("x1") >= 0 &&
        col("y0") < 64 && col("y1") >= 0).count()
      (hit, total)
    }
    val (zHit, zTotal) = touched(zDir)
    val (lHit, lTotal) = touched(linDir)
    assert(zTotal >= 12 && lTotal >= 12, "expected ~16 files per layout")
    // linear-by-x: the box prunes on x only — the x-quarter of files
    // survives, and every survivor spans the full y range so y prunes
    // nothing further. z-order: the box is a Morton-aligned quadrant
    // (1/16 of key space), contiguous in z → ~1-2 of 16 files.
    assert(lHit >= lTotal / 4, s"linear layout must keep the x quarter: $lHit/$lTotal")
    assert(zHit <= zTotal / 4, s"z-order must bound touched files: $zHit/$zTotal")
    assert(zHit < lHit, s"z-order must beat linear on the 2-D box ($zHit vs $lHit)")

    // correctness is layout-invariant
    val zRows = spark.read.parquet(zDir).filter(col("x") < 64 && col("y") < 64).count()
    val lRows = spark.read.parquet(linDir).filter(col("x") < 64 && col("y") < 64).count()
    assert(zRows == lRows && zRows > 0)
  }
}
