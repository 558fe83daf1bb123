package graft

import scala.util.Random

import graft.operators.PcaPower

/** Randomized equivalence for the distributed power iteration: the exact
  * quantized update must match a sequential driver-side reference bit for
  * bit (same quantization, same fold orders), and on a planted
  * anisotropic cloud the result must align with the known dominant
  * direction.
  */
class PcaPowerSpec extends SparkTestBase {

  import spark.implicits._

  /** Sequential reference of the identical update: per-row sequential
    * dot, per-term micro-unit rounding into integer sums, ascending-j
    * norm fold, renormalize. */
  private def reference(rows: Seq[Array[Double]], dim: Int, iters: Int): Array[Double] = {
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val s = Array.fill(dim)(0L)
      rows.foreach { x =>
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += x(i) * v(i); i += 1 }
        var j = 0
        while (j < dim) {
          val q = dot * x(j) * 1e6
          // HALF_UP away from zero, matching SQL ROUND in both engines
          // (math.round floors x+0.5, diverging on negative halves)
          s(j) += (if (q >= 0) math.floor(q + 0.5) else -math.floor(-q + 0.5)).toLong
          j += 1
        }
      }
      val norm = math.sqrt(s.foldLeft(0.0)((a, q) => a + q.toDouble * q.toDouble))
      if (norm > 0.0) v = s.map(_.toDouble / norm)
    }
    v
  }

  test("topComponent matches the sequential reference exactly on random clouds") {
    val rnd = new Random(20260814L)
    for (trial <- 1 to 3) {
      val dim = rnd.nextInt(6) + 3
      val n = rnd.nextInt(200) + 50
      // float-quantize like parquet storage so both paths see identical doubles
      val rows = Seq.fill(n)(Array.fill(dim)((rnd.nextGaussian() * 0.5).toFloat.toDouble))
      val df = rows.map(r => Tuple1(r.map(_.toFloat))).toDF("embedding")
      val got = PcaPower.topComponent(df, "embedding", dim, iters = 5)
      val want = reference(rows, dim, iters = 5)
      assert(got.toSeq == want.toSeq, s"trial $trial diverged:\n got=${got.toSeq}\nwant=${want.toSeq}")
    }
  }

  test("recovers a planted dominant direction") {
    val rnd = new Random(7L)
    val dim = 8
    val axis = Array.tabulate(dim)(j => if (j == 2) 1.0 else 0.0)
    // variance 9 along axis 2, variance 0.01 elsewhere
    val rows = Seq.fill(400)(Array.tabulate(dim)(j =>
      ((if (j == 2) rnd.nextGaussian() * 3.0 else rnd.nextGaussian() * 0.1)).toFloat.toDouble))
    val df = rows.map(r => Tuple1(r.map(_.toFloat))).toDF("embedding")
    val v = PcaPower.topComponent(df, "embedding", dim, iters = 8)
    val align = math.abs(v.zip(axis).map { case (a, b) => a * b }.sum)
    assert(align > 0.99, s"expected alignment with planted axis, got $align (v=${v.toSeq})")
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9, s"result must be unit-norm, got $norm")
  }

  test("topComponent frees its corpus checkpoint on return") {
    val df = Seq.fill(50)(Tuple1(Array(1.0f, 0.5f, 0.25f))).toDF("embedding")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    PcaPower.topComponent(df, "embedding", dim = 3, iters = 3)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"topComponent leaked checkpoint RDDs: $leaked")
  }

  test("null vectors are ignored and a degenerate corpus keeps the start iterate") {
    val df = Seq(Option(Array(0.0f, 0.0f)), None, Option(Array(0.0f, 0.0f))).toDF("embedding")
    val v = PcaPower.topComponent(df, "embedding", dim = 2, iters = 3)
    assert(v.toSeq == Seq(1.0, 0.0), s"zero corpus must keep e1, got ${v.toSeq}")
  }
}
