package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns

/** Equivalence of the banded early-exit edit-distance kernel
  * (SimKit.editDistBanded via ArrayFns.editDistWithin) with the builtin
  * `levenshtein` under the threshold contract: exact distance when ≤ t,
  * −1 otherwise — on random near/far string pairs, adversarial small
  * alphabets (max in-band churn), non-BMP code points (surrogate-pair
  * counting), and the boundary cases (empty, equal, t = 0, gap > t).
  */
class EditDistSpec extends SparkTestBase {

  import spark.implicits._

  private def check(pairs: Seq[(String, String)], t: Int): Unit = {
    val df = pairs.toDF("a", "b")
      .select(
        ArrayFns.editDistWithin(col("a"), col("b"), t).as("band"),
        levenshtein(col("a"), col("b")).as("full"))
      .collect()
    df.foreach { r =>
      val (band, full) = (r.getInt(0), r.getInt(1))
      val expected = if (full <= t) full else -1
      assert(band === expected, s"t=$t full=$full band=$band")
    }
  }

  test("random pairs over a tiny alphabet match the builtin at every threshold") {
    val rnd = new Random(11)
    def s(n: Int) = Seq.fill(n)("ab".charAt(rnd.nextInt(2))).mkString
    val pairs = Seq.fill(300)((s(rnd.nextInt(40)), s(rnd.nextInt(40))))
    for (t <- Seq(0, 1, 3, 10, 40)) check(pairs, t)
  }

  test("near pairs (planted edits) are exact within the band") {
    val rnd = new Random(12)
    val base = Seq.fill(200)("abcdefgh".charAt(rnd.nextInt(8))).mkString
    val pairs = (1 to 50).map { k =>
      val sb = new StringBuilder(base)
      (1 to k).foreach(_ => sb.setCharAt(rnd.nextInt(base.length), 'z'))
      (base, sb.toString)
    }
    for (t <- Seq(5, 25, 60)) check(pairs, t)
  }

  test("boundary cases: empty, equal, zero threshold, gap beyond threshold") {
    check(Seq(("", ""), ("", "abc"), ("abc", ""), ("same", "same")), 0)
    check(Seq(("", "abcdef"), ("abcdef", "")), 3) // gap 6 > t ⇒ -1
    check(Seq(("kitten", "sitting")), 2) // true distance 3 ⇒ -1
    check(Seq(("kitten", "sitting")), 3)
  }

  test("non-BMP text counts code points, not UTF-16 units") {
    // U+1F600 is a surrogate pair in UTF-16; one emoji swap is ONE edit
    val a = "ab😀cd"
    val b = "ab😁cd"
    check(Seq((a, b), (a, a), ("abXcd", a)), 4)
  }

  test("per-row thresholds decide every pair exactly (the t130 per-pair band)") {
    // threshold is now an expression: each pair carries its OWN band
    // T = max_len/4 (t130's accept budget). The contract under test is
    // the equivalence t130's correctness rests on: lev ≤ T ⇒ exact
    // distance, lev > T ⇒ −1 — with T varying per row, including T = 0
    // and a negative T (kernel short-circuits to −1).
    val rnd = new Random(13)
    def s(n: Int) = Seq.fill(n)("abc".charAt(rnd.nextInt(3))).mkString
    val rows = Seq.fill(200)((s(rnd.nextInt(30)), s(rnd.nextInt(30)), rnd.nextInt(12) - 2))
    val got = rows.toDF("a", "b", "t")
      .select(
        ArrayFns.editDistWithin(col("a"), col("b"), col("t")).as("band"),
        levenshtein(col("a"), col("b")).as("full"),
        col("t"))
      .collect()
    got.foreach { r =>
      val (band, full, t) = (r.getInt(0), r.getInt(1), r.getInt(2))
      val expected = if (t >= 0 && full <= t) full else -1
      assert(band === expected, s"t=$t full=$full band=$band")
    }
  }

  test("t130 pins its verify fan-out against AQE's size-based coalescing") {
    // the fix this guards: AQE folded the byte-tiny pair frame to ~1
    // partition and ran the CPU-bound band kernel single-threaded
    // (2.9 s vs 0.3 s at sf0.1). The DP stage is materialized by a
    // localCheckpoint, so its partitioning is observable as the one new
    // persistent RDD carrying exactly defaultParallelism partitions —
    // the explicit-count repartition AQE must not coalesce. (The other
    // checkpoints in the build — shingles, bands, candidates — are scan-
    // or AQE-partitioned and land elsewhere at this fixture size.)
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    SparkEntry.queries("t130_editdist_dedup")(spark, "/root/testdata/sf0.001").collect()
    val fresh = (sc.getPersistentRDDs.keySet -- before).toSeq
      .flatMap(id => sc.getPersistentRDDs.get(id))
    assert(fresh.exists(_.getNumPartitions == sc.defaultParallelism),
      s"no checkpoint carries the pinned fan-out; partition counts = " +
        fresh.map(_.getNumPartitions).sorted.mkString(","))
  }
}
