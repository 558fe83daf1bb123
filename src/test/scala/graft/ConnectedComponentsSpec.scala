package graft

import scala.util.Random

import graft.operators.ConnectedComponents

/** Equivalence + shape tests for the two connected-components algorithms:
  * large-star/small-star (SoCC'14, the scale path t49 runs on) must produce
  * the identical (id → min-of-component) map as min-label propagation — and
  * as a driver-side union-find reference — on deterministic shapes (star,
  * path, clique, self-loops, empty) and on seeded random graphs that
  * include the skewed-star regime the algorithm exists for.
  */
class ConnectedComponentsSpec extends SparkTestBase {

  import spark.implicits._

  /** Driver-side union-find ground truth with min-id representatives. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
    }
    edges.foreach { case (a, b) => union(a, b) }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("a", "b")
    val truth = unionFind(edges)
    val lss = ConnectedComponents.largeSmallStar(df, "a", "b")
      .as[(Long, Long)].collect().sorted
    val lp = ConnectedComponents.labelPropagation(df, "a", "b")
      .as[(Long, Long)].collect().sorted
    // exactly one row per node on both, identical maps, matching ground truth
    assert(lss.map(_._1).distinct.length === lss.length, "lss emitted duplicate ids")
    assert(lss.toSeq === lp.toSeq)
    assert(lss.toMap === truth)
  }

  test("star graph (the skewed hub t49 cares about)") {
    run((1L to 500L).map(i => (0L, i)))
  }

  test("reversed star (hub is the max id)") {
    run((0L until 500L).map(i => (i, 500L)))
  }

  test("long path (diameter stress — where propagation is slowest)") {
    run((0L until 200L).map(i => (i, i + 1)))
  }

  test("clique plus isolated self-loop node") {
    val clique = for (i <- 0L until 20L; j <- (i + 1) until 20L) yield (i, j)
    run(clique ++ Seq((99L, 99L))) // 99 is its own component
  }

  test("empty edge set") {
    val df = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.largeSmallStar(df, "a", "b").count() === 0L)
  }

  test("string ids work (any orderable type, min = lexicographic)") {
    val edges = Seq(("b", "c"), ("c", "a"), ("x", "y"), ("z", "z")).toDF("s", "d")
    val got = ConnectedComponents.largeSmallStar(edges, "s", "d")
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x", "z" -> "z"))
  }

  test("rounds stay logarithmic on a long path (the claim t49 switched for)") {
    // a 300-edge path has diameter 300: min-label propagation pays ~300
    // rounds; large/small-star must converge in O(log n) — single digits
    val path = (0L until 300L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, rounds) =
      ConnectedComponents.largeSmallStarWithRounds(path, "a", "b")
    assert(labels.as[(Long, Long)].collect().forall(_._2 == 0L))
    assert(rounds <= 10, s"expected O(log n) rounds on a path, took $rounds")
  }

  test("randomized graphs: sparse, dense, and star-mixture regimes") {
    val rnd = new Random(20260813L)
    for (trial <- 1 to 6) {
      val n = 120 + rnd.nextInt(80)
      val regime = trial % 3
      val edges: Seq[(Long, Long)] = regime match {
        case 0 => // sparse random: many small components
          (0 until n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        case 1 => // dense random: one giant component plus stragglers
          (0 until 4 * n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        case _ => // star mixture: a few heavy hubs + random chaff
          val hubs = (0 until 3).map(_ => rnd.nextInt(n).toLong)
          hubs.flatMap(h => (0 until n / 2).map(_ => (h, rnd.nextInt(n).toLong))) ++
            (0 until n / 4).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      }
      withClue(s"trial=$trial regime=$regime n=$n") { run(edges) }
    }
  }

  test("incremental fold over arbitrary batch splits equals the batch result") {
    val rnd = new Random(23)
    for (trial <- 1 to 6) {
      val n = 40 + rnd.nextInt(60)
      val edges = Seq.fill(2 * n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val truth = unionFind(edges)
      val nBatches = 2 + rnd.nextInt(3)
      val batches = rnd.shuffle(edges).grouped(math.max(1, edges.length / nBatches)).toSeq
      var asg = ConnectedComponents.largeSmallStar(batches.head.toDF("a", "b"), "a", "b")
      batches.tail.foreach { b =>
        asg = ConnectedComponents.incremental(asg, "id", "component", b.toDF("a", "b"), "a", "b")
      }
      val got = asg.as[(Long, Long)].collect().toMap
      withClue(s"trial=$trial batches=$nBatches") { assert(got === truth) }
    }
  }

  test("incremental fold merges two established components through one new edge") {
    // two disjoint cliques built first; a single later edge must collapse
    // them into one component labeled by the GLOBAL min — the case where
    // the fold has to rewrite the larger component's root
    val c1 = for (a <- 0L to 4L; b <- 0L to 4L if a < b) yield (a, b)
    val c2 = for (a <- 10L to 14L; b <- 10L to 14L if a < b) yield (a, b)
    val base = ConnectedComponents.largeSmallStar((c1 ++ c2).toDF("a", "b"), "a", "b")
    val folded = ConnectedComponents
      .incremental(base, "id", "component", Seq((14L, 4L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(folded === unionFind(c1 ++ c2 ++ Seq((14L, 4L))))
    assert((10L to 14L).forall(folded(_) == 0L), "old roots must be rewritten to the global min")
  }
}
