package graft

import scala.util.Random

import graft.operators.PageRank

/** Equivalence + semantics tests for the integer micro-unit PageRank behind
  * t129: the distributed loop must match a driver-side sequential reference
  * implementing the identical integer arithmetic (exact equality — the
  * micro-unit contract means there is no tolerance to hide behind), rank
  * hubs above leaves, and keep sink-less sources alive on the teleport
  * term (the left-join branch an undirected pass never exercises).
  */
class PageRankSpec extends SparkTestBase {

  import spark.implicits._

  /** Sequential reference with the same micro-unit truncation. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr: Map[Long, Long] = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((a, b) <- edges if deg.contains(b)) contrib(b) += pr(a) * 85 / (100 * deg(a))
      pr = deg.keys.map(k => k -> (150000L + contrib(k))).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 4): Map[Long, Long] = {
    val out = PageRank.ranks(edges.toDF("a", "b"), "a", "b", iters)
      .select("id", "pr_micro").as[(Long, Long)].collect().toMap
    assert(out === reference(edges, iters))
    out
  }

  private def undirected(pairs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    pairs ++ pairs.map(_.swap)

  test("undirected star: hub outranks every leaf, exact integer match") {
    val pr = run(undirected((1L to 40L).map(i => (0L, i))))
    val hub = pr(0L)
    (1L to 40L).foreach(i => assert(pr(i) < hub, s"leaf $i not below hub"))
  }

  test("undirected path and clique match the sequential reference") {
    run(undirected((0L until 20L).map(i => (i, i + 1))))
    val k = (0L until 8L)
    run(k.flatMap(a => k.filter(_ != a).map(b => (a, b))))
  }

  test("directed chain: a source with no in-edges settles on the teleport term") {
    // 1→2→3: node 3 has no out-edge so it is not a node; node 1 has no
    // in-edge, so after any round its rank is exactly the teleport mass.
    val pr = run(Seq((1L, 2L), (2L, 3L)))
    assert(pr.keySet === Set(1L, 2L))
    assert(pr(1L) === 150000L)
  }

  test("seeded random graphs (including self-contribution cycles) match exactly") {
    val rnd = new Random(7)
    for (_ <- 1 to 5) {
      val n = 30
      val pairs = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      run(undirected(pairs))
    }
  }

  test("mass never exceeds the injected total (floor-division only loses)") {
    val edges = undirected((1L to 15L).map(i => (0L, i)) ++ Seq((3L, 7L), (9L, 11L)))
    val pr = run(edges)
    assert(pr.values.sum <= pr.size * 1000000L)
  }
}
