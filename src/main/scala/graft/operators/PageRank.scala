package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer micro-unit PageRank (Page et al., 1999) over a directed edge
  * list — the centrality ranking a dedup pipeline runs over its near-dup
  * graph to pick the CANONICAL survivor per duplicate cluster: the doc
  * most linked-to by near-duplicates is the best-connected exemplar,
  * a principled alternative to min-doc_id keep-first (t34/t49).
  *
  * Distributed shape: each iteration is one edge-keyed hash join (rank
  * frame onto edge sources — both sides shrink to the duplicated node
  * set, AQE picks broadcast when that is small) followed by a
  * dst-keyed partial-agg sum; per-round state is localCheckpoint'd flat
  * and superseded rounds are freed via [[CkTracker]], the same
  * iterative-state pattern as connected components and the BPE trainer.
  * No global sort, no driver-side graph state — the driver never holds
  * more than the loop counter.
  *
  * Cross-engine determinism: ranks live in integer MICRO-UNITS
  * (start = 1_000_000 per node). Each round's contribution is
  * `(pr * 85) div (100 * deg)` — exact 64-bit integer arithmetic with
  * identical truncation in Spark (`div`) and DuckDB (`//`) on
  * non-negative values — and the damped sum adds the teleport term
  * 150_000 (= 0.15 in micro-units). Integer sums are order-independent
  * under partial aggregation, so the iterate is bit-identical across
  * engines and partitionings; [[oracleSql]] unrolls the same rounds as
  * chained CTEs with zero tolerance.
  */
object PageRank {

  private val Base = 1000000L // 1.0 in micro-units
  private val Teleport = 150000L // (1 - 0.85) * Base

  /** `iters` damped rounds over edges (src → dst). Nodes are the distinct
    * sources (for an undirected graph pass both edge directions, making
    * source set = node set). Returns (id, deg, pr_micro).
    */
  def ranks(edges: DataFrame, src: String, dst: String, iters: Int): DataFrame = {
    require(iters >= 1, s"pagerank needs at least one iteration, got $iters")
    val e = edges
      .select(col(s"`${src.replace("`", "``")}`").as("__s"), col(s"`${dst.replace("`", "``")}`").as("__d"))
      .localCheckpoint()
    val deg = e.groupBy(col("__s").as("id")).agg(count(lit(1)).as("deg")).localCheckpoint()
    val tracker = new CkTracker(edges)
    var (cur, curIds) = tracker.ck(deg.select(col("id"), lit(Base).as("pr")))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(cur.withColumnRenamed("id", "__s"), Seq("__s"))
        .join(deg.withColumnRenamed("id", "__s"), Seq("__s"))
        .select(col("__d").as("id"), expr("(pr * 85) div (deg * 100)").as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("cs"))
      // left join keeps sink-less nodes alive on the teleport term alone —
      // unreachable on an undirected pass (every source is a destination),
      // load-bearing for genuinely directed graphs
      val nxt = deg.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"), (coalesce(col("cs"), lit(0L)) + Teleport).as("pr"))
      val (n2, ids2) = tracker.ck(nxt)
      tracker.free(curIds)
      cur = n2
      curIds = ids2
    }
    cur.join(deg, Seq("id")).select(col("id"), col("deg"), col("pr").as("pr_micro"))
  }

  /** The DuckDB oracle CTE chain (to splice after a `WITH prefix,`):
    * `edgesSql` must yield (a, b) rows; the chain unrolls `iters` rounds
    * with the identical integer arithmetic and exposes `__deg(id, deg)`
    * and `__pr$iters(id, pr)` for the caller's final SELECT. */
  def oracleCtes(iters: Int, edgesSql: String): String = {
    val sb = new StringBuilder
    sb.append(s"""__e AS ($edgesSql),
                 |__deg AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM __e GROUP BY a),
                 |__pr0 AS (SELECT id, CAST($Base AS BIGINT) AS pr FROM __deg)""".stripMargin)
    for (i <- 0 until iters) {
      sb.append(s""",
                   |__pr${i + 1} AS (
                   |  SELECT d.id, CAST($Teleport + COALESCE(SUM(c.c), 0) AS BIGINT) AS pr
                   |  FROM __deg d LEFT JOIN (
                   |    SELECT __e.b AS id, (p.pr * 85) // (100 * dg.deg) AS c
                   |    FROM __e JOIN __pr$i p ON __e.a = p.id
                   |             JOIN __deg dg ON __e.a = dg.id) c ON c.id = d.id
                   |  GROUP BY d.id)""".stripMargin)
    }
    sb.toString
  }
}
