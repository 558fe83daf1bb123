package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list.
  *
  * Two algorithms behind one contract — input `edges(srcCol, dstCol)`
  * (undirected; duplicates and self-loops tolerated), output
  * `(id, component)` where `component` is the MINIMUM node id of the
  * component (the canonical keep-one representative a dedup pipeline wants;
  * cf. the reference's dedup-then-keep-first shape,
  * `d/DistCPPlus.java:596-607`'s duplicate-dest grouping). Every node that
  * appears as either endpoint gets exactly one output row; ids must be an
  * orderable column type (min/least drive the labeling).
  *
  * - `labelPropagation`: each round every node takes the min of its own
  *   label and its neighbors' — one keyed shuffle per round, rounds bounded
  *   by component DIAMETER. Right for the near-dup workload (template
  *   clusters are tiny/star-shaped → 2-3 rounds), but a path graph of
  *   length n needs n rounds, and a hub node's neighborhood is re-shuffled
  *   every round.
  *
  * - `largeSmallStar`: alternating large-star/small-star (Kiveris et al.,
  *   "Connected Components in MapReduce and Beyond", SoCC'14). Each
  *   operation rewires edges toward the neighborhood minimum
  *   (large-star: every neighbor LARGER than the center points at
  *   min(N(u) ∪ {u}); small-star: the center and its ≤-neighbors all point
  *   at the min), provably preserving connectivity and converging in
  *   O(log² n) rounds (O(log n) in practice) REGARDLESS of diameter — and,
  *   critically for 100 TB near-dup graphs, a star of 10⁷ leaves around one
  *   template document collapses in one small-star round instead of
  *   hot-spotting the hub every propagation round. This is the scale path
  *   t49 runs on.
  *
  * Both keep per-round state as checkpointed Datasets (flat lineage,
  * edge-scale shuffles only, nothing driver-side but the one convergence
  * count per round), and FREE each round's blocks as soon as the next
  * round's are materialized — retention is O(1) edge-scale datasets, not
  * O(rounds). The blocks backing the RETURNED frame (final edges/labels +
  * the node set) stay live until the caller is done; release them with the
  * session-wide persistent-RDD sweep the Verify/Bench harnesses already
  * run between queries.
  */
object ConnectedComponents {

  // per-round checkpoint bookkeeping is the shared operators.CkTracker:
  // attribution is a before/after diff of the context's persistent-RDD
  // ids — exact for the sequential calls inside one operator run (a
  // concurrent query checkpointing in the same session could be
  // misattributed; the Verify/Bench harnesses run queries sequentially)

  /** Large-star/small-star alternation to a fixpoint (SoCC'14).
    *
    * Each round is two groupBy-min + join passes over the current edge set;
    * at the fixpoint the edge set IS the component map: every non-root node
    * carries exactly the edge (v, min-of-component).
    */
  def largeSmallStar(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 64): DataFrame =
    largeSmallStarWithRounds(edges, srcCol, dstCol, maxRounds)._1

  /** Same, also reporting how many large+small-star rounds convergence took —
    * the operator's O(log n)-rounds-regardless-of-diameter claim is asserted
    * against this in ConnectedComponentsSpec (a path graph of length n makes
    * label propagation pay ~n rounds; this stays logarithmic). */
  private[graft] def largeSmallStarWithRounds(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 64): (DataFrame, Int) = {
    val tracker = new CkTracker(edges)
    val base = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    // nodes are only consumed by the final labeling join — LAZY, so the
    // loop pays no up-front materialization action for them (round-14 job
    // diet: every eager action here was a sequential job in a loop that
    // runs 3-6 rounds on near-dup graphs); the edge pipeline's internal
    // exchanges are reused across the two union branches
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()

    // round-15 job diet: the per-round state lands via ckCount (ONE action
    // materializes the checkpoint AND reads the cardinality the convergence
    // test needs; eager-ck-then-count paid two), and each star pass funds
    // exactly ONE exchange — an explicit hash repartition on its key that
    // the groupBy-min AND the rewire join both inherit (guide §2.4: two
    // operations keyed the same way share one exchange). The former shape
    // paid ~6 exchanges/round (groupBy + join side + an intermediate
    // distinct, twice); with AQE each exchange is a sequential job, and the
    // loop's 3-6 rounds made that the dominant scheduling floor across all
    // eight CC-consumer queries.
    var (cur, curIds, prevCnt) = tracker.ckCount(base)
    var round = 0
    var converged = prevCnt == 0
    while (!converged) {
      round += 1
      require(
        round <= maxRounds,
        s"connected components did not converge in $maxRounds large/small-star rounds")
      // ---- large-star: symmetric neighborhoods; each neighbor v > u is
      //      rewired to m = min(N(u) ∪ {u}) (v > u ≥ m, so no self-loops)
      val sym = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
        .repartition(col("u"))
      val lsMin = sym.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      // large-star output is NOT deduplicated here: duplicates are bounded
      // by |sym| and the round's closing distinct absorbs them, so the
      // former ls.distinct() exchange (and the AQE ReuseExchange reliance
      // it forced on the two small-star consumers) is simply gone — the
      // small-star pass repartitions once on ITS key instead.
      val ls = sym.join(lsMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // ---- small-star: key every edge by its LARGER endpoint; the center
      //      and all its ≤-neighbors are rewired to the neighborhood min
      val dir = ls.select(
        greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
        .repartition(col("u"))
      val ssMin = dir.groupBy("u")
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val fromNbrs = dir.join(ssMin, "u")
        .filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      val fromCenter = ssMin
        .filter(col("u") =!= col("m"))
        .select(col("u"), col("m").as("v"))
      // set-equality (round 14): both sets are DISTINCT, so |next| == |cur|
      // && (next ∖ cur) == ∅ ⟺ next == cur — the anti-join runs ONLY on
      // rounds whose counts already match (the convergence round, plus
      // count-collision rounds where it correctly reports inequality)
      val (next, nextIds, cnt) = tracker.ckCount(fromNbrs.union(fromCenter).distinct())
      converged = cnt == prevCnt &&
        next.join(cur, Seq("u", "v"), "left_anti").isEmpty
      tracker.free(curIds)
      prevCnt = cnt
      cur = next
      curIds = nextIds
    }
    // fixpoint edges are (node → component-min) stars; roots map to selves
    val labeled = nodes
      .join(cur, nodes("id") === cur("u"), "left")
      .select(col("id"), coalesce(col("v"), col("id")).as("component"))
    (labeled, round)
  }

  /** Min-label propagation to a fixpoint (the diameter-bounded baseline the
    * t49 query originally inlined; kept as the equivalence-test witness and
    * for graphs known to be shallow). */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 256): DataFrame = {
    val tracker = new CkTracker(edges)
    val base = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
    val (sym, symIds) = tracker.ck(base
      .union(base.select(col("v").as("u"), col("u").as("v")))
      .toDF("src", "nbr"))
    var (labels, labelIds) = tracker.ck(edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id")))
      .distinct()
      .withColumn("lbl", col("id")))
    var changed = 1L
    var round = 0
    while (changed > 0) {
      round += 1
      require(
        round <= maxRounds,
        s"label propagation did not converge in $maxRounds rounds")
      val nbrMin = sym.join(labels, sym("nbr") === labels("id"))
        .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
      val (next, nextIds) = tracker.ck(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(
            col("id"),
            least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl")))
      changed = next
        .join(labels.withColumnRenamed("lbl", "oldLbl"), "id")
        .filter(col("lbl") =!= col("oldLbl"))
        .count()
      // previous round's labels are dead once the delta count is taken
      tracker.free(labelIds)
      labels = next
      labelIds = nextIds
    }
    tracker.free(symIds) // loop done; the returned plan reads only `labels`
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Incremental update: fold NEW edges into an EXISTING (id, component)
    * assignment without reprocessing the historical edge set — the
    * clustering half of the streaming dedup loop (the t96/DocStreams
    * admission index answers "is this new doc a dup"; this answers "and
    * which cluster did it join / merge").
    *
    * Correctness: an assignment is itself a star edge list (every node →
    * its component root) with exactly the original graph's connectivity —
    * large-small-star's own fixpoint invariant — so
    * components(assignment-stars ∪ new-edges) == components(all-edges),
    * including the case where a new edge MERGES two old components
    * (their roots become connected through it). Proven against a
    * union-find ground truth over arbitrary batch splits in
    * ConnectedComponentsSpec.
    *
    * Cost: O(nodes + new edges) per fold, not O(historical edges) — at
    * 100 TB the historical pair set dwarfs the node set, and it is never
    * read again. Output contract matches [[largeSmallStar]]: one row per
    * node present in either input, component = min node id.
    */
  def incremental(
      assignment: DataFrame,
      idCol: String,
      componentCol: String,
      newEdges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxRounds: Int = 64): DataFrame = {
    val q = (c: String) => col(s"`${c.replace("`", "``")}`")
    val stars = assignment.select(q(idCol).as("__s"), q(componentCol).as("__d"))
    val fresh = newEdges.select(q(srcCol).as("__s"), q(dstCol).as("__d"))
    largeSmallStar(stars.unionByName(fresh), "__s", "__d", maxRounds)
  }
}
