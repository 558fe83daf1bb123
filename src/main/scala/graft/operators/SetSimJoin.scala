package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayFns

/** Exact set-similarity self-join via prefix filtering (PPJoin family —
  * Xiao et al., WWW'08 "Efficient Similarity Joins for Near Duplicate
  * Detection"): ALL pairs with Jaccard ≥ τ over their token sets, with a
  * completeness GUARANTEE — the deterministic arm of the dedup family,
  * where MinHash-LSH (t31) trades recall for speed and certifies the loss
  * statistically (t102).
  *
  * The filters (all three from the paper, all completeness-preserving):
  *
  *  - PREFIX, both sides: order every set by a global canonical order
  *    (document frequency ascending, then token — rare tokens first).
  *    A pair with jac ≥ τ and |A| ≤ |B| needs overlap
  *    α = ⌈τ/(1+τ)·(|A|+|B|)⌉, and by the prefix-filtering principle its
  *    FIRST shared token (global-order minimum) sits within BOTH
  *    (n − α + 1)-prefixes; the length filter below gives α ≥ ⌈τ·n⌉ on
  *    each side, so the fixed per-set prefix n − ⌈τ·n⌉ + 1 covers it.
  *    Joining prefix-against-prefix (not prefix-against-full-index) cuts
  *    the index side to ~(1−τ) of the corpus tokens — the sf1 rehearsal
  *    measured the full-index formulation going superlinear
  *    (SCALE.md: t157 8.7→330 s at 10×, 52 GB spill) exactly because the
  *    index side kept every token.
  *  - LENGTH: jac ≥ τ forces |A| ≥ τ·|B|; candidates whose sizes differ
  *    more than 1/τ die before the verify.
  *  - POSITIONAL: a candidate row generated at (1-based) positions
  *    (i, j) admits overlap ≤ 1 + min(|A|−i, |B|−j); rows below α are
  *    pruned. The first-shared-token row of every qualifying pair passes
  *    (all α shared tokens sit at positions ≥ its own), so pruning rows
  *    — then taking DISTINCT pairs — loses nothing. Pure integer test:
  *    (1+min)·(100+τ%) ≥ τ%·(|A|+|B|).
  *
  * 100-TB shape: one corpus explode; a token-keyed df wordcount; the
  * prefix explode carries ~(1−τ) of the corpus tokens on BOTH join sides;
  * the candidate join shuffles on the 8-byte token key with NO hint (AQE
  * picks the strategy). df-ascending ordering keeps the fan-out small
  * exactly where the index side is large. Verification is the codegen'd
  * two-pointer intersect over the pre-sorted hash arrays — no per-pair
  * allocation.
  */
object SetSimJoin {

  /** All unordered pairs (id1 < id2) with Jaccard(tokens₁, tokens₂) ≥ tau.
    *
    * @param df     input frame
    * @param id     id column name (numeric or otherwise orderable)
    * @param tokens column holding the DISTINCT, VALUE-SORTED token-hash
    *               array (the [[ArrayFns]] shingle/ngram kernels emit
    *               exactly this shape)
    * @param tauPct similarity threshold τ as an integer percentage
    *               (e.g. 80 = 0.8) — integer so the prefix length and the
    *               verify threshold derive from exact arithmetic
    */
  def join(df: DataFrame, id: String, tokens: String, tauPct: Int): DataFrame = {
    require(tauPct > 0 && tauPct < 100, s"tauPct must be in (0, 100), got $tauPct")
    val toks = df.select(col(id).as("__id"), col(tokens).as("__t"))
      .filter(size(col("__t")) > 0)
      // consumed three times (token index, prefix build, both verify sides)
      .localCheckpoint()
    val u = toks.select(col("__id"), size(col("__t")).cast("long").as("__n"),
      explode(col("__t")).as("__w"))
    val dfreq = u.groupBy(col("__w")).agg(count(lit(1)).as("__df"))
    // df-sorted positions, kept only through each set's prefix.
    // ⌈τ·n⌉ in integers: ceil(p*n/100) = (p*n + 99) div 100
    val pre = u.join(dfreq, Seq("__w"))
      .groupBy(col("__id"))
      .agg(sort_array(collect_list(struct(col("__df"), col("__w")))).as("__o"),
        max(col("__n")).as("__n"))
      .select(col("__id"), col("__n"),
        posexplode(expr(
          s"slice(transform(__o, x -> x.__w), 1, cast(__n - (($tauPct * __n + 99) div 100) + 1 as int))")))
      .select(col("__id"), col("__n"), (col("pos") + 1).cast("long").as("__p"),
        col("col").as("__w"))
      // both candidate-join sides read the prefix frame; without the
      // barrier the collect+sort prefix build runs twice. (Round-14 probe:
      // removing this in favor of ReuseExchange REGRESSED t147/t153/t155 —
      // the candidate join goes BROADCAST on small corpora, and a
      // BroadcastExchange build side embeds a full second copy of the
      // prefix build that shuffle-exchange reuse cannot deduplicate.)
      .localCheckpoint()
    // prefix-against-prefix with A the smaller side (ties broken by id),
    // the length filter, and the positional filter — see the scaladoc for
    // why each preserves the completeness guarantee
    val cand = pre.as("a")
      .join(pre.as("b"), col("a.__w") === col("b.__w") &&
        col("a.__n") * 100 >= col("b.__n") * tauPct &&
        (col("a.__n") < col("b.__n") ||
          (col("a.__n") === col("b.__n") && col("a.__id") < col("b.__id"))) &&
        (lit(1L) + least(col("a.__n") - col("a.__p"), col("b.__n") - col("b.__p")))
          * lit(100L + tauPct) >= lit(tauPct.toLong) * (col("a.__n") + col("b.__n")))
      .select(
        least(col("a.__id"), col("b.__id")).as("__id1"),
        greatest(col("a.__id"), col("b.__id")).as("__id2"))
      .distinct()
    val s1 = toks.select(col("__id").as("__id1"), col("__t").as("__t1"))
    val s2 = toks.select(col("__id").as("__id2"), col("__t").as("__t2"))
    cand.join(s1, Seq("__id1")).join(s2, Seq("__id2"))
      .withColumn("__inter", ArrayFns.sortedIntersectCount(col("__t1"), col("__t2")).cast("long"))
      .withColumn("__union",
        size(col("__t1")).cast("long") + size(col("__t2")).cast("long") - col("__inter"))
      // the τ decision is pure integer arithmetic (i·100 ≥ τ%·u) — no
      // float division anywhere near the threshold, so the boundary is
      // exact and engine-independent
      .filter(col("__inter") * 100 >= lit(tauPct.toLong) * col("__union"))
      .select(col("__id1").as(s"${id}1"), col("__id2").as(s"${id}2"),
        (col("__inter") * 1.0 / col("__union")).as("jac"))
  }
}
