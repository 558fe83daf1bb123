package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed power iteration for the top principal direction of an
  * embedding matrix — the rotation/whitening primitive embedding
  * pipelines run before PQ (OPQ-style), IVF coarse quantization, or
  * variance-based outlier pruning. v_{k+1} = normalize(Xᵀ X v_k),
  * iterated a fixed number of rounds from the deterministic start e_1.
  *
  * Distributed shape: each round is ONE corpus pass — a projection
  * computing the row's dot = ⟨x, v_k⟩ (v_k rides in as literals, the
  * degenerate broadcast of the per-round model), then `dim` partial-agg
  * integer sums s_j = Σ_i ROUND(dot_i · x_ij · 1e6); only `dim` Longs
  * reach the driver, which renormalizes. No shuffle at all — the agg is
  * a scalar (global) aggregate whose partials are dim-length vectors.
  *
  * Cross-engine determinism (the reason this is oracle-able at all):
  * per-term quantization to integer MICRO-UNITS before the sum makes the
  * reduction order-independent (the LmScore trick); the dot is a
  * SEQUENTIAL left fold (`aggregate(zip_with(...))`), bit-identical to
  * DuckDB's `list_sum(list_transform(...))`; the driver-side norm
  * √(Σ s_j²) folds in ascending-j order exactly like the oracle's
  * `list_sum` over `list(... ORDER BY j)`; and sqrt/division are
  * IEEE-correctly-rounded. By induction every iterate v_k is
  * bit-identical in both engines, so the oracle needs NO tolerance.
  */
object PcaPower {

  /** `iters` power-iteration rounds over `emb`'s `vecCol` (array column,
    * `dim` components). Returns the final unit direction. Rows whose
    * vector is null are ignored; a zero intermediate norm (impossible on
    * a non-degenerate corpus) keeps the previous iterate. */
  def topComponent(emb: DataFrame, vecCol: String, dim: Int, iters: Int): Array[Double] = {
    require(dim >= 1 && iters >= 1, s"need dim >= 1 and iters >= 1, got dim=$dim iters=$iters")
    // checkpoint via the shared tracker so the corpus-sized block is freed
    // on return — Dataset.unpersist() is a no-op on checkpoint blocks, and
    // repeated library calls would otherwise pin one corpus copy each
    val tracker = new CkTracker(emb)
    val (e, eIds) = tracker.ck(emb
      .select(col(s"`${vecCol.replace("`", "``")}`").cast("array<double>").as("x"))
      .filter(col("x").isNotNull))
    var v = Array.tabulate(dim)(j => if (j == 0) 1.0 else 0.0)
    for (_ <- 1 to iters) {
      val vArr: Column = array(v.map(lit(_)): _*).cast("array<double>")
      // codegen'd sequential-fold kernel, NOT aggregate(zip_with(...)):
      // HOFs evaluate on Spark's interpreted path, and the hot loop here
      // runs once per row per round. Fold order is unchanged (left, index
      // ascending), so the oracle equivalence is unaffected.
      val withDot = e.withColumn("dot",
        graft.functions.ArrayFns.dotProduct(col("x"), vArr))
      val aggs = (1 to dim).map(j =>
        sum(expr(s"CAST(ROUND(dot * element_at(x, $j) * 1e6) AS BIGINT)")).as(s"s$j"))
      val row = withDot.agg(aggs.head, aggs.tail: _*).head()
      val s = Array.tabulate(dim)(j => if (row.isNullAt(j)) 0L else row.getLong(j))
      val norm = math.sqrt(s.foldLeft(0.0)((a, q) => a + q.toDouble * q.toDouble))
      if (norm > 0.0) v = s.map(_.toDouble / norm)
    }
    tracker.free(eIds)
    v
  }

  /** The DuckDB oracle: `iters` unrolled rounds of the identical
    * dot → micro-unit quantized sums → ORDER BY j norm → renormalize
    * sequence, over `CAST(embedding AS DOUBLE[])`. Generated so the
    * iteration count and quantization stay pinned to the Spark side.
    *
    * Precondition: a NON-DEGENERATE corpus (at least one vector with a
    * nonzero first component, so every round's sums are nonzero). The
    * bit-identical-by-induction argument holds only there: on an empty or
    * all-zero corpus [[topComponent]] keeps the previous iterate (a
    * robustness fallback), while this SQL's empty/zero sums collapse to
    * an empty result or a 0-division — a semantic divergence that cannot
    * arise on real embedding data but would on a pathological fixture. */
  def oracleSql(dim: Int, iters: Int, embSql: String): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH e AS ($embSql),
                 |js AS (SELECT CAST(unnest(generate_series(1, $dim)) AS BIGINT) AS j),
                 |v0 AS (SELECT list_transform(generate_series(1, $dim),
                 |         j -> CASE WHEN j = 1 THEN CAST(1.0 AS DOUBLE)
                 |                   ELSE CAST(0.0 AS DOUBLE) END) AS v)""".stripMargin)
    for (k <- 1 to iters) {
      sb.append(s""",
                   |d$k AS (
                   |  SELECT x, list_sum(list_transform(generate_series(1, $dim),
                   |                     i -> x[i] * vv.v[i])) AS dot
                   |  FROM e CROSS JOIN v${k - 1} vv),
                   |s$k AS (
                   |  SELECT j, CAST(SUM(CAST(ROUND(dot * x[j] * 1e6) AS BIGINT)) AS BIGINT) AS s
                   |  FROM d$k CROSS JOIN js GROUP BY j),
                   |n$k AS (SELECT sqrt(list_sum(list_transform(
                   |          list(CAST(s AS DOUBLE) ORDER BY j), q -> q * q))) AS nrm FROM s$k),
                   |v$k AS (SELECT list(CAST(s AS DOUBLE) / nn.nrm ORDER BY j) AS v
                   |        FROM s$k CROSS JOIN n$k nn)""".stripMargin)
    }
    sb.append(s"""
                 |SELECT js.j AS component, ROUND(vv.v[js.j], 6) + 0.0 AS loading
                 |FROM v$iters vv CROSS JOIN js ORDER BY component""".stripMargin)
    sb.toString
  }
}
