package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered orientation (the
  * classic MapReduce formulation — Suri & Vassilvitskii, WWW'11): orient
  * every undirected edge from the (degree, id)-smaller endpoint to the
  * larger, build wedges only from each node's OUT-edges, and close them
  * against the oriented edge list. Orientation is the whole trick: a
  * node's out-degree is bounded by O(√m) regardless of its raw degree, so
  * the wedge join cannot explode on hubs — the naive neighbor-join
  * squares a celebrity node's degree, this squares at most √m.
  *
  * Triangle density over the near-dup graph separates template cliques
  * (boilerplate families, mirror sets — dense, many triangles) from
  * chain-shaped false-positive paths (A≈B≈C with A≉C — zero triangles),
  * which is why dedup QA looks at it before trusting cluster counts.
  *
  * All joins are node- or pair-keyed and hint-free (AQE owns the
  * strategy); each triangle {x,y,z} with π(x)<π(y)<π(z) is produced
  * exactly once as the wedge (x→y, x→z) closed by y→z.
  */
object Triangles {

  /** Per-node triangle participation counts: (node, n_tri), one row per
    * node that belongs to at least one triangle. Input edges are treated
    * as undirected; self-loops and duplicate/reversed edges are folded. */
  def perNode(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // consumed three times (degree count, orientation, wedge close)
      .localCheckpoint()
    val deg = e.select(col("a").as("v")).union(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    // π = (deg, id): orient u→w iff π(u) < π(w)
    val orient = e
      .join(deg.select(col("v").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("w"),
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("dw"))
    // wedges (u→v, u→w) with π(v) < π(w), closed by the oriented edge v→w
    val wedges = orient.select(col("u"), col("w").as("v"), col("dw").as("dv"))
      .join(orient.select(col("u"), col("w"), col("dw")), Seq("u"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("u"), col("v"), col("w"))
    val tri = wedges
      .join(orient.select(col("u").as("v"), col("w")), Seq("v", "w"))
      .select(col("u").as("x"), col("v").as("y"), col("w").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
  }
}
