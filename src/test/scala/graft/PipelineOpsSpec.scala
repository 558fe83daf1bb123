package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the privacy / quantization / incremental-dedup
  * queries (t96–t98) that the value-level DuckDB gate can't express as
  * hash-compares: admission consistency, k-anonymity accounting, and the
  * quantization error bound.
  */
class PipelineOpsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) =
    SparkEntry.registry.find(_.name == name).get.build(spark, dir)

  test("t96: every batch doc appears exactly once, admitted iff no dup") {
    val out = q("t96_incremental_dedup").collect()
    val nBatch = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0).count()
    assert(out.length == nBatch, "one row per batch doc")
    assert(out.map(_.getLong(0)).distinct.length == out.length, "doc_id unique")
    out.foreach { r =>
      val nDups = r.getLong(1)
      val admitted = r.getBoolean(3)
      assert(admitted == (nDups == 0L), s"admitted flag inconsistent: $r")
      // best_jac present iff a verified dup exists, and then >= threshold
      if (nDups > 0) assert(r.getDouble(2) >= 0.8, s"best_jac below threshold: $r")
      else assert(r.isNullAt(2), s"admitted doc carries a best_jac: $r")
    }
  }

  test("t97: pseudonyms collide never (unique names) and groups partition customers") {
    val out = q("t97_anonymize").collect()
    val nCust = Tables.customer(spark, dir).count()
    assert(out.map(_.getLong(2)).sum == nCust, "quasi-groups partition the table")
    out.foreach { r =>
      assert(r.getLong(3) == r.getLong(2),
        s"pseudonym collision inside a quasi-group: $r")
      assert(r.getBoolean(4) == (r.getLong(2) >= 10L), s"released flag wrong: $r")
    }
  }

  test("t97: pseudonymization is deterministic and non-invertible-looking (no raw names)") {
    val a = q("t97_anonymize").collect()
    val b = q("t97_anonymize").collect()
    assert(a.toSeq == b.toSeq, "same input must yield identical audit output")
  }

  test("t98: reconstruction error bounded by half a quantization step") {
    // symmetric rounding: |x - q/scale| <= 0.5/scale; with scale = 127/max|x|
    // the bound in 1e-4 ticks is round(0.5 * max|x| / 127 * 1e4) (+1 for the
    // tick-rounding of the bound itself).
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        expr("aggregate(CAST(embedding AS ARRAY<DOUBLE>), CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(x)))").as("m"))
    val joined = q("t98_quantize_audit").join(emb, "vec_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val errE4 = r.getLong(4)
      val m = r.getDouble(5)
      val boundE4 = math.round(0.5 * m / 127.0 * 10000.0) + 1
      assert(errE4 <= boundE4, s"err $errE4 exceeds half-step bound $boundE4 (m=$m)")
      assert(r.getLong(3) >= 1, "max-|x| element must saturate to ±127")
    }
  }
}
