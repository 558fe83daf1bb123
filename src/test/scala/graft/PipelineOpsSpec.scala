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

  test("t99: clusters partition the corpus and shrinkage accounting closes") {
    val out = q("t99_semdedup").collect()
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(out.map(_.getLong(1)).sum == nVecs, "assigned clusters partition the corpus")
    assert(out.exists(_.getLong(3) > 0), "ε must yield real drop decisions on this corpus")
    out.foreach { r =>
      val (nv, np, nd, nk) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nk + nd == nv, s"kept + dropped != cluster size: $r")
      assert(nd <= np || np == 0, s"more drops than ε-pairs: $r")
      assert(nd < nv, s"a cluster may never drop every member (each pair keeps one): $r")
    }
  }

  test("t100: the CMS estimate never underestimates, for every token in the corpus") {
    // The oracle gate checks the top-20 report; the sketch CONTRACT
    // (est >= exact, always) must hold for the whole vocabulary — rebuild
    // the same 4×1024 sketch and check every distinct token against it.
    def cmsHash(tok: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("cms"), j.cast("string"), lit(":"), tok)
        .cast("binary")), 1, 8), 16, 10).cast("long") % 1024
    val toks = Tables.documents(spark, dir)
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val hashed = toks
      .select(col("tok"), col("cnt"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("h", cmsHash(col("tok"), col("j")))
    val cells = hashed.groupBy(col("j"), col("h")).agg(sum(col("cnt")).as("cell"))
    val under = hashed.join(cells, Seq("j", "h"))
      .groupBy(col("tok"), col("cnt")).agg(min(col("cell")).as("est"))
      .filter(col("est") < col("cnt"))
    assert(under.count() == 0, "count-min must never underestimate")
  }

  test("t100: sketch cells are partition-order independent (counter updates commute)") {
    def cmsHash(tok: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("cms"), j.cast("string"), lit(":"), tok)
        .cast("binary")), 1, 8), 16, 10).cast("long") % 1024
    def cells(docs: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("tok"))
      .select(col("tok"), explode(expr("sequence(0, 3)")).as("j"))
      .withColumn("h", cmsHash(col("tok"), col("j")))
      .groupBy(col("j"), col("h")).agg(count(lit(1)).as("cell"))
      .collect().map(r => (r.getInt(0).toLong, r.getLong(1)) -> r.getLong(2)).toMap
    val docs = Tables.documents(spark, dir)
    val a = cells(docs)
    val b = cells(docs.repartition(17))
    assert(a == b, "sketch must not depend on input partitioning")
  }
}
