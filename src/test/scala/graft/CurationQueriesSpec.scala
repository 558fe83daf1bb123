package graft

import org.apache.spark.sql.functions._

/** Contract checks for the round-9 curation additions beyond the DuckDB
  * oracle gate: t138 (Gopher-style rule table), t139 (sequence-length
  * padding sweep), t140 (similarity-ordered curriculum). The oracle pins
  * values; these pin the INVARIANTS a pipeline consumer relies on —
  * conjunction semantics, exact waste accounting, contiguous rank order —
  * so a future edit can't keep the hash green while breaking the contract
  * (e.g. reordering t140's tie-break).
  */
class CurationQueriesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.registry.find(_.name == name).get.build(spark, dir)

  test("t138: pass is exactly the conjunction of the four rule flags") {
    val rows = run("t138_gopher_rules")
      .select("r_wc", "r_mwl", "r_rep", "r_stop", "pass").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flags = (0 to 3).map(r.getInt)
      assert(flags.forall(f => f == 0 || f == 1))
      assert(r.getInt(4) == (if (flags.forall(_ == 1)) 1 else 0))
    }
  }

  test("t138: rule table covers every document exactly once") {
    val n = Tables.documents(spark, dir).count()
    val out = run("t138_gopher_rules")
    assert(out.count() == n)
    assert(out.select("doc_id").distinct().count() == n)
  }

  test("t139: exact waste accounting and monotone sequence counts") {
    val rows = run("t139_pack_sweep")
      .select("seq_len", "total_tokens", "total_seqs", "pad_waste").collect()
    assert(rows.length == 4)
    val tokens = rows.map(_.getLong(1)).distinct
    assert(tokens.length == 1, "total_tokens must not depend on seq_len")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) * r.getLong(0) - r.getLong(1),
        "pad_waste must equal total_seqs*seq_len - total_tokens")
    }
    val seqs = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(seqs.zip(seqs.tail).forall { case (a, b) => a >= b },
      "larger seq_len can never need more sequences")
  }

  test("t143: tiers partition each source, tier 1 holds at least its quartile") {
    val perSource = Tables.documents(spark, dir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = run("t143_quality_tiers")
      .select("source", "tier", "n_docs").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    rows.foreach { case (_, tier, _) => assert(tier >= 1 && tier <= 4) }
    rows.groupBy(_._1).foreach { case (src, ts) =>
      val n = perSource(src)
      assert(ts.map(_._3).sum == n, s"$src tiers must partition its docs")
      // type-1 quantile thresholds put tie mass low: tier 1 (se <= q1)
      // holds at least ceil(n/4) documents by construction
      val t1 = ts.find(_._2 == 1).map(_._3).getOrElse(0L)
      assert(t1 >= (n + 3) / 4, s"$src tier1=$t1 n=$n")
    }
  }

  test("t140: pos is a contiguous 1..n rank per cluster, csim non-increasing") {
    val rows = run("t140_sim_order")
      .select("cid", "csim", "pos").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    assert(rows.length == Tables.embeddings(spark, dir).count())
    rows.groupBy(_._1).foreach { case (_, cluster) =>
      val byPos = cluster.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to cluster.length).toSeq,
        "pos must be contiguous from 1 within each cluster")
      val sims = byPos.map(_._2)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        "csim must be non-increasing along pos")
    }
  }

  test("t166: planted repetition scores exactly, edge docs report zeros") {
    import spark.implicits._
    // doc 1 alternates two words: 2-grams 5 total/2 distinct → 6000 bp,
    // 3-grams 4/2 → 5000 bp, 4-grams 3/2 → 3333 bp — fails every rule.
    // doc 2 is all-distinct; doc 3 has one word (no grams at any n);
    // doc 4 has no [a-z] words at all and must still report a zero row.
    val docs = Seq(
      (1L, "a b a b a b"),
      (2L, "one two three four five"),
      (3L, "word"),
      (4L, "1234 !!! 99")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val base = java.nio.file.Files.createTempDirectory("graft_t166").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$base/documents.parquet")
    val out = SparkEntry.queries("t166_intra_repetition")(spark, base)
      .collect()
      .map(r => r.getLong(0) ->
        (2 to 10).map(i => r.get(i).toString.toLong))
      .toMap
    //                 n2 d2bp  n3 d3bp  n4 d4bp  r2 r3 r4 pass (n2 at idx 1)
    assert(out(1L) == Seq(6000L, 4L, 5000L, 3L, 3333L, 0L, 0L, 0L, 0L),
      s"planted repeater: ${out(1L)}")
    assert(out(2L) == Seq(0L, 3L, 0L, 2L, 0L, 1L, 1L, 1L, 1L))
    assert(out(3L) == Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L))
    assert(out(4L) == Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L))
  }

  test("t168: the calibration curve is a coherent confusion-table sweep") {
    val rows = run("t168_calibration")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).sortBy(_._1)
    assert(rows.length == 5)
    val n = Tables.documents(spark, dir).count()
    val positives = rows.head._2 + rows.head._4 // tp + fn at any tau
    rows.foreach { case (_, tp, fp, fn, tn, prec, rec) =>
      assert(tp + fp + fn + tn == n, "confusion table must cover the corpus")
      assert(tp + fn == positives, "label positives are threshold-independent")
      assert(prec == (if (tp + fp > 0) tp * 10000 / (tp + fp) else 0L))
      assert(rec == (if (tp + fn > 0) tp * 10000 / (tp + fn) else 0L))
    }
    // raising tau can only drop predictions: tp/fp non-increasing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3, s"monotonicity broke between ${a._1} and ${b._1}")
    }
    // the sweep must actually move — a flat curve means degenerate thresholds
    assert(rows.map(_._2).distinct.length > 1, "tp must vary across thresholds")
  }

  test("t166: one row per document, gram totals match the token counts") {
    val n = Tables.documents(spark, dir).count()
    val out = run("t166_intra_repetition")
    assert(out.count() == n)
    // n-gram totals are determined by the word count alone:
    // total_n = max(words - n + 1, 0) — pins the explode plumbing
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).cast("long").as("nw"))
    val bad = out.join(words, "doc_id")
      .filter(col("n2_grams") =!= greatest(col("nw") - 1, lit(0L)) ||
        col("n3_grams") =!= greatest(col("nw") - 2, lit(0L)) ||
        col("n4_grams") =!= greatest(col("nw") - 3, lit(0L)))
      .count()
    assert(bad == 0L, "gram totals must equal max(words - n + 1, 0)")
  }
}
