package graft

import org.apache.spark.sql.functions._

import graft.operators.DupSpans

/** Planted-fixture contract for the exact duplicated-span operator
  * (t110/t111's engine): span maximality and boundaries, the k threshold,
  * whole-pipeline strip reconstruction, and emptied-doc handling. */
class DupSpansSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("finds exactly the shared run, maximally merged, at its true boundaries") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val df = docs(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"x $shared y z"),
      (3L, "nothing shared here at all beyond eight tokens easily"))
    val spans = DupSpans.find(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: tokens are [alpha, beta, dup1..dup10, gamma] → span 3..12
    // doc 2: [x, dup1..dup10, y, z] → span 2..11; doc 3 clean
    assert(spans.toSeq == Seq((1L, 3L, 12L), (2L, 2L, 11L)))
  }

  test("a shared run of k-1 tokens is below threshold and never flagged") {
    val shared = (1 to 7).map(i => s"dup$i").mkString(" ")
    val df = docs(
      (1L, s"a b c $shared d e f g"),
      (2L, s"p q r $shared s t u v"))
    assert(DupSpans.find(df, "doc_id", "text", k = 8).count() == 0)
  }

  test("within-doc repetition alone does not count as cross-doc duplication") {
    val run = (1 to 8).map(i => s"rep$i").mkString(" ")
    val df = docs(
      (1L, s"$run filler middle tokens here $run"),
      (2L, "entirely distinct words nine ten eleven twelve thirteen fourteen"))
    assert(DupSpans.find(df, "doc_id", "text", k = 8).count() == 0)
  }

  test("strip removes exactly the duplicated tokens and reconstructs the rest") {
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val df = docs(
      (1L, s"alpha beta $shared gamma"),
      (2L, shared), // fully duplicated → stripped to ''
      (3L, "untouched text stays word for word exactly as it came in ok"))
    val out = DupSpans.strip(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "alpha beta gamma", 13L, 3L)))
    assert(out(1) == ((2L, "", 10L, 0L)))
    assert(out(2) == ((3L, "untouched text stays word for word exactly as it came in ok", 12L, 12L)))
  }

  test("docs shorter than k pass through strip untouched") {
    val df = docs((1L, "short doc"), (2L, "short doc"))
    // the two docs are identical but only 2 tokens — below any k=8 gram
    val out = DupSpans.strip(df, "doc_id", "text", k = 8)
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(3)))
    assert(out.toSeq == Seq(("short doc", 2L), ("short doc", 2L)))
  }

  test("regex-special delimiters are matched literally, not regex-interpreted") {
    // '.' as delimiter: a regex-interpreted split("."​) matches every char
    // and produces empty tokens; the literal split must tokenize on dots
    // exactly like the space-delimited twin.
    val shared = (1 to 10).map(i => s"dup$i")
    val dotDf = docs(
      (1L, ("alpha" +: "beta" +: shared :+ "gamma").mkString(".")),
      (2L, ("x" +: shared :+ "y" :+ "z").mkString(".")))
    val spans = DupSpans.find(dotDf, "doc_id", "text", k = 8, delim = ".")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq == Seq((1L, 3L, 12L), (2L, 2L, 11L)))
    val stripped = DupSpans.strip(dotDf, "doc_id", "text", k = 8, delim = ".")
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(3)))
    assert(stripped.toSeq == Seq(("alpha.beta.gamma", 3L), ("x.y.z", 3L)))
  }

  test("candidate joins degrade to shuffled joins when broadcast is unavailable") {
    // Heavy duplication: every doc shares the same run, so the candidate
    // side is corpus-scale. The operator's scale contract is that the
    // candidate joins DEGRADE to shuffled 8-byte-key joins rather than
    // forcing a broadcast of the duplicated mass — a forced broadcast()
    // hint would override the threshold and OOM the driver at 100 TB.
    // Disabling broadcast entirely simulates "candidate side too big":
    // with the hint gone the planner must fall back to a shuffled join.
    val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
    val df = docs((1L to 40L).map(i => (i, s"pre$i $shared post$i")): _*)
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val spans = DupSpans.find(df, "doc_id", "text", k = 8)
      val rows = spans.orderBy("doc_id").collect()
      assert(rows.length == 40 && rows.forall(r => r.getLong(1) == 2L && r.getLong(2) == 13L))
      val plan = spans.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"forced broadcast survived:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled join fallback:\n$plan")
    }
  }

  test("small candidate sides still broadcast under AQE's runtime size check") {
    // The fast path is not lost by dropping the hints: when the duplicated
    // mass actually is small, AQE's runtime size check picks broadcast.
    val shared = (1 to 10).map(i => s"dup$i").mkString(" ")
    val df = docs(
      (1L, s"alpha beta $shared gamma"),
      (2L, s"x $shared y z"),
      (3L, "nothing shared here at all beyond eight tokens easily"))
    val spans = DupSpans.find(df, "doc_id", "text", k = 8)
    spans.collect()
    val plan = spans.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected AQE to broadcast the small candidate side:\n$plan")
  }

  test("column names containing dots resolve by exact name") {
    val df = docs((1L, "a b c"), (2L, "x y z"))
      .withColumnRenamed("doc_id", "doc.id").withColumnRenamed("text", "the.text")
    val out = DupSpans.strip(df, "doc.id", "the.text", k = 2)
    assert(out.columns.toSeq == Seq("doc.id", "the.text", "n_tok_before", "n_tok_kept"))
    assert(out.count() == 2)
  }
}
