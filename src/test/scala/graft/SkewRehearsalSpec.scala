package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.operators.DupSpans
import graft.queries.Similarity

/** Skew-planted scale rehearsal for the dedup family: what happens when a
  * pathological fraction of the corpus is ONE phrase — the boilerplate /
  * license-header / template case every real web crawl contains.
  *
  *  - t31's mega-bucket cap must keep candidate generation bounded: a
  *    phrase shared by 50 docs lands all 50 in the same band buckets, and
  *    without the cap the bucket join emits 50·49/2 pairs per band; with
  *    it the bucket is skipped entirely (recall deliberately traded for
  *    boundedness — the t31 contract) while ordinary 2-member buckets
  *    still surface their pairs.
  *  - DupSpans' hot-gram story is NOT AQE skew splitting — the candidate
  *    join's build side is an aggregation co-partitioned with the join,
  *    not a bare shuffle stage, so OptimizeSkewedJoin's pattern can never
  *    match it. What actually keeps the stage balanced is (a) the
  *    two-phase distinct aggregation: the corpus-sized exchange keys on
  *    (hash, doc) — NOT skewed, distinct docs spread — and the per-hash
  *    exchange that follows carries at most one partially-counted row per
  *    (map task, hash), so a gram shared by 30k docs crosses the second
  *    wire as ≤ #tasks rows; and (b) in the heavy-duplication regime
  *    (build side too big to broadcast) the join shuffles 8-byte xxhash64
  *    keys, which scatter duplicated MASS uniformly across partitions —
  *    one mega-hot gram is exactly the case where the build side is tiny
  *    and AQE broadcasts instead (DupSpansSpec pins that). These are the
  *    mechanisms this spec asserts, by plan shape and by measured
  *    partition histogram.
  */
class SkewRehearsalSpec extends SparkTestBase {

  import spark.implicits._

  test("t31's bucket cap drops a planted 50-doc hot phrase but keeps real pairs") {
    val hotText = "this exact boilerplate sentence appears verbatim in very many documents of the corpus"
    val pairTexts = Seq(
      "first genuine near duplicate pair shares this quite specific wording",
      "second genuine near duplicate pair shares this other specific wording",
      "third genuine near duplicate pair shares yet another specific wording")
    // fillers must be pairwise DISSIMILAR under CHAR shingles: texts
    // differing only in an id digit share most of their shingles and
    // would legitimately verify as near-dups — use seeded random words
    def gibberish(seed: Long): String = {
      val rnd = new scala.util.Random(seed)
      (1 to 10).map(_ => (1 to 6).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    }
    val docs =
      (1L to 50L).map(i => (i, hotText)) ++
        pairTexts.zipWithIndex.flatMap { case (t, i) =>
          Seq((101L + 2 * i, t), (102L + 2 * i, t))
        } ++
        (200L to 400L).map(i => (i, gibberish(i)))
    val df = docs.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("planted"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val base = Files.createTempDirectory("graft_skew_t31").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$base/documents.parquet")

    // the hot bucket really exists at size 50 — the cap, not hash luck,
    // is what excludes it below
    val sizes = Similarity.bandSignatures(Similarity.shingleDocs(df))
      .groupBy(col("band"), col("sig")).agg(count(lit(1)).as("bsize"))
      .agg(max(col("bsize"))).as[Long].head()
    assert(sizes == 50L, s"expected a 50-member hot bucket, got max bsize $sizes")

    // drive the REAL registry query over the planted corpus
    val out = SparkEntry.queries("t31_minhash_lsh")(spark, base)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((101L, 102L), (103L, 104L), (105L, 106L)),
      s"cap must drop all hot-phrase pairs and keep the three planted pairs, got ${out.toSeq}")
  }

  test("a 20k-doc hot gram stays exact and is absorbed map-side by the dedup aggregation") {
    // one 8-token phrase shared by every doc → ONE gram hash carries half
    // of all site rows. Even with broadcast unavailable (forcing the
    // degraded shuffled-join regime), values must stay exact and the
    // duplicated-hash aggregation must show the two-phase shape that
    // absorbs the hot key before the per-hash exchange.
    val phrase = (1 to 8).map(i => s"tpl$i").mkString(" ")
    val nDocs = 20000L
    val df = (1L to nDocs).map(i => (i, s"u$i $phrase")).toDF("doc_id", "text")
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val spans = DupSpans.find(df, "doc_id", "text", k = 8)
      val rows = spans.collect()
      // values stay exact under skew: every doc's span is the phrase,
      // tokens 2..9 (the u$i boundary gram is unique per doc)
      assert(rows.length == nDocs &&
        rows.forall(r => r.getLong(1) == 2L && r.getLong(2) == 9L))
      val plan = spans.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("BroadcastHashJoin"))
      // the corpus-sized exchange keys on (hash, doc) — per-doc spread, so
      // the 20k-row hot gram never funnels raw through one partition…
      assert(plan.contains("Exchange hashpartitioning(h") &&
        plan.matches("(?s).*Exchange hashpartitioning\\(h[^,)]*, __id.*"),
        s"expected the distinct pre-aggregation keyed on (hash, doc):\n$plan")
      // …and the per-hash exchange that follows carries partially-counted
      // rows (≤ one per map task per hash), the map-side absorption
      assert(plan.contains("partial_count(distinct"),
        s"expected a partial distinct count before the per-hash exchange:\n$plan")
    }
  }

  test("heavy duplication scatters uniformly across shuffle partitions under xxhash64") {
    // the regime where the candidate join genuinely degrades to a shuffle:
    // MANY duplicated phrases (250 here, 12 tokens → 5 duplicated grams
    // each, every phrase shared by 40 docs). The shuffle key is
    // xxhash64(gram), so the duplicated mass spreads over 1250 hash keys —
    // the measured per-partition histogram of duplicated-site rows must
    // stay near-uniform, and it only tightens as real corpora push the
    // key count into the millions. pmod(hash(h), n) below is exactly
    // Spark's HashPartitioning assignment for the join exchange.
    val nPhrases = 250
    val docsPerPhrase = 40
    val docs = (0 until nPhrases).flatMap { p =>
      val phrase = (1 to 12).map(i => s"ph${p}w$i").mkString(" ")
      (0 until docsPerPhrase).map { j =>
        val id = p.toLong * docsPerPhrase + j
        (id, s"pre$id $phrase post$id")
      }
    }
    val df = docs.toDF("doc_id", "text")
    val spans = DupSpans.find(df, "doc_id", "text", k = 8)
    assert(spans.count() == nPhrases.toLong * docsPerPhrase)

    // re-derive the duplicated-site rows the join shuffles and histogram
    // them over 32 partitions the way the exchange would
    val sites = df
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 7),
          |  p -> xxhash64(concat_ws(' ', slice(split(text, ' '), p, 8))))"""
          .stripMargin)).as("h"))
    val dupH = sites.groupBy("h").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2).select("h")
    val hist = sites.join(dupH, Seq("h"))
      .groupBy(pmod(hash(col("h")), lit(32)).as("part"))
      .agg(count(lit(1)).as("n"))
      .select("n").as[Long].collect()
    assert(hist.length == 32, s"duplicated mass missing from ${32 - hist.length} partitions")
    val (mx, avg) = (hist.max.toDouble, hist.sum.toDouble / hist.length)
    assert(mx / avg < 1.7,
      s"duplicated-site shuffle imbalanced: max/avg = ${mx / avg} (hist: ${hist.toSeq})")
  }
}
