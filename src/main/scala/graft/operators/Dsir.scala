package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS'23) —
  * the t114 engine, factored out for library use: hash unigram features
  * into B buckets, fit target and raw bucket distributions with add-1
  * smoothing, and score each document with the summed per-token log
  * importance ratio ln p_tgt(b) − ln p_raw(b) in integer micro-nats.
  *
  * The λ table is B rows — CONSTANT at any corpus scale — so it always
  * broadcasts; the corpus pass is a map-side bucket lookup plus an exact
  * integer per-doc sum (no float-order hazard at any partition count).
  * The bucket hash is the repo's portable md5-prefix (t47 contract),
  * identical in DuckDB, which keeps the oracle gate exact.
  */
object Dsir {

  /** Token frame with the md5-bucketed feature id attached. */
  def bucketed(docs: DataFrame, id: String, text: String, b: Int): DataFrame =
    LmScore.tokens(docs, id, text).withColumn("b", bucketExpr(b))

  /** Per-bucket λ = round(1e6 · (ln p_tgt − ln p_raw)) from two bucketed
    * token frames, defined over ALL B buckets — a bucket unseen in both
    * slices still gets its add-1 smoothed λ, so scoring never drops
    * out-of-domain tokens (score joins on this table). Empty slices
    * coalesce their totals to 0 rather than nulling every λ. */
  def lambdaTable(target: DataFrame, raw: DataFrame, b: Int): DataFrame = {
    val spark = target.sparkSession
    // two B-row aggregates left-joined onto range(b) — broadcastable
    // lookups, where a full-outer pre-merge would plan as sort-merge
    val tgt = target.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rw = raw.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tots = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
      .crossJoin(rw.agg(coalesce(sum(col("cr")), lit(0L)).as("tr")))
    spark.range(b).select(col("id").as("b"))
      .join(tgt, Seq("b"), "left")
      .join(rw, Seq("b"), "left")
      .crossJoin(tots)
      .select(col("b"), lambdaExpr(b))
  }

  /** λ from a pre-aggregated (b, ct, cr) bucket-count frame — the shared
    * tail of [[lambdaTable]] and [[weightsSplit]]. Totals come from the
    * counts themselves (summing the outer-joined frame equals summing
    * each distribution separately), so the caller never re-scans. */
  private def lambdaFromCounts(counts: DataFrame, b: Int): DataFrame = {
    val spark = counts.sparkSession
    val tots = counts.agg(
      coalesce(sum(col("ct")), lit(0L)).as("tt"),
      coalesce(sum(col("cr")), lit(0L)).as("tr"))
    spark.range(b).select(col("id").as("b"))
      .join(counts, Seq("b"), "left")
      .crossJoin(tots)
      .select(col("b"), lambdaExpr(b))
  }

  /** add-1 smoothed λ in integer micro-nats over (ct, cr, tt, tr). */
  private def lambdaExpr(b: Int): Column = expr(
    s"""CAST(ROUND((ln((COALESCE(ct, 0) + 1) / CAST(tt + $b AS DOUBLE))
       |          - ln((COALESCE(cr, 0) + 1) / CAST(tr + $b AS DOUBLE))) * 1000000, 0)
       | AS BIGINT)""".stripMargin).as("lam")

  /** (id, n_tok, logw_micro) for every document with ≥1 token. */
  def score(bucketedDocs: DataFrame, id: String, lam: DataFrame): DataFrame =
    bucketedDocs.join(broadcast(lam), Seq("b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lam")).as("logw_micro"))
      .select(col("__id").as(id), col("n_tok"), col("logw_micro"))

  /** One-call form for the common case where target and raw PARTITION the
    * scoring corpus itself by a row predicate (t114's en vs non-en).
    * Output is row-identical to
    * `weights(docs, docs.filter(pred), docs.filter(!pred))`, but the
    * plan exploits two structural facts the generic form can't:
    *
    *  1. both feature distributions come from ONE conditional wordcount
    *     inside a single tokenize pass, where [[weights]] tokenizes the
    *     corpus three times (docs + target slice + raw slice);
    *  2. the md5 bucket hash — the dominant per-token cost: fix 1 alone
    *     bought only ~14% at the sf10 rehearsal, this one took the query
    *     from 20.2 to 6.2 s — is computed once per DISTINCT word
    *     (vocabulary-sized: Heaps-law ≪ corpus), not once per token
    *     occurrence; scoring joins the token stream against a broadcast
    *     word→λ dictionary (the LmScore.score vocabulary-broadcast
    *     shape) instead of re-hashing every token.
    *
    * The wordcount partial-aggregates map-side to vocabulary size before
    * its shuffle; nothing corpus-sized is ever materialized (at 100 TB,
    * re-tokenizing the scan beats checkpointing a token stream). Rows
    * where the predicate is null count in NEITHER distribution (exactly
    * the two-filter semantics) but are still scored. */
  def weightsSplit(
      docs: DataFrame,
      targetPred: Column,
      id: String = "doc_id",
      text: String = "text",
      b: Int = 256): DataFrame = {
    val wc = LmScore.tokensWith(docs.withColumn("__tgt", targetPred), text, Seq("__tgt"))
      .groupBy(col("w"))
      .agg(
        sum(when(col("__tgt") === true, 1L).otherwise(0L)).as("ct"),
        sum(when(col("__tgt") === false, 1L).otherwise(0L)).as("cr"))
      .withColumn("b", bucketExpr(b))
      // vocabulary-sized, consumed twice (distribution fit + word→λ map)
      .localCheckpoint()
    val lam = lambdaFromCounts(
      wc.groupBy(col("b")).agg(sum(col("ct")).as("ct"), sum(col("cr")).as("cr")), b)
    val wordLam = wc.select(col("w"), col("b")).join(lam, Seq("b")).select(col("w"), col("lam"))
    // The word→λ dictionary is VOCABULARY-sized, not B-sized: Heaps-law
    // growth at 100 TB can exceed any broadcast budget, so the hint is
    // gated on the measured vocabulary count (wc is localCheckpointed —
    // the count is a cached vocab-sized scan). Above the gate the join
    // falls back to whatever AQE picks from runtime shuffle stats, the
    // same discipline Bpe.encodeVocab applies to its merge-rule vocab.
    val scoredJoin =
      if (wc.count() <= broadcastVocabMax) broadcast(wordLam) else wordLam
    LmScore.tokensWith(docs.select(col(s"`${id.replace("`", "``")}`").as("__id"),
        col(s"`${text.replace("`", "``")}`")), text, Seq("__id"))
      .join(scoredJoin, Seq("w"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lam")).as("logw_micro"))
      .select(col("__id").as(id), col("n_tok"), col("logw_micro"))
  }

  /** Largest word→λ vocabulary the scoring join will hint to broadcast:
    * ~2M distinct words ≈ low-hundreds of MB on-heap, safe on any
    * executor profile that runs this engine; larger vocabularies take
    * the un-hinted (AQE-decided) join. */
  private val broadcastVocabMax = 2L * 1000 * 1000

  private def bucketExpr(b: Int): Column = expr(
    s"CAST(conv(substring(md5(CAST(w AS BINARY)), 1, 8), 16, 10) AS BIGINT) % $b")

  /** One-call form: fit on (target, raw) slices and score `docs`. */
  def weights(
      docs: DataFrame,
      target: DataFrame,
      raw: DataFrame,
      id: String = "doc_id",
      text: String = "text",
      b: Int = 256): DataFrame =
    score(
      bucketed(docs, id, text, b), id,
      lambdaTable(bucketed(target, id, text, b), bucketed(raw, id, text, b), b))
}
