package graft.operators

import org.apache.spark.sql.DataFrame
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
    LmScore.tokens(docs, id, text)
      .withColumn("b", expr(
        s"CAST(conv(substring(md5(CAST(w AS BINARY)), 1, 8), 16, 10) AS BIGINT) % $b"))

  /** Per-bucket λ = round(1e6 · (ln p_tgt − ln p_raw)) from two bucketed
    * token frames, defined over ALL B buckets — a bucket unseen in both
    * slices still gets its add-1 smoothed λ, so scoring never drops
    * out-of-domain tokens (score joins on this table). Empty slices
    * coalesce their totals to 0 rather than nulling every λ. */
  def lambdaTable(target: DataFrame, raw: DataFrame, b: Int): DataFrame = {
    val spark = target.sparkSession
    val tgt = target.groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rw = raw.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tots = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
      .crossJoin(rw.agg(coalesce(sum(col("cr")), lit(0L)).as("tr")))
    spark.range(b).select(col("id").as("b"))
      .join(tgt, Seq("b"), "left")
      .join(rw, Seq("b"), "left")
      .crossJoin(tots)
      .select(col("b"), expr(
        s"""CAST(ROUND((ln((COALESCE(ct, 0) + 1) / CAST(tt + $b AS DOUBLE))
           |          - ln((COALESCE(cr, 0) + 1) / CAST(tr + $b AS DOUBLE))) * 1000000, 0)
           | AS BIGINT)""".stripMargin).as("lam"))
  }

  /** (id, n_tok, logw_micro) for every document with ≥1 token. */
  def score(bucketedDocs: DataFrame, id: String, lam: DataFrame): DataFrame =
    bucketedDocs.join(broadcast(lam), Seq("b"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lam")).as("logw_micro"))
      .select(col("__id").as(id), col("n_tok"), col("logw_micro"))

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
