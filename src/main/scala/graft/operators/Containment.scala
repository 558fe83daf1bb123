package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Asymmetric containment near-dup (near-subset detection): for document
  * pairs (A, B), C(A→B) = |G(A) ∩ G(B)| / |G(A)| over each document's
  * DISTINCT token-k-gram fingerprints. Jaccard-based near-dup (t30/t31)
  * structurally misses the short-doc-quoted-inside-long-doc case — the
  * union is dominated by the long side — while containment flags it at
  * 1.0; it is the inclusion test RefinedWeb-style curation runs next to
  * symmetric near-dup.
  *
  * Gram identity is a 60-bit md5 prefix (`conv(substring(md5(g),1,15),
  * 16,10)`) chosen because the identical arithmetic exists in DuckDB
  * (`('0x' || substring(md5(g),1,15))::BIGINT`), so the oracle compare is
  * exact by construction; a collision would hit both engines identically,
  * making the declared semantics "containment over 60-bit fingerprints".
  *
  * Scale shape: the only corpus-sized work is one gram explode emitting
  * 8-byte ids followed by hash-keyed partial aggs. Pair generation is a
  * shingle-inverted-index self-join restricted to grams with corpus
  * doc-frequency in [2, dfCap] — df=1 grams cannot form a pair, and
  * df>dfCap grams are template "stopwords" (the same production guard as
  * t31's bucket cap) — so per-gram fan-out is bounded by dfCap². No
  * broadcast hints anywhere: AQE chooses from real sizes.
  */
object Containment {

  /** Pairs (doc_id1 ⊆-candidate, doc_id2) with containment ≥ tau.
    * Output: doc_id1, doc_id2, common, gsize (= |G(doc_id1)| within the
    * df-capped gram universe), containment (rounded to 4dp). */
  def pairs(
      docs: DataFrame,
      id: String,
      text: String,
      k: Int,
      dfCap: Int,
      tau: Double): DataFrame = {
    require(k >= 1 && dfCap >= 2, s"need k >= 1 and dfCap >= 2, got k=$k dfCap=$dfCap")
    val idc: Column = col(s"`${id.replace("`", "``")}`")
    val txt: Column = col(s"`${text.replace("`", "``")}`")
    val grams = docs
      .select(idc.as("doc_id"), split(txt, " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(t) - ${k - 1}), p -> array_join(slice(t, p, $k), ' '))"))
        .as("g_str"))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(cast(g_str as binary)), 1, 15), 16, 10) as bigint)")
          .as("gid"))
      .distinct()
    val df = grams.groupBy(col("gid")).agg(count(lit(1)).as("n"))
    val univ = grams.join(df.filter(col("n") <= dfCap), "gid")
    val sz = univ.groupBy(col("doc_id")).agg(count(lit(1)).as("gsize"))
    val shared = univ.filter(col("n") >= 2).select(col("doc_id"), col("gid"))
    val pairsDf = shared.select(col("doc_id").as("doc_id1"), col("gid"))
      .join(shared.select(col("doc_id").as("doc_id2"), col("gid")), "gid")
      .filter(col("doc_id1") =!= col("doc_id2"))
      .groupBy(col("doc_id1"), col("doc_id2"))
      .agg(count(lit(1)).as("common"))
    pairsDf.join(sz.select(col("doc_id").as("doc_id1"), col("gsize")), "doc_id1")
      .filter(col("common") * 1.0 / col("gsize") >= tau)
      .select(col("doc_id1"), col("doc_id2"), col("common"), col("gsize"),
        round(col("common") * 1.0 / col("gsize"), 4).as("containment"))
  }
}
