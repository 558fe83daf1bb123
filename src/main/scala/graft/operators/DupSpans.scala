package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-span detection and removal — the exact-substring arm of
  * training-data dedup (Lee et al., ACL'22 "Deduplicating Training Data
  * Makes Language Models Better"): every maximal run of ≥ k consecutive
  * tokens that also appears verbatim in another document is located
  * ([[find]]) and strippable ([[strip]]).
  *
  * The single-node formulation is a corpus-wide suffix array; the
  * distributed re-expression is k-gram islands. Every k-token window
  * becomes a (doc, pos, gram) site; grams seen in ≥ minDocs distinct docs
  * mark their sites duplicated; per-doc runs of consecutive duplicated
  * sites merge into maximal spans via gaps-and-islands (pos − row_number
  * is constant along a run).
  *
  * 100-TB shape: the only corpus-sized shuffle carries 8-byte
  * xxhash64(gram) keys, never the gram strings — duplicated hashes are
  * found first, then the (small) candidate sites are re-derived map-side
  * and verified on the FULL gram string before islands run. Exactness is
  * unconditional in both directions: equal strings always share a hash
  * (no true duplicate can be lost), and a cross-string hash collision only
  * adds candidates the string-verify pass then removes. The candidate
  * joins carry NO broadcast hint: both sides are bounded only by the
  * duplicated token mass (tens of percent of a real web corpus), so the
  * plan must be free to degrade to a shuffled join on the 8-byte key —
  * AQE broadcasts when the runtime size is actually under the threshold
  * and shuffles otherwise, which is still ~an order of magnitude lighter
  * than shuffling k-token strings. The islands
  * window and the re-assembly in [[strip]] are keyed per doc (bounded by
  * doc length, never a global sort), and span-coverage explode is bounded
  * by the duplicated token mass — the data being removed, which cannot
  * exceed the corpus.
  *
  * Tokenization contract: single-delimiter LITERAL split (default one
  * space) — the delimiter is never regex-interpreted and never
  * string-interpolated into SQL, so regex metacharacters and quotes are
  * valid delimiters; split-and-rejoin is lossless iff the text is
  * single-delimiter separated. Pre-tokenized corpora can pass any
  * delimiter their joiner uses.
  */
object DupSpans {

  // resolution by exact name, never string-interpolated qualifiers — a
  // column genuinely named "a.b" must keep working
  private def q(c: String): Column = col(s"`${c.replace("`", "``")}`")

  // split() regex-interprets its pattern; quote it so the delimiter is
  // matched literally (concat_ws/array_join already take literal strings)
  private def litSplit(c: Column, delim: String): Column =
    split(c, java.util.regex.Pattern.quote(delim))

  /** One row per maximal cross-document duplicated span:
    * (id, span_start, span_end) in 1-based token coordinates, inclusive.
    */
  def find(
      df: DataFrame,
      id: String,
      text: String,
      k: Int,
      minDocs: Int = 2,
      delim: String = " "): DataFrame = {
    require(k >= 2, s"duplicated-span k must be >= 2, got $k")
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val toks = df.select(q(id).as("__id"), litSplit(q(text), delim).as("__t"))
    // ONE corpus-sized explode, emitting only (id, pos, 8-byte hash) — the
    // gram is fingerprinted map-side, so neither the explode output nor the
    // aggregation shuffle ever carries k-token text. Round-14 kernel: the
    // per-window slice+concat_ws+xxhash64 became one native pass over
    // per-token fingerprints (SimKit.kgramHashesAt — zero per-window
    // allocation). Fingerprint equality still implies nothing on its own:
    // candidates are re-derived as STRINGS and verified below, so the hash
    // choice affects only the candidate set, never the result.
    val sitesH = toks
      .filter(size(col("__t")) >= k)
      .select(col("__id"),
        posexplode(graft.functions.ArrayFns.kgramHashesAt(col("__t"), k)))
      .select(col("__id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    val dupH = sitesH.groupBy(col("h"))
      .agg(countDistinct(col("__id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    // candidate sites are bounded by the duplicated mass; re-derive their
    // gram strings by re-slicing just the documents that contain them, and
    // verify on the FULL string so a cross-string hash collision cannot
    // create a false span (equal strings always share a hash, so no true
    // duplicate can be lost — exactness is unconditional both ways).
    // No broadcast hint on either join: the duplicated mass is unbounded
    // (a heavily-duplicated corpus makes dupH/candSites corpus-scale), so
    // the choice belongs to AQE's runtime size check, not a forced hint.
    val candSites = sitesH.join(dupH, Seq("h")).select(col("__id"), col("p"))
    val cand = toks.join(candSites, Seq("__id"))
      .select(col("__id"), col("p"),
        concat_ws(delim, slice(col("__t"), col("p").cast("int"), lit(k))).as("g"))
    val trueG = cand.groupBy(col("g"))
      .agg(countDistinct(col("__id")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("g")
    val sites = cand.join(trueG, Seq("g")).select("__id", "p")
    val w = Window.partitionBy(col("__id")).orderBy(col("p"))
    sites
      .withColumn("grp", col("p") - row_number().over(w).cast("long"))
      .groupBy(col("__id"), col("grp"))
      .agg(min(col("p")).as("span_start"), (max(col("p")) + (k - 1)).as("span_end"))
      .select(col("__id").as(id), col("span_start"), col("span_end"))
  }

  /** The cleaned corpus: duplicated spans removed from every document.
    * Output columns: id (as named), text (as named — the reconstructed
    * clean text, '' when everything was duplicated), n_tok_before,
    * n_tok_kept. The caller owns the drop policy for emptied docs.
    *
    * Reassembly never shuffles tokens: the span list (small — bounded by
    * the duplicated region count) is collected per doc and joined back at
    * DOCUMENT cardinality, and tokens are dropped in place with an
    * indexed higher-order filter over the still-intact token array. The
    * earlier formulation (posexplode every token → anti-join coverage →
    * collect_list + array_sort per doc) shuffled the whole corpus through
    * the reassembly; this one's only corpus-sized work is the map-side
    * lambda, and per-token cost is O(spans-in-doc) with spans disjoint.
    */
  def strip(
      df: DataFrame,
      id: String,
      text: String,
      k: Int,
      minDocs: Int = 2,
      delim: String = " "): DataFrame = {
    val toks = df.select(q(id).as("__id"), litSplit(q(text), delim).as("__t"))
    // per-doc span list: disjoint [s, e] runs in 1-based token coordinates
    val spans = find(df, id, text, k, minDocs, delim)
      .groupBy(q(id).as("__id"))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e"))).as("__sp"))
    toks.join(spans, Seq("__id"), "left")
      .withColumn("__kept",
        when(col("__sp").isNull, col("__t")).otherwise(
          filter(col("__t"), (_, i) =>
            !exists(col("__sp"), p => (i + 1).cast("long") >= p("s") && (i + 1).cast("long") <= p("e")))))
      .select(
        col("__id").as(id),
        array_join(col("__kept"), delim).as(text),
        size(col("__t")).cast("long").as("n_tok_before"),
        size(col("__kept")).cast("long").as("n_tok_kept"))
  }
}
