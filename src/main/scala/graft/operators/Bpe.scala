package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative byte-pair-encoding trainer (Sennrich et al., ACL'16 "Neural
  * Machine Translation of Rare Words with Subword Units") — the greedy
  * merge loop t105 framed as "BPE iteration 0": count adjacent symbol
  * pairs across the vocabulary weighted by word frequency, merge the top
  * pair everywhere, recount, repeat to a target merge count. Output is
  * the merge table a tokenizer ships: (step, lhs, rhs, merged,
  * pair_count), the artifact that fully determines the learned subword
  * segmentation.
  *
  * Distributed shape (the part that must survive 100 TB): training runs
  * over the (word, freq) VOCABULARY, never the token stream — the one
  * corpus-sized pass is the word-count that builds the vocabulary
  * upstream. Each merge round is then (a) one vocabulary-sized
  * adjacent-pair count, partial-aggregated map-side before a pair-keyed
  * exchange; (b) a TakeOrdered(1) argmax — no global sort, O(1) rows to
  * the driver, matching the reference semantics of "the single best pair
  * becomes a rule"; (c) a map-side re-segmentation applying the rule via
  * a codegen'd array fold — the rule rides into the closure as two
  * literals, the degenerate (and correct) form of a broadcast of the
  * per-round model delta. Per-round state (the re-segmented vocabulary)
  * is localCheckpoint'd so the plan stays flat across rounds instead of
  * stacking `steps` nested folds — the same iterative-state pattern as
  * the k-means loop (t82) and connected components.
  *
  * Merge application is leftmost-greedy non-overlapping, the BPE
  * contract: a fold over the symbol array merges (lhs, rhs) into
  * lhs+rhs wherever the accumulator's last symbol is lhs and the next
  * symbol is rhs — a just-merged symbol never immediately re-merges
  * (merging (a,a) over "a a a" yields "aa a", not "aa aa"-overlap).
  * Ties in the argmax break deterministically by (count DESC, lhs, rhs).
  */
object Bpe {

  /** Train `steps` greedy merges over a (word, freq) vocabulary frame.
    * Words are segmented into single characters after prefixing the
    * GPT-style '_' word-start marker (t105's convention), so boundary
    * pairs compete with in-word pairs exactly as in real tokenizer
    * training. Returns the merge table ordered by step; stops early if
    * every word collapses to a single symbol (fewer rows than `steps`).
    *
    * `batch` > 1 enables BATCHED merges — the wall-clock fix for
    * production vocab sizes, where one Spark job pair per rule makes a
    * 32k-rule run ~10⁵ sequential jobs: each recount round accepts up to
    * `batch` ranked pairs that are pairwise-disjoint, fresh-symboled, and
    * strictly count-separated ([[acceptBatch]]'s C1–C3), and applies them
    * in ONE fold pass. The emitted merge table is PROVABLY identical to
    * the sequential trainer's, rule for rule (proof at [[acceptBatch]];
    * property-tested in BpeSpec) — batching only cuts rounds, never
    * changes the model. */
  def train(
      spark: SparkSession,
      wordFreq: DataFrame,
      word: String,
      freq: String,
      steps: Int,
      batch: Int = 1): DataFrame =
    trainWithRounds(spark, wordFreq, word, freq, steps, batch)._1

  /** [[train]] plus the number of recount ROUNDS executed — the quantity
    * batching exists to cut (each round is one Spark pair-count job + one
    * fold re-segmentation pass regardless of how many rules it lands).
    * Exposed for the BpeSpec wall-clock-contract assertions. */
  def trainWithRounds(
      spark: SparkSession,
      wordFreq: DataFrame,
      word: String,
      freq: String,
      steps: Int,
      batch: Int = 1): (DataFrame, Int) = {
    require(steps >= 1, s"bpe needs at least one merge step, got $steps")
    require(batch >= 1, s"bpe batch must be >= 1, got $batch")
    val q = (c: String) => col(s"`${c.replace("`", "``")}`")
    // per-round state is checkpointed flat; superseded rounds are freed via
    // the shared tracker — Dataset.unpersist() is a no-op on checkpoint
    // blocks, and a long merge run (real tokenizers: thousands of rounds)
    // would otherwise pin one vocabulary copy per round
    val tracker = new CkTracker(wordFreq)
    var (cur, curIds) = tracker.ck(wordFreq
      .select(q(freq).cast("long").as("freq"),
        concat(lit("_"), q(word)).as("sym"))
      .select(col("freq"), expr(
        "transform(sequence(1, length(sym)), i -> substring(sym, i, 1))").as("s")))
    // Batched acceptance needs the CURRENT symbol alphabet (freshness guard
    // C2 below). Seed it with one tiny distinct-symbols job — the result is
    // alphabet-sized — then grow it driver-side by each merged symbol;
    // symbols that later vanish from the vocabulary stay in the set, which
    // is conservative (can only shrink a batch, never unsound).
    val known = scala.collection.mutable.Set.empty[String]
    if (batch > 1)
      known ++= cur.select(explode(col("s")).as("sym")).distinct()
        .collect().map(_.getString(0))
    val merges = ArrayBuffer.empty[(Long, String, String, String, Long)]
    var rounds = 0
    var exhausted = false
    // Round-14 job diet: checkpoint every CkEvery-th round instead of every
    // round. Between checkpoints `cur` is a LAZY stack of ≤ CkEvery merge-fold
    // projections over the last checkpoint — each round's ranked-pairs
    // collect recomputes those few vocabulary-sized folds (cheap: the
    // vocabulary is distinct words, Zipf-tiny next to the corpus), and the
    // plan stays linear because the fold is a non-cheap multi-referenced
    // expression CollapseProject keeps un-inlined (see encodeVocab's note).
    // Halves the sequential actions of a merge run; the emitted table is
    // unchanged (checkpointing never affected what a round computes).
    val CkEvery = 4
    var sinceCk = 0
    while (merges.size < steps && !exhausted) {
      val remaining = steps - merges.size
      val want = math.min(batch, remaining)
      // fetch enough ranked pairs to (a) fill the batch and (b) always see
      // the first pair BEYOND it, whose count is the trim cut-off
      val fetch = math.max(4 * want, want + 1)
      val ranked = cur
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(s) - 1),
            |  j -> struct(element_at(s, j) AS a, element_at(s, j + 1) AS b))"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(fetch)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      rounds += 1
      if (ranked.isEmpty) exhausted = true
      else {
        val accepted = acceptBatch(ranked, want, known, sawAll = ranked.length < fetch)
        for ((a, b, cnt) <- accepted)
          merges += ((merges.size.toLong + 1, a, b, a + b, cnt))
        known ++= accepted.map { case (a, b, _) => a + b }
        val rules = accepted.map { case (a, b, _) => (a, b) }
        val folded = cur.withColumn("s", applyMergesFold(col("s"), rules))
        sinceCk += 1
        if (sinceCk >= CkEvery && merges.size < steps) {
          val (next, nextIds) = tracker.ck(folded)
          tracker.free(curIds)
          cur = next
          curIds = nextIds
          sinceCk = 0
        } else cur = folded // lazy until the next checkpoint boundary
      }
    }
    tracker.free(curIds)
    import spark.implicits._
    (merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count"), rounds)
  }

  /** Greedy batch acceptance over the ranked (cnt DESC, a, b) pair list —
    * returns a prefix of merges PROVABLY equal to what the sequential
    * trainer would emit, one rule per round, in the same order.
    *
    * Why a batch prefix is sequential-equivalent. Merging (a, b) → ab
    * changes pair counts ONLY for pairs touching a, b, or the new symbol
    * ab: pairs over untouched symbols keep their exact counts AND their
    * adjacency positions (a merge replaces two symbols by one, so (x, y)
    * with x, y ∉ {a, b, ab} is adjacent after iff it was adjacent before).
    * Pairs containing a or b can only LOSE occurrences. Brand-new pairs
    * (x, ab) / (ab, y) are each bounded by the ORIGINAL count of an
    * overlapping pair — (x, a) resp. (b, y) — because every occurrence
    * arises from such an original adjacency. So accept pairs r₁, r₂, …
    * walking the ranked list in order, subject to:
    *
    *  C1 (disjoint): rᵢ shares no symbol with earlier accepted pairs —
    *     its count and greedy-merge sites are then EXACTLY what the
    *     sequential trainer sees at its round, and one simultaneous fold
    *     pass equals the sequential passes;
    *  C2 (fresh merge symbol): each accepted merged string aᵢ+bᵢ must not
    *     collide with any CURRENT vocabulary symbol, batch symbol, or
    *     earlier batch merge result — a collision would let "new" pair
    *     counts pile onto existing ones and break the bound above;
    *  C3 (strict count separation): stop at the first violating pair q and
    *     TRIM to the prefix whose counts strictly exceed c_cut = q's count
    *     (r₁ is exempt — it is the global argmax regardless). Every pair
    *     overlapping the batch ranks at or below q, so every new pair any
    *     batch merge can create has count ≤ c_cut < cᵢ — it can neither
    *     beat nor TIE an accepted rᵢ at its sequential round. Ties against
    *     surviving original pairs resolve exactly as sequential: their
    *     counts and the (cnt, a, b) order are unchanged below rᵢ.
    *
    * If the walk exhausts the fetched list without a violation and the list
    * was NOT truncated (`sawAll`), no pair in existence overlaps the batch,
    * no new pairs can arise at all, and c_cut = 0; if it WAS truncated or
    * stopped at the batch-size cap, c_cut is the first unaccepted count.
    * Worst case every round accepts only r₁ — exactly the sequential
    * trainer. Equivalence is property-tested against the sequential path in
    * BpeSpec over random vocabularies.
    *
    * C4 (self-pair half-count bound; edge-gate finding, EDGE.md). The
    * new-pair bound above reads "(x, ab) is bounded by the ORIGINAL count
    * of an overlapping pair, which ranks at or below the cut" — but
    * merging a self-pair (a, a) → aa creates (aa, aa), whose occurrences
    * arise from a-RUNS: the bounding original pair is (a, a) ITSELF, an
    * ACCEPTED pair above the cut (a 4000-char single-letter run: (a,a)
    * count 7998 → (aa,aa) count 3998 > the 3824-count pair the batch
    * accepted next, which sequential orders AFTER (aa,aa)). The tight
    * bound: leftmost-greedy over a weighted run of k a's leaves
    * ⌊k/2⌋ − 1 ≤ (k − 1)/2 adjacencies, so count(aa, aa) ≤ c_self / 2.
    * Rule: after accepting a self-pair with count c_self, later batch
    * members must satisfy 2·c > c_self (strict, so the successor cannot
    * even TIE them); the first pair failing it stops the walk and sets
    * the cut to its count. Earlier members need no re-check — ranked
    * order gives them counts ≥ c_self > c_self/2. A non-self merge
    * (a, b) can also chain into (ab, ab), but only via "abab…" runs
    * whose bounding original (b, a) SHARES symbols with the accepted
    * pair — a C1 violator, hence at or below the cut — so only
    * self-pairs need C4. Regression pinned in BpeSpec's
    * single-letter-run property.
    */
  private def acceptBatch(
      ranked: Array[(String, String, Long)],
      want: Int,
      known: collection.Set[String],
      sawAll: Boolean): Seq[(String, String, Long)] = {
    val accepted = ArrayBuffer.empty[(String, String, Long)]
    val syms = scala.collection.mutable.Set.empty[String]
    val made = scala.collection.mutable.Set.empty[String]
    var cut = -1L // -1 = undetermined; resolved before trimming
    var selfMax = 0L // largest accepted SELF-pair count (C4 bound source)
    var i = 0
    var stopped = false
    while (i < ranked.length && accepted.size < want && !stopped) {
      val (a, b, c) = ranked(i)
      val m = a + b
      val fresh = !known(m) && !syms(m) && !made(m) && m != a && m != b
      if (accepted.isEmpty) {
        // the top pair is the sequential argmax by construction — always
        // accepted; if its merge symbol is NOT fresh the new-pair bound is
        // void, so the batch is just this one rule (a sequential round)
        accepted += ((a, b, c)); syms += a; syms += b; made += m
        if (a == b) selfMax = c // C4: successors bounded by c/2
        if (!fresh) stopped = true
      } else if (!syms(a) && !syms(b) && fresh && 2 * c > selfMax) {
        accepted += ((a, b, c)); syms += a; syms += b; made += m
        if (a == b) selfMax = math.max(selfMax, c)
      } else {
        cut = c
        stopped = true
      }
      i += 1
    }
    if (cut < 0)
      cut = if (i < ranked.length) ranked(i)._3 // stopped at cap / C2-of-r1
            else if (!sawAll) ranked.last._3     // truncated fetch: bound by the tail
            else 0L                              // saw every pair, none conflicted
    val keep = ArrayBuffer(accepted.head)
    var j = 1
    while (j < accepted.size && accepted(j)._3 > cut) { keep += accepted(j); j += 1 }
    keep.toSeq
  }

  /** Persist a learned merge table — the artifact a tokenizer ships. One
    * file: the table is model-sized (one row per merge rule) by
    * definition, so a single-file parquet is the right layout for the
    * thing every encode job will broadcast-read. */
  def saveMerges(merges: DataFrame, path: String): Unit =
    merges.coalesce(1).write.mode("overwrite").parquet(path)

  /** Load a shipped merge table back as the rule list [[encodeVocab]]
    * consumes, in learned (step) order. */
  def loadMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path)
      .orderBy(col("step"))
      .select(col("lhs"), col("rhs"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq

  /** One leftmost-greedy pass applying a whole BATCH of pairwise-disjoint
    * rules simultaneously: per step at most one rule can match (rules
    * share no symbols and merge results are fresh — acceptBatch's C1/C2),
    * so the single pass equals applying the rules in sequential passes.
    * Round 14: a native SimKit kernel instead of an `aggregate(...)` HOF —
    * higher-order lambdas run on Spark's interpreted path, and this fold
    * is the trainer's per-word hot loop (it also re-evaluates under the
    * lazy between-checkpoint rounds below). Semantics unchanged: the
    * accumulator's last symbol merging with the next one means a
    * just-merged symbol never immediately re-merges. */
  private def applyMergesFold(s: Column, rules: Seq[(String, String)]): Column =
    graft.functions.ArrayFns.applyMerges(s, rules, sequentialPasses = false)

  /** Encode a VOCABULARY of distinct words with a learned merge table:
    * segment each word into '_'-prefixed characters, then apply each
    * (lhs, rhs) rule in learned order via [[applyMergeFold]]. Returns the
    * input columns plus `pieces` (the subword array) and `n_pieces`.
    *
    * This is the scale half of corpus encoding: the fold chain runs once
    * per DISTINCT word (vocabulary-sized, heavy-tailed Zipf ⇒ tiny next to
    * the token stream), and the corpus-sized step is then a plain
    * hash join of the token stream against this frame — AQE broadcasts it
    * when the vocabulary is small, degrades to a shuffled join otherwise.
    * All rules ride into one projection as literals (the merge table is
    * model-sized, the degenerate broadcast), so the whole encode is
    * map-side with zero extra shuffles.
    */
  def encodeVocab(vocab: DataFrame, word: String, merges: Seq[(String, String)]): DataFrame = {
    val escaped = s"`${word.replace("`", "``")}`"
    val chars = expr(
      s"transform(sequence(1, length(concat('_', $escaped))), i -> substring(concat('_', $escaped), i, 1))")
    // Round 14: ALL rules apply inside ONE native kernel call (one full
    // leftmost-greedy pass per rule, in learned order — identical to the
    // former chain of per-rule fold projections, which evaluated an
    // interpreted HOF once per rule per word). The rule table rides into
    // the generated code as a codegen reference object — the same
    // degenerate model broadcast as before, without the 3^rules /
    // per-projection plan growth concerns.
    vocab
      .withColumn("pieces",
        graft.functions.ArrayFns.applyMerges(chars, merges, sequentialPasses = true))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
  }

  /** The DuckDB oracle for [[train]]: `steps` unrolled CTE rounds, each
    * re-deriving the pair counts, taking the deterministic argmax, and
    * re-segmenting via a leftmost-greedy list_reduce fold (appending rhs
    * directly onto an accumulator whose last symbol is lhs — no separator
    * — merges them; chr(30) separates symbols and can't occur in the
    * [a-z_] symbol alphabet). Generated here so the iteration count and
    * tie-break stay pinned to the Spark side by construction.
    */
  def oracleSql(steps: Int, wordFreqSql: String): String = {
    val arms = (0 until steps).map { i =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS step, a AS lhs, b AS rhs,
         |  a || b AS merged, cnt AS pair_count FROM b$i""".stripMargin
    }
    chainSql(steps, wordFreqSql, resegmentLast = false) +
      "\n" + arms.mkString("\nUNION ALL\n") + "\nORDER BY step"
  }

  /** The DuckDB oracle for corpus encoding with [[encodeVocab]] over merges
    * learned by [[train]] on the same vocabulary: re-derives the merge
    * rules with the identical unrolled chain (so the rules match the Spark
    * side by construction), applies all `steps` rules to the vocabulary,
    * then joins the per-document token stream (`docTokensSql`, emitting
    * (doc_id, w)) against the encoded vocabulary and aggregates per doc.
    * Fertility = subword pieces per word, the tokenizer-eval metric.
    */
  def encodeOracleSql(steps: Int, wordFreqSql: String, docTokensSql: String): String =
    chainSql(steps, wordFreqSql, resegmentLast = true) +
      s""",
         |enc AS (SELECT w, CAST(len(s) AS BIGINT) AS np FROM w$steps),
         |tok AS ($docTokensSql)
         |SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(enc.np) AS BIGINT) AS n_pieces,
         |  ROUND(SUM(enc.np) * 1.0 / COUNT(*), 4) AS fertility
         |FROM tok JOIN enc ON tok.w = enc.w
         |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

  /** The DuckDB oracle for the t169 ROUND-TRIP certification: re-derives
    * the merge rules with the identical unrolled chain, decodes every
    * encoded vocabulary word (concatenate pieces, strip the '_' marker),
    * and re-assembles each document from its token stream's decoded
    * pieces in position order — the inversion property
    * decode(encode(doc)) == canonical(doc) that tokenizer users actually
    * depend on, checked per document. `docTokensSql` must emit
    * (doc_id, w, pos) with pos the 1-based token position;
    * `docCanonSql` must emit (doc_id, canon) — the space-joined
    * canonical token stream the round trip must reproduce. */
  def roundTripOracleSql(
      steps: Int,
      wordFreqSql: String,
      docTokensSql: String,
      docCanonSql: String): String =
    chainSql(steps, wordFreqSql, resegmentLast = true) +
      s""",
         |enc AS (SELECT w, CAST(len(s) AS BIGINT) AS np,
         |  substring(list_aggregate(s, 'string_agg', ''), 2) AS dec FROM w$steps),
         |tok AS ($docTokensSql),
         |canon AS ($docCanonSql),
         |r AS (
         |  SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |    CAST(SUM(enc.np) AS BIGINT) AS n_pieces,
         |    CAST(SUM(CASE WHEN enc.dec <> tok.w THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_bad_words,
         |    string_agg(enc.dec, ' ' ORDER BY tok.pos) AS rebuilt
         |  FROM tok JOIN enc ON tok.w = enc.w GROUP BY tok.doc_id)
         |SELECT r.doc_id, r.n_words, r.n_pieces, r.n_bad_words,
         |  CAST(CASE WHEN r.rebuilt = canon.canon THEN 1 ELSE 0 END AS BIGINT) AS ok
         |FROM r JOIN canon ON r.doc_id = canon.doc_id
         |ORDER BY r.doc_id""".stripMargin

  /** The DuckDB oracle for the t172 CADENCE round-trip certification —
    * the bounded-state form of [[roundTripOracleSql]]: identical rule
    * derivation and per-word decode, but the per-document check is
    * `n_bad_words == 0` instead of materializing the rebuilt string.
    * The two are equivalent by construction: the canonical stream and
    * the rebuilt stream are space-joins of the SAME extracted token
    * sequence ([a-z]+ tokens are space-free, so the join is injective),
    * hence rebuilt == canon ⟺ dec == w at every position ⟺
    * n_bad_words == 0. Dropping the reassembly turns the corpus-sized
    * per-doc collect/string_agg state into four longs per document —
    * the production-cadence shape (t169's full reassembly stays the
    * offline audit, additionally exercising the assembly machinery
    * itself). `docTokensSql` must emit (doc_id, w); no position column
    * is needed — order no longer matters. */
  def roundTripCadenceOracleSql(
      steps: Int,
      wordFreqSql: String,
      docTokensSql: String): String =
    chainSql(steps, wordFreqSql, resegmentLast = true) +
      s""",
         |enc AS (SELECT w, CAST(len(s) AS BIGINT) AS np,
         |  substring(list_aggregate(s, 'string_agg', ''), 2) AS dec FROM w$steps),
         |tok AS ($docTokensSql)
         |SELECT tok.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
         |  CAST(SUM(enc.np) AS BIGINT) AS n_pieces,
         |  CAST(SUM(CASE WHEN enc.dec <> tok.w THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_bad_words,
         |  CAST(CASE WHEN SUM(CASE WHEN enc.dec <> tok.w THEN 1 ELSE 0 END) = 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS ok
         |FROM tok JOIN enc ON tok.w = enc.w
         |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin

  /** Shared unrolled-CTE chain: w0..w{steps-1} vocabulary states (plus
    * w{steps} when `resegmentLast` — encoding needs the post-final-rule
    * segmentation that training never materializes), each with its pair
    * count p$i and deterministic argmax b$i. Carries the raw word `w`
    * through every round so encode-side callers can join back to the
    * token stream; chr(30) separates symbols in the fold and cannot occur
    * in the [a-z_] symbol alphabet. */
  private def chainSql(steps: Int, wordFreqSql: String, resegmentLast: Boolean): String = {
    val sb = new StringBuilder
    // w$i and b$i are each referenced TWICE (pair count + re-segmentation /
    // merge-table arm); DuckDB inlines non-materialized CTEs per reference,
    // so an unrolled chain of depth n would expand to a 2^n scan tree —
    // fatal at t159's 32 rounds ("too many open files" before any work).
    // MATERIALIZED pins each round to one evaluation, making oracle cost
    // linear in rounds like the Spark side.
    sb.append(s"""WITH wf AS ($wordFreqSql),
                 |w0 AS MATERIALIZED (
                 |  SELECT w, freq, list_transform(range(1, length('_' || w) + 1),
                 |                                 i -> substring('_' || w, i, 1)) AS s
                 |  FROM wf)""".stripMargin)
    for (i <- 0 until steps) {
      sb.append(s""",
                   |p$i AS (
                   |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
                   |    SELECT freq, unnest(list_transform(range(1, len(s)),
                   |      j -> struct_pack(a := s[j], b := s[j+1]))) AS pr
                   |    FROM w$i)
                   |  GROUP BY 1, 2),
                   |b$i AS MATERIALIZED (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)"""
        .stripMargin)
      if (i < steps - 1 || resegmentLast)
        // LEFT JOIN ON TRUE, not CROSS JOIN: when training exhausts early
        // (b$i empty — every word a single symbol), the vocabulary rows
        // must SURVIVE with a no-op re-segmentation (m.a IS NULL guard),
        // exactly like the Spark side's early stop — a CROSS JOIN with an
        // empty b$i would silently empty every later w$k and, for encode
        // callers, the whole result.
        sb.append(s""",
                     |w${i + 1} AS MATERIALIZED (
                     |  SELECT w, freq, string_split(list_reduce(s, (acc, x) ->
                     |    CASE WHEN m.a IS NOT NULL
                     |              AND regexp_extract(acc, '[a-z_]*$$') = m.a AND x = m.b
                     |         THEN acc || x ELSE acc || chr(30) || x END), chr(30)) AS s
                     |  FROM w$i LEFT JOIN b$i m ON TRUE)""".stripMargin)
    }
    sb.toString
  }
}
