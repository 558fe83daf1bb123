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
    */
  def train(
      spark: SparkSession,
      wordFreq: DataFrame,
      word: String,
      freq: String,
      steps: Int): DataFrame = {
    require(steps >= 1, s"bpe needs at least one merge step, got $steps")
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
    val merges = ArrayBuffer.empty[(Long, String, String, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val top = cur
        .filter(size(col("s")) >= 2)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(s) - 1),
            |  j -> struct(element_at(s, j) AS a, element_at(s, j + 1) AS b))"""
            .stripMargin)).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, a, b, a + b, cnt))
        val (next, nextIds) = tracker.ck(cur.withColumn("s", applyMergeFold(col("s"), a, b)))
        tracker.free(curIds)
        cur = next
        curIds = nextIds
      }
    }
    tracker.free(curIds)
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
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

  /** One leftmost-greedy non-overlapping merge pass of (a, b) → a+b over a
    * symbol-array column — the shared merge kernel of [[train]] (per-round
    * re-segmentation) and [[encodeVocab]] (rule application at encode time).
    * A codegen'd array fold: the accumulator's last symbol merging with the
    * next one means a just-merged symbol never immediately re-merges. */
  private def applyMergeFold(s: Column, a: String, b: String): Column =
    aggregate(
      slice(s, lit(2), size(s) - 1),
      array(element_at(s, 1)),
      (acc, x) =>
        when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))

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
    // One projection per rule, NOT a single folded expression: applyMergeFold
    // references its input ~3× (head, tail slice, size), so nesting rule k+1
    // around rule k's tree grows ~3^rules — a 20 MiB codegen blob by rule 8.
    // As separate aliases the non-cheap multi-referenced fold is kept
    // un-inlined by CollapseProject and the plan stays linear in the rule
    // count.
    var df = vocab.withColumn("pieces", chars)
    for ((a, b) <- merges) df = df.withColumn("pieces", applyMergeFold(col("pieces"), a, b))
    df.withColumn("n_pieces", size(col("pieces")).cast("long"))
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

  /** Shared unrolled-CTE chain: w0..w{steps-1} vocabulary states (plus
    * w{steps} when `resegmentLast` — encoding needs the post-final-rule
    * segmentation that training never materializes), each with its pair
    * count p$i and deterministic argmax b$i. Carries the raw word `w`
    * through every round so encode-side callers can join back to the
    * token stream; chr(30) separates symbols in the fold and cannot occur
    * in the [a-z_] symbol alphabet. */
  private def chainSql(steps: Int, wordFreqSql: String, resegmentLast: Boolean): String = {
    val sb = new StringBuilder
    sb.append(s"""WITH wf AS ($wordFreqSql),
                 |w0 AS (
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
                   |b$i AS (SELECT a, b, cnt FROM p$i ORDER BY cnt DESC, a, b LIMIT 1)"""
        .stripMargin)
      if (i < steps - 1 || resegmentLast)
        // LEFT JOIN ON TRUE, not CROSS JOIN: when training exhausts early
        // (b$i empty — every word a single symbol), the vocabulary rows
        // must SURVIVE with a no-op re-segmentation (m.a IS NULL guard),
        // exactly like the Spark side's early stop — a CROSS JOIN with an
        // empty b$i would silently empty every later w$k and, for encode
        // callers, the whole result.
        sb.append(s""",
                     |w${i + 1} AS (
                     |  SELECT w, freq, string_split(list_reduce(s, (acc, x) ->
                     |    CASE WHEN m.a IS NOT NULL
                     |              AND regexp_extract(acc, '[a-z_]*$$') = m.a AND x = m.b
                     |         THEN acc || x ELSE acc || chr(30) || x END), chr(30)) AS s
                     |  FROM w$i LEFT JOIN b$i m ON TRUE)""".stripMargin)
    }
    sb.toString
  }
}
