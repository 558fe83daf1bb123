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
    var cur = wordFreq
      .select(q(freq).cast("long").as("freq"),
        concat(lit("_"), q(word)).as("sym"))
      .select(col("freq"), expr(
        "transform(sequence(1, length(sym)), i -> substring(sym, i, 1))").as("s"))
      .localCheckpoint()
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
        val applyMerge: (Column, Column) => Column = (acc, x) =>
          when(element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x)))
        val next = cur
          .withColumn("s", aggregate(
            slice(col("s"), lit(2), size(col("s")) - 1),
            array(element_at(col("s"), 1)),
            applyMerge))
          .localCheckpoint()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count")
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
    val sb = new StringBuilder
    sb.append(s"""WITH wf AS ($wordFreqSql),
                 |sy AS (SELECT '_' || w AS sym, freq FROM wf),
                 |w0 AS (
                 |  SELECT freq, list_transform(range(1, length(sym) + 1),
                 |                              i -> substring(sym, i, 1)) AS s
                 |  FROM sy)""".stripMargin)
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
      if (i < steps - 1)
        sb.append(s""",
                     |w${i + 1} AS (
                     |  SELECT freq, string_split(list_reduce(s, (acc, x) ->
                     |    CASE WHEN regexp_extract(acc, '[a-z_]*$$') = m.a AND x = m.b
                     |         THEN acc || x ELSE acc || chr(30) || x END), chr(30)) AS s
                     |  FROM w$i CROSS JOIN b$i m)""".stripMargin)
    }
    val arms = (0 until steps).map { i =>
      s"""SELECT CAST(${i + 1} AS BIGINT) AS step, a AS lhs, b AS rhs,
         |  a || b AS merged, cnt AS pair_count FROM b$i""".stripMargin
    }
    sb.append("\n" + arms.mkString("\nUNION ALL\n") + "\nORDER BY step")
    sb.toString
  }
}
