package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity / near-duplicate operators: cosine top-k over embeddings,
  * char-n-gram Jaccard near-dup, MinHash+LSH near-dup, SimHash near-dup,
  * per-query brute-force ANN.
  *
  * Scale design:
  *  - All per-row vector math uses higher-order functions (zip_with /
  *    aggregate / transform) in **double** — codegen'd, no UDFs, and
  *    bit-identical to the DuckDB oracle's sequential list_sum fold.
  *  - Pairwise ops here are the *verify* stage; candidate generation is
  *    LSH-bucketed (MinHash bands, SimHash prefixes) so the quadratic join
  *    only runs inside buckets. At 100 TB you'd repartition by bucket key;
  *    the band-bucket groupBy below shuffles exactly once on that key.
  *  - MinHash constants: h(s) = first-8-hex of md5 mod p (p = 2^31-1);
  *    h_k = (a_k·h + b_k) mod p with a_k = ((2k+1)·1103515245) mod p,
  *    b_k = (12345k+7). K = 32 hashes, 8 bands × 4 rows. All arithmetic
  *    stays < 2^63 and is reproduced verbatim in the oracle SQL.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns, in double —
    * matches DuckDB `list_sum(list_transform(...))` element order. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  private def norm2(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** doc_id + distinct lower-cased char-3-gram shingle set. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("shingles",
        expr("array_distinct(transform(sequence(1, greatest(length(t) - 2, 1)), i -> substring(t, i, 3)))"))

  private def jaccard(s1: Column, s2: Column): Column = {
    val inter = size(array_intersect(s1, s2)).cast("double")
    inter / (size(s1) + size(s2) - size(array_intersect(s1, s2)))
  }

  val all: Seq[Q] = Seq(
    // ----- Q25: brute-force cosine top-20 pairs (ids ≤ 200) -----
    Q(
      "q25_cosine_pairs",
      (s, d) => {
        val e = Tables.embeddings(s, d).filter(col("vec_id") <= 200)
        val a = e.select(col("vec_id").as("vec_id1"), col("embedding").as("e1"))
        val b = e.select(col("vec_id").as("vec_id2"), col("embedding").as("e2"))
        a.join(b, col("vec_id1") < col("vec_id2"))
          .select(col("vec_id1"), col("vec_id2"), round(cosine(col("e1"), col("e2")), 4).as("sim"))
          .orderBy(col("sim").desc, col("vec_id1"), col("vec_id2"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
             |          FROM embeddings WHERE vec_id <= 200)
             |SELECT a.vec_id AS vec_id1, b.vec_id AS vec_id2,
             |  ROUND(list_sum(list_transform(generate_series(1, len(a.emb)), i -> a.emb[i] * b.emb[i]))
             |        / (sqrt(list_sum(list_transform(a.emb, x -> x*x)))
             |           * sqrt(list_sum(list_transform(b.emb, x -> x*x)))), 4) AS sim
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |ORDER BY sim DESC, vec_id1, vec_id2 LIMIT 20""".stripMargin),
    ),

    // ----- n-gram Jaccard near-duplicate pairs (exact, the verify stage) -----
    // Brute-force all-pairs is O(n²): bounded here to doc_id < 500 on both
    // sides (like q25's vec_id bound). The unbounded scale path is
    // t31_minhash_lsh, whose candidate generation is LSH-bucketed.
    Q(
      "t30_ngram_jaccard",
      (s, d) => {
        val sh = shingled(s, d).filter(col("doc_id") < 500)
        val a = sh.select(col("doc_id").as("doc_id1"), col("shingles").as("s1"))
        val b = sh.select(col("doc_id").as("doc_id2"), col("shingles").as("s2"))
        a.join(b, col("doc_id1") < col("doc_id2"))
          .withColumn("jac", jaccard(col("s1"), col("s2")))
          .filter(col("jac") >= 0.6)
          .select(col("doc_id1"), col("doc_id2"), round(col("jac"), 4).as("jac"))
          .orderBy("doc_id1", "doc_id2")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(generate_series(1, greatest(length(lower(text)) - 2, 1)),
             |                  i -> substring(lower(text), i, 3))) AS shingles
             |  FROM documents WHERE doc_id < 500)
             |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
             |  ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |        / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 4) AS jac
             |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
             |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
             |      / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.6
             |ORDER BY doc_id1, doc_id2""".stripMargin),
    ),

    // ----- MinHash + LSH banding near-dup (candidate gen + exact verify) -----
    Q(
      "t31_minhash_lsh",
      (s, d) => {
        // Signatures are computed per-row with higher-order functions (one
        // md5 per shingle, K=32 permutations folded in codegen) — no
        // explode/shuffle until the 8-rows-per-doc band explode. The only
        // shuffles are the band-bucket join and the candidate verify join,
        // both on keys that scale with candidate count, not corpus².
        val sh = shingled(s, d)
        val bands = sh
          .withColumn("hs", expr(
            "transform(shingles, sg -> CAST(conv(substring(md5(sg), 1, 8), 16, 10) AS BIGINT) % 2147483647)"))
          .withColumn("mins", expr(
            """transform(sequence(0, 31), k ->
              |  array_min(transform(hs, h ->
              |    (((2*CAST(k AS BIGINT) + 1) * 1103515245) % 2147483647 * h
              |     + (12345*CAST(k AS BIGINT) + 7)) % 2147483647)))""".stripMargin))
          .withColumn("band", explode(expr("sequence(0, 7)")))
          .withColumn("sig", expr(
            "array_join(transform(slice(mins, band*4 + 1, 4), v -> CAST(v AS STRING)), '-')"))
          .select(col("doc_id"), col("band"), col("sig"))
        val b1 = bands.select(col("band"), col("sig"), col("doc_id").as("doc_id1"))
        val b2 = bands.select(col("band"), col("sig"), col("doc_id").as("doc_id2"))
        val cand = b1.join(b2, Seq("band", "sig")).filter(col("doc_id1") < col("doc_id2"))
          .select("doc_id1", "doc_id2").distinct()
        val s1 = sh.select(col("doc_id").as("doc_id1"), col("shingles").as("s1"))
        val s2 = sh.select(col("doc_id").as("doc_id2"), col("shingles").as("s2"))
        cand.join(s1, "doc_id1").join(s2, "doc_id2")
          .withColumn("jac", jaccard(col("s1"), col("s2")))
          .filter(col("jac") >= 0.5)
          .select(col("doc_id1"), col("doc_id2"), round(col("jac"), 4).as("jac"))
          .orderBy("doc_id1", "doc_id2")
      },
      Some("""WITH sh AS (
             |  SELECT doc_id,
             |    list_distinct(list_transform(generate_series(1, greatest(length(lower(text)) - 2, 1)),
             |                  i -> substring(lower(text), i, 3))) AS shingles
             |  FROM documents),
             |ex AS (SELECT doc_id, unnest(shingles) AS sg FROM sh),
             |hs AS (SELECT doc_id, CAST(('0x' || substring(md5(sg), 1, 8)) AS BIGINT) % 2147483647 AS h FROM ex),
             |mk AS (
             |  SELECT doc_id, k,
             |    MIN((((2*k + 1) * 1103515245) % 2147483647 * h + (12345*k + 7)) % 2147483647) AS mh
             |  FROM hs CROSS JOIN (SELECT CAST(unnest(generate_series(0, 31)) AS BIGINT) AS k) keys
             |  GROUP BY doc_id, k),
             |bands AS (
             |  SELECT doc_id, k // 4 AS band, string_agg(CAST(mh AS VARCHAR), '-' ORDER BY k) AS sig
             |  FROM mk GROUP BY doc_id, k // 4),
             |cand AS (
             |  SELECT DISTINCT a.doc_id AS doc_id1, b.doc_id AS doc_id2
             |  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
             |j AS (
             |  SELECT c.doc_id1, c.doc_id2,
             |    CAST(len(list_intersect(s1.shingles, s2.shingles)) AS DOUBLE)
             |      / (len(s1.shingles) + len(s2.shingles) - len(list_intersect(s1.shingles, s2.shingles))) AS jac
             |  FROM cand c
             |  JOIN sh s1 ON s1.doc_id = c.doc_id1
             |  JOIN sh s2 ON s2.doc_id = c.doc_id2)
             |SELECT doc_id1, doc_id2, ROUND(jac, 4) AS jac
             |FROM j WHERE jac >= 0.5 ORDER BY doc_id1, doc_id2""".stripMargin),
    ),

    // ----- SimHash (32-bit, token-frequency weighted) near-dup pairs -----
    Q(
      "t32_simhash",
      (s, d) => {
        // Per-row simhash: one md5 per token, then a 32-bit majority fold —
        // all inside codegen, no explode/shuffle for signature computation.
        val simhash = Tables.documents(s, d)
          .withColumn("hs", expr(
            "transform(regexp_extract_all(lower(text), '\\\\S+', 0), t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))"))
          .filter(size(col("hs")) > 0)
          .withColumn("sh", expr(
            """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) ->
              |  acc + IF(aggregate(hs, CAST(0 AS BIGINT), (a, h) ->
              |             a + IF((h div shiftleft(CAST(1 AS BIGINT), j)) % 2 = 1, 1, -1)) > 0,
              |           shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))""".stripMargin))
          .select(col("doc_id"), col("sh"))
        val a = simhash.select(col("doc_id").as("doc_id1"), col("sh").as("sh1"))
        val b = simhash.select(col("doc_id").as("doc_id2"), col("sh").as("sh2"))
        a.join(b, col("doc_id1") < col("doc_id2"))
          .withColumn("ham", expr("CAST(bit_count(sh1 ^ sh2) AS BIGINT)"))
          .filter(col("ham") <= 6)
          .select(col("doc_id1"), col("doc_id2"), col("ham"))
          .orderBy("doc_id1", "doc_id2")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
             |  FROM documents),
             |hs AS (SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) AS h FROM toks),
             |bits AS (
             |  SELECT doc_id, j,
             |    SUM(CASE WHEN (h // (CAST(1 AS BIGINT) << CAST(j AS INT))) % 2 = 1 THEN 1 ELSE -1 END) AS v
             |  FROM hs CROSS JOIN (SELECT CAST(unnest(generate_series(0, 31)) AS BIGINT) AS j) js
             |  GROUP BY doc_id, j),
             |simhash AS (
             |  SELECT doc_id,
             |    CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS sh
             |  FROM bits GROUP BY doc_id)
             |SELECT a.doc_id AS doc_id1, b.doc_id AS doc_id2,
             |  CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS ham
             |FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.sh, b.sh)) <= 6
             |ORDER BY doc_id1, doc_id2""".stripMargin),
    ),

    // ----- brute-force ANN: top-5 cosine neighbors per query vector -----
    Q(
      "t33_ann_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        val n = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
        val w = Window.partitionBy(col("query_id")).orderBy(col("sim_raw").desc, col("neighbor_id"))
        q.join(n, col("query_id") =!= col("neighbor_id"))
          .withColumn("sim_raw", cosine(col("qe"), col("ne")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("neighbor_id"), round(col("sim_raw"), 4).as("sim"))
          .orderBy("query_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
             |sims AS (
             |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             |    list_sum(list_transform(generate_series(1, len(q.emb)), i -> q.emb[i] * n.emb[i]))
             |      / (sqrt(list_sum(list_transform(q.emb, x -> x*x)))
             |         * sqrt(list_sum(list_transform(n.emb, x -> x*x)))) AS sim_raw
             |  FROM e q JOIN e n ON q.vec_id < 20 AND q.vec_id <> n.vec_id),
             |ranked AS (
             |  SELECT query_id, neighbor_id, sim_raw,
             |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id) AS rank
             |  FROM sims)
             |SELECT query_id, rank, neighbor_id, ROUND(sim_raw, 4) AS sim
             |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    ),
  )
}
