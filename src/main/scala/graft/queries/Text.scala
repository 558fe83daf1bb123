package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table (SURVEY.md §2.3 Q23–Q24
  * plus the LLM-pipeline text ops: language-ID, quality scoring, token
  * counting, fingerprinting, keep-first dedup).
  *
  * All per-row functions are pure codegen'd built-ins (regexp_count, md5,
  * length) — no UDFs — so at 100 TB they run inside whole-stage codegen with
  * full column pruning (only `doc_id`/`text`/`lang` are read from parquet).
  * Aggregations are partial-agg friendly.
  */
object Text {

  // Stopword-hit patterns per language; zh detected by CJK codepoints.
  // \x{...} escapes parse identically in Java regex (Spark) and RE2 (DuckDB).
  private val enPat = "\\b(the|and|of|to|in)\\b"
  private val dePat = "\\b(der|die|das|und|ist)\\b"
  private val esPat = "\\b(el|los|las|es|y)\\b"
  private val frPat = "\\b(le|les|des|est)\\b"
  private val zhPat = "[\\x{4e00}-\\x{9fff}]"

  val all: Seq[Q] = Seq(
    // ----- Q23: per-language corpus stats -----
    Q(
      "q23_text_stats",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"),
            sum(length(col("text")).cast("long")).as("total_len"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  ROUND(CAST(SUM(n_chars) AS DOUBLE)/COUNT(*), 4) AS avg_chars,
             |  CAST(SUM(LENGTH(text)) AS BIGINT) AS total_len
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
    ),

    // ----- Q24: exact duplicate detection via content hash -----
    Q(
      "q24_exact_dedup",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > 1)
          .orderBy("h"),
      Some("""SELECT MD5(text) AS h, COUNT(*) AS cnt
             |FROM documents GROUP BY 1 HAVING COUNT(*) > 1 ORDER BY h""".stripMargin),
    ),

    // ----- exact dedup, keep-first survivor selection -----
    Q(
      "t34_dedup_keepfirst",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(md5(col("text").cast("binary")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("cnt"))
          .orderBy("h"),
      Some("""SELECT MD5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS cnt
             |FROM documents GROUP BY 1 ORDER BY h""".stripMargin),
    ),

    // ----- language-ID heuristic (n-gram/stopword hits), confusion matrix -----
    Q(
      "t26_lang_id",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("en_n", regexp_count(col("text"), lit(enPat)))
          .withColumn("de_n", regexp_count(col("text"), lit(dePat)))
          .withColumn("es_n", regexp_count(col("text"), lit(esPat)))
          .withColumn("fr_n", regexp_count(col("text"), lit(frPat)))
          .withColumn("zh_n", regexp_count(col("text"), lit(zhPat)))
          .withColumn("lang_guess",
            when(col("zh_n") > 0, "zh")
              .when(col("en_n") >= col("de_n") && col("en_n") >= col("es_n") && col("en_n") >= col("fr_n"), "en")
              .when(col("de_n") >= col("es_n") && col("de_n") >= col("fr_n"), "de")
              .when(col("es_n") >= col("fr_n"), "es")
              .otherwise("fr"))
          .groupBy(col("lang"), col("lang_guess"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "lang_guess"),
      Some(s"""WITH t AS (
              |  SELECT lang,
              |    len(regexp_extract_all(text, '$enPat')) AS en_n,
              |    len(regexp_extract_all(text, '$dePat')) AS de_n,
              |    len(regexp_extract_all(text, '$esPat')) AS es_n,
              |    len(regexp_extract_all(text, '$frPat')) AS fr_n,
              |    len(regexp_extract_all(text, '$zhPat')) AS zh_n
              |  FROM documents)
              |SELECT lang,
              |  CASE WHEN zh_n > 0 THEN 'zh'
              |       WHEN en_n >= de_n AND en_n >= es_n AND en_n >= fr_n THEN 'en'
              |       WHEN de_n >= es_n AND de_n >= fr_n THEN 'de'
              |       WHEN es_n >= fr_n THEN 'es'
              |       ELSE 'fr' END AS lang_guess,
              |  COUNT(*) AS n_docs
              |FROM t GROUP BY 1, 2 ORDER BY lang, lang_guess""".stripMargin),
    ),

    // ----- quality scoring (length / punctuation / stopword ratios) -----
    Q(
      "t27_quality_score",
      (s, d) =>
        Tables.documents(s, d)
          .withColumn("n_words", regexp_count(col("text"), lit("[A-Za-z]+")).cast("long"))
          .withColumn("n_punct", regexp_count(col("text"), lit("[.,!?;:]")).cast("long"))
          .withColumn("n_stop", regexp_count(col("text"), lit("\\b(the|a|and|of|to|in)\\b")).cast("long"))
          .select(
            col("doc_id"), col("n_words"), col("n_punct"),
            round(
              least(col("n_words") / 100.0, lit(1.0)) * 0.5
                + (col("n_stop") * 1.0 / greatest(col("n_words"), lit(1L))) * 0.3
                + (lit(1.0) - least(col("n_punct") * 1.0 / greatest(col("n_words"), lit(1L)), lit(1.0))) * 0.2,
              4).as("score"))
          .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
             |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
             |    CAST(len(regexp_extract_all(text, '\b(the|a|and|of|to|in)\b')) AS BIGINT) AS n_stop
             |  FROM documents)
             |SELECT doc_id, n_words, n_punct,
             |  ROUND(LEAST(n_words/100.0, 1.0)*0.5
             |      + (n_stop*1.0/GREATEST(n_words, 1))*0.3
             |      + (1.0 - LEAST(n_punct*1.0/GREATEST(n_words, 1), 1.0))*0.2, 4) AS score
             |FROM t ORDER BY doc_id""".stripMargin),
    ),

    // ----- token counting: whitespace + BPE-ish regex tokenizer -----
    Q(
      "t28_token_count",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            regexp_count(col("text"), lit("\\S+")).cast("long").as("n_ws_tokens"),
            regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long").as("n_bpe_tokens"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),

    // ----- document fingerprint over normalized content -----
    Q(
      "t29_fingerprint",
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).cast("binary")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  MD5(TRIM(regexp_replace(LOWER(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin),
    ),
  )
}
