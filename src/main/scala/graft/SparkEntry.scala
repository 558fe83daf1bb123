package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Extended, Multimodal, Q, Relational, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2.3 (and the LLM-pipeline
  * extensions) is one entry in [[queries]]; [[oracleSql]] carries the
  * equivalent DuckDB SQL over the same parquet tables, with matching column
  * names/types, total ORDER BY, and deterministic double handling (exact
  * integer-cents sums; see graft.queries.Q).
  */
object SparkEntry {

  /** The full query registry (relational surface + text + similarity + multimodal). */
  val registry: Seq[Q] = Relational.all ++ Extended.all ++ Text.all ++ Similarity.all ++ Multimodal.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way broadcast join + aggregation (SURVEY.md §2.3 Q5). */
  def entry(spark: SparkSession): DataFrame =
    registry.find(_.name == "q05_multiway_join").get.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
