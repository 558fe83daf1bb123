package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §1).
  *
  * All tables are plain parquet; `events.ts` is physically INT64 TIMESTAMP(NANOS),
  * which Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]). We read it
  * with `spark.sql.legacy.parquet.nanosAsLong=true` (ts arrives as a raw ns Long)
  * and expose both the raw `ts_ns` and a µs-truncated proper timestamp `ts_us`
  * (`timestamp_micros(ts div 1000)`), which matches DuckDB's `CAST(ts AS
  * TIMESTAMP)` ns→µs truncation on the oracle side.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** events with `ts_ns: Long` (raw) and `ts_us: Timestamp` (µs truncation). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", timestamp_micros(expr("ts_ns div 1000")))
  }
}
