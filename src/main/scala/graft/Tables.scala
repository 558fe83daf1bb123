package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md §1).
  *
  * All tables are plain parquet. `events.ts` has shipped in two physical
  * layouts across testdata generations: INT64 TIMESTAMP(NANOS) — which
  * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]) unless
  * `spark.sql.legacy.parquet.nanosAsLong=true`, under which it arrives as a
  * raw ns Long — and plain TIMESTAMP(MICROS), which arrives as TimestampType.
  * [[events]] normalizes both to the same two columns: the raw `ts_ns: Long`
  * (epoch nanoseconds) and a µs proper timestamp `ts_us`. This matches
  * DuckDB's `epoch_ns(ts)` on the oracle side, which returns epoch ns for
  * both TIMESTAMP and TIMESTAMP_NS inputs.
  */
object Tables {

  /** Normalize a `ts` column of any shipped physical layout to epoch-ns
    * Long. TIMESTAMP_NTZ (isAdjustedToUTC=false footers) is interpreted as
    * UTC wall time INDEPENDENT of spark.sql.session.timeZone: the naive
    * value is first shifted into the session zone (convert_timezone) so
    * the session-zoned cast lands on the UTC-interpreted epoch — matching
    * DuckDB's naive-timestamp `epoch_ns(ts)` on the oracle side for any
    * caller session, not just the repo's own UTC-pinned entrypoints. (The
    * round-trip is exact except for wall times falling inside the session
    * zone's DST transition hour; UTC sessions have none.) */
  def tsNs(schema: StructType, tsCol: String = "ts"): Column =
    schema(tsCol).dataType match {
      case LongType         => col(tsCol)                           // nanosAsLong path
      case TimestampType    => unix_micros(col(tsCol)) * lit(1000L) // µs timestamp path
      case TimestampNTZType =>
        unix_micros(
          convert_timezone(lit("UTC"), expr("current_timezone()"), col(tsCol))
            .cast(TimestampType)) * lit(1000L)
      case other => throw new IllegalStateException(
        s"events.$tsCol has unsupported type $other (expected Long ns or Timestamp µs/NTZ)")
    }

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

  /** embeddings with `embedding` normalized to ARRAY<FLOAT> — the type the
    * codegen'd similarity kernels (functions.SimExprs) bind to. Guards the
    * same class of generator drift that hit events.ts in round 8: a future
    * float64 re-generation degrades to one map-side cast instead of
    * breaking every ANN/dedup query. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val raw = table(s, d, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case _: ArrayType =>
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other => throw new IllegalStateException(
        s"embeddings.embedding has unsupported type $other (expected ARRAY<FLOAT>)")
    }
  }

  /** events with `ts_ns: Long` (raw epoch ns) and `ts_us: Timestamp` (µs). */
  def events(s: SparkSession, d: String): DataFrame = {
    // the nanosAsLong legacy flag is flipped ONLY when the footer actually
    // carries the TIMESTAMP(NANOS) physical layout (the read fails without
    // it) — a session reading µs-layout events keeps its conf untouched,
    // so a library caller's unrelated NANOS parquet reads still fail loud
    // the way they expect. Once set it stays set (Spark captures the conf
    // into the scan at planning, so a restore would break THIS read).
    val raw =
      try table(s, d, "events")
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if !java.lang.Boolean.parseBoolean(
              s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")) =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          table(s, d, "events")
      }
    val cols = raw.columns.map {
      case "ts" => tsNs(raw.schema).as("ts_ns")
      case c    => col(c)
    }
    raw.select(cols.toIndexedSeq: _*)
      // FLOOR division ns → µs: `div` truncates toward zero, which rounds
      // a pre-1970 (negative) timestamp UP by 1 µs; post-1970 values are
      // unaffected by the correction term
      .withColumn("ts_us", timestamp_micros(
        expr("(ts_ns div 1000) - (CASE WHEN ts_ns % 1000 < 0 THEN 1 ELSE 0 END)")))
  }
}
