package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic uniform row sampling by bottom-k-of-hash — the t134
  * primitive: hash each row's UNIQUE id (60-bit md5 prefix, the repo's
  * cross-engine-exact idiom) and keep the k rows with the smallest hash.
  * Because the hash is a pure function of the row id, the sample is
  * deterministic (rerun-stable across jobs, partitionings, and days) and
  * MERGEABLE: the bottom-k of a union is the re-cut union of per-part
  * bottom-k's — the property reservoir sampling lacks, and the reason
  * this shape survives both a 1000-executor batch (TakeOrdered:
  * per-partition heaps, no global sort) and an incremental stream
  * (EventStreams.sampleStream folds batches through [[merge]]).
  */
object BottomKSample {

  /** The 60-bit salted md5 prefix of an id column as a non-negative Long —
    * identical arithmetic to DuckDB's
    * `CAST(('0x' || substring(md5(salt || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT)`. */
  def hash60(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** The k rows with the smallest (hash-of-id, value): output (h, c).
    * `value` rides along untouched; ties on a 60-bit hash are broken by
    * the value so the cut is total either way. Executes as TakeOrdered. */
  def sample(df: DataFrame, id: Column, value: Column, k: Int, salt: String): DataFrame =
    df.select(value.as("c"), hash60(id, salt).as("h"))
      .orderBy(col("h"), col("c"))
      .limit(k)

  /** Re-cut the union of two samples at k — associative, commutative, and
    * idempotent, so any batching of the input stream folds to the same
    * sample as one global [[sample]] pass. The (h, c) dedup is what makes
    * a REPLAYED micro-batch a no-op (at-least-once sources): h is unique
    * per row id, so an (h, c) duplicate is the same row arriving twice,
    * never two distinct rows (modulo a 2⁻⁶⁰ collision). Frames here are
    * k-sized — the dedup shuffle is trivial by construction. */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.unionByName(b).dropDuplicates("h", "c").orderBy(col("h"), col("c")).limit(k)
}
