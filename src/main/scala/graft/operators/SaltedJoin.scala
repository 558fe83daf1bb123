package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated distributed equi-join.
  *
  * A shuffled equi-join sends every row of a key to one reducer; a hot key
  * (power-law user, null-ish default, celebrity product) turns that reducer
  * into the straggler that dominates the stage. Salting spreads each key over
  * `salts` sub-keys: the large/skewed side gets a per-row salt, the other
  * side is replicated once per salt value, and the join runs on
  * (key, salt) — the hot key's rows now land on `salts` reducers.
  *
  * Semantics are identical to the unsalted join for `inner` and `left_outer`
  * (each left row carries exactly one salt, so it matches exactly the right
  * replica with that salt, or none). `right_outer`/`full_outer` would see
  * replicated unmatched right rows — rejected.
  *
  * Cost model: replication multiplies the right side by `salts`, so this is
  * for a moderately-sized right side (too big to broadcast, small enough to
  * replicate) or for `salts` sized to the observed skew (AQE's skew-join
  * split is the adaptive version of the same idea; an explicit salt keeps
  * working when a single key exceeds what split-on-size can rebalance, e.g.
  * under a following window/groupBy on the same key).
  *
  * The salt is derived from `monotonically_increasing_id()` — uniform across
  * a partition's rows and constant per row within a job. Which salt a row
  * gets never affects the result (any assignment yields the same join
  * output), so plan-level nondeterminism here is benign.
  */
object SaltedJoin {

  private val SaltCol = "__graft_salt"

  /** @param left     the large / skewed probe side
    * @param right    the side to replicate (`salts`×)
    * @param keys     equi-join key column names present on both sides
    * @param salts    sub-keys per key; size to max observed skew factor
    * @param joinType "inner" (default) or "left_outer"/"left"
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // mirrors AsofJoin's collision check: withColumn would silently replace a
    // user column named like our salt and the final drop() would remove it
    require(
      !left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"input already has a column named $SaltCol; rename it before salting")
    require(
      Set("inner", "left", "left_outer").contains(joinType),
      s"salted join preserves semantics only for inner/left_outer, got $joinType")
    val l = left.withColumn(SaltCol, pmod(hash(monotonically_increasing_id()), lit(salts)))
    val r = right.withColumn(
      SaltCol, explode(array((0 until salts).map(s => lit(s)): _*)))
    // shuffle_hash pins the shuffled-join plan the salt exists for: without
    // it Catalyst may broadcast the replicated side and undo the spread
    l.join(r.hint("shuffle_hash"), keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
