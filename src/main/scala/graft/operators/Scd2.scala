package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build — the t115 engine,
  * generalized to any (key, tracked-attribute, event-time) frame: collapse
  * each key's attribute stream into one row per maximal run of an equal
  * attribute value, carrying [valid_from, valid_to) bounds (exclusive
  * upper, null while open), a per-key version number, a current-row flag,
  * and the run's event count.
  *
  * Expressed as gaps-and-islands: change flag (lag) → running sum =
  * version id → per-version bounds → lead for the exclusive upper bound.
  * Every window is keyed by the dimension key, so partition size is one
  * key's history — never a global sort; at 100 TB the plan is one
  * exchange on the key and AQE splits hot keys. The streaming twin
  * ([[graft.streaming.EventStreams.scd2Stream]]) emits the same closed
  * rows live from keyed state.
  */
object Scd2 {

  private def q(c: String): Column = col(s"`${c.replace("`", "``")}`")

  /** @param keys      dimension key columns (the entity being versioned)
    * @param attr      the tracked attribute; a change opens a new version
    * @param time      event-time column; supplies the validity bounds
    * @param tieBreak  extra ordering columns making the per-key order total
    */
  def history(
      df: DataFrame,
      keys: Seq[String],
      attr: String,
      time: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    // internal working columns are __-prefixed; user key/tie-break columns
    // keep their names through the projection, so they must not collide
    // with the internals or the emitted history columns. The attr column
    // is renamed into __attr internally (so the __-internals are safe) but
    // re-emitted under its own name next to the history columns — an attr
    // named like one of them would silently yield a duplicate-named output.
    val outNames = Set("ver", "valid_from", "valid_to", "is_current", "n_events")
    val reserved = Set("__attr", "__t", "__chg", "__ver") ++ outNames
    // attr also collides with a KEY name: keys keep their own names in the
    // output and attr is re-emitted under its own name, so attr == key
    // would produce two identically-named output columns just like an
    // attr named `ver` would.
    val clash = (keys ++ tieBreak).filter(reserved) ++
      Seq(attr).filter(a => outNames(a) || keys.contains(a))
    require(clash.isEmpty, s"scd2 key/tieBreak/attr columns collide with output columns: ${clash.mkString(", ")}")
    val keyCols = keys.map(q)
    // ordering refers to the POST-projection names (__t plus the tie-break
    // columns, which keep their own names)
    val order = col("__t") +: tieBreak.map(q)
    val w = Window.partitionBy(keyCols: _*).orderBy(order: _*)
    val vw = Window.partitionBy(keyCols: _*).orderBy(col("__ver"))
    df
      .select((keys.map(k => q(k).as(k)) :+ q(attr).as("__attr") :+ q(time).as("__t"))
        ++ tieBreak.map(c => q(c).as(c)): _*)
      // null-SAFE change test: a non-null→null (or null→non-null)
      // transition must open a new version — `=!=` returns NULL there and
      // would fold a null run into its predecessor, duplicating versions.
      // The explicit first-row test keeps a LEADING null run at version 1
      // (lag's null default would otherwise look like a null→null no-op).
      .withColumn("__chg",
        when(row_number().over(w) === 1 ||
          !(lag(col("__attr"), 1).over(w) <=> col("__attr")), 1L).otherwise(0L))
      .withColumn("__ver",
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols :+ col("__ver") :+ col("__attr"): _*)
      .agg(min(col("__t")).as("valid_from"), count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(vw))
      .withColumn("is_current", col("valid_to").isNull)
      .select(keyCols ++ Seq(col("__ver").as("ver"), col("__attr").as(attr), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events")): _*)
  }
}
