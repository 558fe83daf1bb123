package graft.operators

import org.apache.spark.{Partitioner, TaskContext}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped quantiles with NO driver-side state and NO per-group
  * single-task sort — the fully distributed fallback behind t41.
  *
  * t41's fast path folds per-(partition, group) counts into rank offsets on
  * the driver — O(parts + groups) entries, ideal for a percentile REPORT
  * over thousands of groups but a fail-fast wall at ~10⁶ groups. This
  * operator runs the same two-pass ordered-selection idea entirely on
  * executors:
  *
  *   1. range-partition by (group, value) + sort within partitions — a
  *      distributed sort; equal keys land in one partition, groups span
  *      CONTIGUOUS partition runs;
  *   2. run-length per-(partition, group) counts (one tuple per run, so the
  *      count table is ≤ parts + groups rows — a DataFrame, never driver
  *      memory) → per-group rank offsets via a window PARTITIONED BY group
  *      ORDERED BY partition id (≤ `parts` rows per window: bounded by the
  *      cluster, not the data, so no skew);
  *   3. the needed order statistics (⌊p⌋/⌈p⌉ per quantile, 0, n−1) join the
  *      offset table to learn which partition holds each rank, and each
  *      partition receives EXACTLY its own lookups through a pid-keyed
  *      `partitionBy` + `zipPartitions` against the sorted data — the
  *      second pass streams each partition once, counting in-group
  *      positions, and emits only matching rows.
  *
  * Interpolation is quantile_cont's v_lo·(⌈p⌉−pos) + v_hi·(pos−⌊p⌋), the
  * same form as t41's driver path, so the two paths agree bit-for-bit.
  *
  * Contract: `groupCol` is cast to string, `valueCol` to double; BOTH must
  * be non-null — a null in either fails loudly per row (quarantine, never
  * guess: a silently dropped null group would make this disagree with
  * groupBy semantics, and a null value has no place in an order
  * statistic). Quantile labels must be distinct at integer-percent
  * granularity (columns are named p<round(q·100)>). Output is one row per
  * group: (groupCol, cnt, p<q·100> per quantile, lo, hi). Intermediates
  * are localCheckpoint'ed (the sorted data once; the count and picked
  * tables, both ≤ a few rows per group, once each); the caller's
  * job-level RDD sweep reclaims them, as for every other checkpointing
  * query in the registry.
  */
object GroupedQuantiles {

  def exact(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      quantiles: Seq[Double],
      parts: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranged = df
      .select(
        when(col(groupCol).isNull,
          raise_error(lit(s"GroupedQuantiles: null in group column `$groupCol`")))
          .otherwise(col(groupCol).cast("string")).as("g"),
        when(col(valueCol).isNull,
          raise_error(lit(s"GroupedQuantiles: null in value column `$valueCol`"))
            .cast("double"))
          .otherwise(col(valueCol).cast("double")).as("v"))
      .as[(String, Double)]
      .repartitionByRange(parts, col("g"), col("v"))
      .sortWithinPartitions("g", "v")
      .localCheckpoint()
    exactRanged(ranged, groupCol, quantiles)
  }

  /** [[exact]] over an ALREADY range-partitioned-by-(g, v),
    * sorted-within-partitions, checkpointed (g, v) dataset — the entry
    * point for callers that have paid for that sort already (t41's
    * past-budget route hands its own frame over instead of re-sorting
    * lineitem a second time on exactly the path chosen for being huge).
    * The partitioning/sort/null-free properties are a CONTRACT here, not
    * re-checked: rank arithmetic silently misselects on unsorted input. */
  private[graft] def exactRanged(
      ranged: org.apache.spark.sql.Dataset[(String, Double)],
      groupCol: String,
      quantiles: Seq[Double]): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0,1]: $quantiles")
    require(quantiles.map(q => math.round(q * 100)).distinct.size == quantiles.size,
      s"quantile labels collide at integer-percent granularity: $quantiles")
    val spark = ranged.sparkSession
    import spark.implicits._

    // pass 1: run-length (pid, g, cnt) — partitions are sorted, so runs
    // are contiguous and the table is ≤ parts + groups rows, distributed
    val pc = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
      var cur: String = null; var cnt = 0L; var first = true
      it.foreach { case (g, _) =>
        if (first) { cur = g; cnt = 1L; first = false }
        else if (g == cur) cnt += 1L
        else { out += ((pid, cur, cnt)); cur = g; cnt = 1L }
      }
      if (!first) out += ((pid, cur, cnt))
      out.iterator
    }.toDF("pid", "g", "cnt").localCheckpoint()

    // per-group rank offsets and totals — windows over ≤ `parts` rows/group
    val byG = Window.partitionBy("g").orderBy("pid")
    val off = pc
      .withColumn("off", coalesce(
        sum("cnt").over(byG.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("cnt").over(Window.partitionBy("g")))
    val totals = off.select(col("g"), col("n")).distinct()

    // needed in-group ranks: quantile ⌊pos⌋/⌈pos⌉ plus the extremes
    val qArr = array(quantiles.map(lit(_)): _*)
    val needs = totals
      .withColumn("pos", explode(transform(qArr, q => q * (col("n") - 1))))
      .select(col("g"), explode(array(
        floor(col("pos")).cast("long"), ceil(col("pos")).cast("long"),
        lit(0L), col("n") - 1)).as("rank"))
      .distinct()

    // locate each rank's partition and its in-group local index there
    val located = needs.join(off, Seq("g"))
      .filter(col("rank") >= col("off") && col("rank") < col("off") + col("cnt"))
      .select(col("pid"), col("g"), col("rank"), (col("rank") - col("off")).as("loc"))

    // deliver lookups to exactly their partition, then one streaming pass.
    // RangePartitioner may produce FEWER partitions than requested (tiny or
    // low-cardinality inputs), so size the pid partitioner off the actual
    // partitioning, not `parts` — zipPartitions requires an exact match.
    val rangedRdd = ranged.rdd
    val pidPart = new Partitioner {
      override def numPartitions: Int = rangedRdd.getNumPartitions
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    val needRdd = located.rdd
      .map(r => (r.getInt(0), (r.getString(1), r.getLong(2), r.getLong(3))))
      .partitionBy(pidPart)
    val picked = rangedRdd.zipPartitions(needRdd) { (dataIt, needIt) =>
      val byGroup = needIt.map(_._2).toArray.groupBy(_._1)
        .map { case (g, arr) => g -> arr.map(t => t._3 -> t._2).toMap } // loc -> rank
      if (byGroup.isEmpty) Iterator.empty
      else {
        var curG: String = null
        var idx = -1L
        dataIt.flatMap { case (g, v) =>
          if (curG == null || g != curG) { curG = g; idx = 0L } else idx += 1L
          byGroup.get(g) match {
            case Some(m) if m.contains(idx) => Iterator.single((g, m(idx), v))
            case _ => Iterator.empty
          }
        }
      }
    }.toDF("g", "rank", "v").localCheckpoint() // ≤ (2·|quantiles| + 2) rows per group

    // assemble: one rank→value map per group, one join (round-14 shuffle
    // diet — the former shape exploded a per-quantile spec and re-joined
    // `picked` FOUR times (lo arm, hi arm, min, max: ~6 exchanges + a
    // grouped max-disambiguation); the map form is one tiny groupBy plus
    // one join, and the interpolation arithmetic below is the identical
    // double expression, so outputs are bit-for-bit unchanged). `picked`
    // has one row per (g, rank) by construction (needs is distinct), so
    // map_from_entries never sees a duplicate key.
    val pickedMap = picked.groupBy(col("g"))
      .agg(map_from_entries(collect_list(struct(col("rank"), col("v")))).as("m"))
    val qCols: Seq[Column] = quantiles.map { q =>
      val pos = lit(q) * (col("n") - 1)
      val loR = floor(pos).cast("long")
      val hiR = ceil(pos).cast("long")
      when(loR === hiR, element_at(col("m"), loR))
        .otherwise(element_at(col("m"), loR) * (hiR - pos)
          + element_at(col("m"), hiR) * (pos - loR))
        .as(s"p${math.round(q * 100)}")
    }
    totals.join(pickedMap, Seq("g"))
      .select((col("g").as(groupCol) +: col("n").as("cnt") +: qCols :+
        element_at(col("m"), lit(0L)).as("lo") :+
        element_at(col("m"), col("n") - 1).as("hi")): _*)
  }
}
