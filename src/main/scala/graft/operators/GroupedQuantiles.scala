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

    // assemble: interpolate each quantile from its lo/hi order statistics
    val spec = totals
      .withColumn("q", explode(qArr))
      .withColumn("pos", col("q") * (col("n") - 1))
      .withColumn("lo_rank", floor(col("pos")).cast("long"))
      .withColumn("hi_rank", ceil(col("pos")).cast("long"))
    val loV = picked.select(col("g"), col("rank").as("lo_rank"), col("v").as("v_lo"))
    val hiV = picked.select(col("g"), col("rank").as("hi_rank"), col("v").as("v_hi"))
    val interp = spec
      .join(loV, Seq("g", "lo_rank"))
      .join(hiV, Seq("g", "hi_rank"))
      .withColumn("qv",
        when(col("lo_rank") === col("hi_rank"), col("v_lo"))
          .otherwise(col("v_lo") * (col("hi_rank") - col("pos"))
            + col("v_hi") * (col("pos") - col("lo_rank"))))
    val qCols: Seq[Column] = quantiles.map { q =>
      max(when(col("q") === q, col("qv"))).as(s"p${math.round(q * 100)}")
    }
    val mins = picked.filter(col("rank") === 0L).select(col("g"), col("v").as("lo"))
    val maxs = picked.join(totals, Seq("g"))
      .filter(col("rank") === col("n") - 1)
      .select(col("g"), col("v").as("hi"))
    interp.groupBy(col("g"), col("n"))
      .agg(qCols.head, qCols.tail: _*)
      .join(mins, Seq("g"))
      .join(maxs, Seq("g"))
      .select((col("g").as(groupCol) +: col("n").as("cnt") +:
        quantiles.map(q => col(s"p${math.round(q * 100)}")) :+ col("lo") :+ col("hi")): _*)
  }
}
