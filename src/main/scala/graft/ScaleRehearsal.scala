package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Empirical scale rehearsal: run a named query subset ONCE-warm/ONCE-timed
  * against an arbitrary sf dir, recording wall-clock plus the executor-side
  * totals plan-shape audits can't show — shuffle bytes written and
  * memory/disk spill. The SCALE.md "sf1 rehearsal" table is produced by
  * running this at sf0.1 and at the generated 10× corpus
  * (tools/gen_sf1.py) and comparing: a query whose wall-clock exponent
  * log₁₀(t₁/t₀.₁) stays ≲ 1 scales linearly; shuffle bytes growing ≫ 10×
  * or spill appearing at sf1 names the stage that needs attention before
  * 100 TB.
  *
  * Deliberately separate from [[Bench]]: Bench is the driver's
  * fixed-format artifact (min-of-n, DuckDB denominator); this is a
  * diagnostic whose DuckDB arm would be quadratic-cost nonsense at sf1
  * (the all-pairs list-lambda oracles), so it has none.
  *
  * Usage: runMain graft.ScaleRehearsal <sfDir> <name,name,...>
  */
object ScaleRehearsal {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.ScaleRehearsal <sfDir> <name,name,...>")
      sys.exit(2)
    }
    val Array(sfDir, nameCsv) = args.take(2)
    val names = nameCsv.split(',').toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.ui.retainedExecutions", "15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-query stage-metric totals; queries run one at a time so a simple
    // shared accumulator scoped by reset() attributes correctly
    object m extends SparkListener {
      @volatile var shuffleWrite = 0L
      @volatile var memSpill = 0L
      @volatile var diskSpill = 0L
      def reset(): Unit = { shuffleWrite = 0L; memSpill = 0L; diskSpill = 0L }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null) {
          shuffleWrite += tm.shuffleWriteMetrics.bytesWritten
          memSpill += tm.memoryBytesSpilled
          diskSpill += tm.diskBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(m)

    val registry = SparkEntry.registry.filter(q => names.contains(q.name))
    val missing = names.toSet -- registry.map(_.name).toSet
    require(missing.isEmpty, s"unknown queries: $missing")

    // Interleaved min-of-n, same rationale as Bench: this machine is
    // shared and stalls last minutes, so back-to-back repeats of one query
    // all land inside one stall; interleaving lets the min come from a
    // clean pass. Pass 0 is an untimed warmup (codegen, file footers).
    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_RUNS", "2").toInt, 1)
    def once(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    registry.foreach(once)
    case class R(sec: Double, shuffle: Long, spill: Long)
    val best = scala.collection.mutable.Map.empty[String, R]
    for (_ <- 1 to runs; q <- registry) {
      m.reset()
      val sec = once(q)
      // listener bus is async; drain it deterministically before reading
      // the counters so a straggler stage event can't land after reset()
      // and mis-attribute to the next query (shim exposes the private API;
      // falls back to a settle sleep only if the bus wedges)
      if (!org.apache.spark.GraftListenerDrain.drain(spark.sparkContext))
        Thread.sleep(300)
      val r = R(sec, m.shuffleWrite, m.memSpill + m.diskSpill)
      if (!best.contains(q.name) || sec < best(q.name).sec) best(q.name) = r
    }
    println(f"${"query"}%-28s ${"sec"}%8s ${"shuffleMB"}%10s ${"spillMB"}%8s")
    registry.foreach { q =>
      val r = best(q.name)
      println(f"${q.name}%-28s ${r.sec}%8.2f ${r.shuffle / 1e6}%10.1f ${r.spill / 1e6}%8.1f")
    }
    spark.stop()
  }
}
