package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage cost attribution for composite queries — the harness behind
  * SCALE.md's "stage probe" rows (t153's SetSimJoin≈70% attribution, the
  * t57 isolated-arm readings). [[ScaleRehearsal]] times whole registry
  * queries; this times named SUB-PLANS of one query so a wall-clock
  * number can be attributed to the stage that owns it before anyone
  * redesigns the wrong one. Same discipline: warmup pass + interleaved
  * min-of-n, job-group-keyed shuffle/spill attribution.
  *
  * Probes are cumulative prefixes of the query's pipeline, so
  * arm[i+1] − arm[i] isolates one stage's cost. The t121 arms mirror
  * DupSpans/PrefixSum internals for attribution only — the operator
  * remains the single source of semantics (its own spec pins them).
  *
  * Usage: runMain graft.StageProbe <sfDir> <query>   (query: t121)
  */
object StageProbe {

  /** t121 = DupSpans.strip → PrefixSum → pack. Cumulative arms:
    * grams_hash (the ONE corpus-sized tokenize+explode+hash),
    * dup_grams (+ the k-gram hash aggregation),
    * find_spans (+ candidate re-slice joins, exact verify, span merge),
    * strip_full (+ span collect + reassembly join + in-place token drop),
    * t121_full (+ prefix sum + chunk explode + pack agg). */
  private def t121Arms(k: Int = 8): Seq[(String, (SparkSession, String) => DataFrame)] = {
    def toks(s: SparkSession, d: String) =
      Tables.documents(s, d).select(col("doc_id").as("__id"),
        split(col("text"), java.util.regex.Pattern.quote(" ")).as("__t"))
    def sitesH(s: SparkSession, d: String) =
      toks(s, d)
        .filter(size(col("__t")) >= k)
        .select(col("__id"), posexplode(
          transform(sequence(lit(1), size(col("__t")) - (k - 1)),
            p => xxhash64(concat_ws(" ", slice(col("__t"), p, lit(k)))))))
        .select(col("__id"), (col("pos") + 1).cast("long").as("p"), col("col").as("h"))
    Seq(
      "grams_hash" -> ((s, d) => sitesH(s, d)),
      "dup_grams" -> ((s, d) =>
        sitesH(s, d).groupBy(col("h"))
          .agg(countDistinct(col("__id")).as("nd"))
          .filter(col("nd") >= 2).select("h")),
      "find_spans" -> ((s, d) =>
        graft.operators.DupSpans.find(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k)),
      "strip_full" -> ((s, d) =>
        graft.operators.DupSpans.strip(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", k)),
      "t121_full" -> ((s, d) =>
        SparkEntry.queries("t121_dedup_pack")(s, d)),
    )
  }

  /** t57's three certification arms ISOLATED plus both combined
    * schedules — NOT cumulative (each arm is independent; the delta
    * column is meaningless here, read sec/spill per row). */
  private val t57Arms: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "exact_n" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("exact_n"))),
    "exact_p50" -> ((s, d) =>
      graft.operators.GroupedQuantiles.exact(
        Tables.lineitem(s, d).select(lit("all").as("g"), col("l_extendedprice")),
        "g", "l_extendedprice", Seq(0.5), s.sparkContext.defaultParallelism)),
    "sketches" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("est_n"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est"))),
    "combined_conc" -> ((s, d) =>
      graft.operators.SketchCertify.sketchAccuracy(
        Tables.lineitem(s, d), s.sparkContext.defaultParallelism)),
    "combined_seq" -> ((s, d) =>
      graft.operators.SketchCertify.sketchAccuracy(
        Tables.lineitem(s, d), s.sparkContext.defaultParallelism, sequentialArms = true)),
    // pairwise cross-joins to isolate WHICH arm spills when it executes as
    // a broadcast child instead of to a sink
    "pair_n_p50" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("exact_n"))
        .crossJoin(graft.operators.GroupedQuantiles.exact(
          li.select(lit("all").as("g"), col("l_extendedprice")),
          "g", "l_extendedprice", Seq(0.5), s.sparkContext.defaultParallelism))
    }),
    "pair_n_sk" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      li.select(col("l_orderkey")).distinct().agg(count(lit(1)).as("exact_n"))
        .crossJoin(li.agg(
          approx_count_distinct(col("l_orderkey"), 0.01).as("est_n"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est")))
    }),
    "pair_p50_sk" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      graft.operators.GroupedQuantiles.exact(
          li.select(lit("all").as("g"), col("l_extendedprice")),
          "g", "l_extendedprice", Seq(0.5), s.sparkContext.defaultParallelism)
        .crossJoin(li.agg(
          approx_count_distinct(col("l_orderkey"), 0.01).as("est_n"),
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est")))
    }),
    // each arm materialized via eager localCheckpoint ALONE — does the
    // checkpoint execution path itself (no AQE final-stage re-planning)
    // reintroduce the spill the sink path avoids?
    "ckpt_n" -> ((s, d) =>
      Tables.lineitem(s, d).select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("exact_n")).localCheckpoint()),
    "ckpt_p50" -> ((s, d) =>
      graft.operators.GroupedQuantiles.exact(
        Tables.lineitem(s, d).select(lit("all").as("g"), col("l_extendedprice")),
        "g", "l_extendedprice", Seq(0.5), s.sparkContext.defaultParallelism).localCheckpoint()),
    "ckpt_sk" -> ((s, d) =>
      Tables.lineitem(s, d).agg(
        approx_count_distinct(col("l_orderkey"), 0.01).as("est_n"),
        expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est")).localCheckpoint()),
  )

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.StageProbe <sfDir> <query>")
      sys.exit(2)
    }
    val Array(sfDir, query) = args.take(2)
    val arms = query match {
      case "t121" => t121Arms()
      case "t57" => t57Arms
      case other => sys.error(s"no stage probe defined for: $other")
    }
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

    final case class Tot(var shuffle: Long = 0L, var spill: Long = 0L)
    object m extends SparkListener {
      private val stageGroup = new ConcurrentHashMap[Int, String]()
      val byGroup = new ConcurrentHashMap[String, Tot]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val g = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
          .getOrElse("ungrouped")
        js.stageIds.foreach(id => stageGroup.put(id, g))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val tm = sc.stageInfo.taskMetrics
        if (tm != null) {
          val g = Option(stageGroup.get(sc.stageInfo.stageId)).getOrElse("ungrouped")
          val t = byGroup.computeIfAbsent(g, _ => Tot())
          t.synchronized {
            t.shuffle += tm.shuffleWriteMetrics.bytesWritten
            t.spill += tm.memoryBytesSpilled + tm.diskBytesSpilled
          }
          // per-stage forensics: which stage owns the spill (opt-in — one
          // line per stage is too chatty for the summary table)
          if (sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("1")) {
            val sp = tm.memoryBytesSpilled + tm.diskBytesSpilled
            if (sp > 0)
              println(f"[stage] $g stage=${sc.stageInfo.stageId} " +
                f"spillMB=${sp / 1e6}%.1f tasks=${sc.stageInfo.numTasks} " +
                f"name=${sc.stageInfo.name.take(80)}")
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(m)

    val runs = math.max(sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_RUNS", "2").toInt, 1)
    def once(name: String, build: (SparkSession, String) => DataFrame, group: String): Double = {
      spark.sparkContext.setJobGroup(group, group, interruptOnCancel = false)
      val t0 =
        try {
          val t = System.nanoTime()
          build(spark, sfDir).write.format("noop").mode("overwrite").save()
          t
        } finally spark.sparkContext.clearJobGroup()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      dt
    }
    arms.foreach { case (n, b) => once(n, b, s"warmup-$n") }
    val best = scala.collection.mutable.Map.empty[String, Double]
    val bestGroup = scala.collection.mutable.Map.empty[String, String]
    for (run <- 1 to runs; (n, b) <- arms) {
      val group = s"run$run-$n"
      val sec = once(n, b, group)
      if (!best.contains(n) || sec < best(n)) { best(n) = sec; bestGroup(n) = group }
    }
    if (!org.apache.spark.GraftListenerDrain.drain(spark.sparkContext))
      Thread.sleep(1000)
    println(f"${"arm"}%-14s ${"sec"}%8s ${"delta"}%8s ${"shuffleMB"}%10s ${"spillMB"}%8s")
    var prev = 0.0
    arms.foreach { case (n, _) =>
      val sec = best(n)
      val t = Option(m.byGroup.get(bestGroup(n))).getOrElse(Tot())
      val (sh, sp) = t.synchronized((t.shuffle, t.spill))
      println(f"$n%-14s $sec%8.2f ${sec - prev}%8.2f ${sh / 1e6}%10.1f ${sp / 1e6}%8.1f")
      prev = sec
    }
    spark.stop()
  }
}
