package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query runtime attribution for the optimization loop: wall seconds
  * split against job count, stage count, task count, summed executor task
  * time, shuffle bytes and spill. Answers the question the bench total
  * cannot: is a 2 s query 2 s of compute, or 40 tiny jobs of scheduling
  * floor? (Guide §1: measure first; §7.1's UI view, but greppable.)
  *
  * Usage: runMain graft.JobProfile <sfDir> [name...]   (default: all)
  * Output: one TSV line per query →
  *   name wall_s jobs stages tasks task_time_s shuf_read_mb shuf_write_mb spill_mb
  */
object JobProfile {

  private val stageDetail = sys.env.get("SPARK_GRAFT_PROFILE_STAGES").contains("1")

  final class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    val spill = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      val info = s.stageInfo
      tasks.addAndGet(info.numTasks)
      shufRead.addAndGet(info.taskMetrics.shuffleReadMetrics.totalBytesRead)
      shufWrite.addAndGet(info.taskMetrics.shuffleWriteMetrics.bytesWritten)
      spill.addAndGet(info.taskMetrics.diskBytesSpilled)
      if (stageDetail) {
        val rt = info.taskMetrics.executorRunTime / 1e3
        val wall = (for { c <- info.completionTime; s <- info.submissionTime }
          yield (c - s) / 1e3).getOrElse(-1.0)
        println(f"  stage ${info.stageId}%4d tasks=${info.numTasks}%4d " +
          f"run=$rt%7.2fs wall=$wall%6.2fs  ${info.name.linesIterator.next()}")
      }
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null) taskTimeMs.addAndGet(t.taskMetrics.executorRunTime)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shufRead.set(0); shufWrite.set(0); spill.set(0)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.registry.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
    ShuffleSizing.configs(sfDir, cpus.toInt).foreach { case (k, v) => builder.config(k, v) }
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.ui.retainedExecutions", "15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    // untimed warmup (parquet footers, codegen, JIT) — same as Bench
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    println("name\twall_s\tjobs\tstages\ttasks\ttask_time_s\tshuf_read_mb\tshuf_write_mb\tspill_mb")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      // warmup pass, then measured pass (min-of-1 after warmup is stable
      // enough for attribution; Bench remains the artifact of record)
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(150) // listener bus is async; let the warmup's events drain
      acc.reset()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      Thread.sleep(150)
      println(f"$n\t$wall%.3f\t${acc.jobs.get}\t${acc.stages.get}\t${acc.tasks.get}\t" +
        f"${acc.taskTimeMs.get / 1e3}%.2f\t${acc.shufRead.get / 1e6}%.1f\t" +
        f"${acc.shufWrite.get / 1e6}%.1f\t${acc.spill.get / 1e6}%.1f")
    }
    spark.stop()
  }
}
