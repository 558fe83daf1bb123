package graft.cli

import java.io.IOException

import org.apache.spark.sql.SparkSession

import graft.core.{Args, DuplicationException}
import graft.exec.Executor
import graft.plan.Planner

/** CLI with the reference's flag surface and exit-code contract
  * (DistCPPlus.java:307-333): 0 ok, -1 bad args, -2 duplication,
  * -3 remote FS errors, -999 other.
  */
object Main {

  def run(argv: Array[String], spark: SparkSession): Int =
    Args.parse(argv.toSeq) match {
      case Left(msg) =>
        System.err.println(s"graft-copy: $msg")
        -1
      case Right(cfg) =>
        try {
          val plan = Planner.plan(spark, cfg)
          if (cfg.exportOnly) {
            // plan-only surface (op 19): expose planned work, skip execution
            println(s"planned ${plan.sourceFilesForTransfer.length} file copies")
            0
          } else {
            val stats = Executor.execute(spark, plan, cfg)
            println(
              s"COPY=${stats.copied} SKIP=${stats.skipped} FAIL=${stats.failed} " +
                s"DIR=${stats.dirs} BYTESCOPIED=${stats.bytesCopied}")
            if (stats.failed > 0 && !cfg.ignoreFailures) -999 else 0
          }
        } catch {
          case e: DuplicationException =>
            System.err.println(s"graft-copy: ${e.getMessage}")
            -2
          case e: IOException =>
            System.err.println(s"graft-copy: ${e.getMessage}")
            -3
          case e: Throwable =>
            System.err.println(s"graft-copy: ${e.getClass.getName}: ${e.getMessage}")
            -999
        }
    }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-copy")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = run(argv, spark)
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
