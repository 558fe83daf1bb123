package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Run-and-free arm scheduling, factored out of [[SketchCertify]] (the t57
  * li100 fix) for every certification query that cross-joins a truth arm
  * with an approximation arm (t57, t92, t108, t150).
  *
  * The failure mode this controls: certification queries build N
  * independent corpus-wide aggregations and join their BOUNDED results.
  * The default plan leaves all arms in ONE job, so their corpus-wide
  * stages run co-resident — on a memory-tight executor the arms contend
  * for the unified pool and spill gigabytes where EACH ARM ISOLATED
  * spills zero (measured at the t57 60M-row rehearsal, SCALE.md). Eagerly
  * materialized internals (e.g. GroupedQuantiles' sorted-corpus
  * checkpoints) make it worse: blocks pinned at BUILD time stay resident
  * through the other arms' aggregations, which is why plain sequential
  * scheduling without freeing changed nothing.
  *
  * `runAndFree(sequential = true)` therefore builds + runs ONE arm at a
  * time and, before the next arm starts, blocking-unpersists every block
  * the arm pinned — snapshotting the persistent-RDD set BEFORE the build,
  * so eager checkpoints are freed too. Each arm gets the isolated probe's
  * memory profile; the output is row-identical to the concurrent plan
  * (ArmSchedulerSpec / SketchCertifySpec).
  *
  * CONTRACT: every arm must aggregate to a bounded frame (certification
  * arms end in one-row aggregates or a ≤(panel×k) top-k) — the collect
  * here is bounded by construction, never corpus-sized.
  */
object ArmScheduler {

  def runAndFree(
      spark: SparkSession,
      arms: Seq[() => DataFrame],
      sequential: Boolean): Seq[DataFrame] =
    if (!sequential) arms.map(_())
    else arms.map { mk =>
      val sc = spark.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val a = mk()
      val rows = a.collect()
      (sc.getPersistentRDDs.keySet -- before)
        .foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = true)))
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), a.schema)
    }
}
