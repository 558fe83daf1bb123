package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvAgg

/** The custom TypedImperativeAggregate must be a true mergeable sketch:
  * identical output under any partitioning (partial/merge path), identical
  * to the sort-based reference formulation (t91's shape), distinct-proof,
  * serde-stable, and reachable from SQL.
  */
class KmvAggSpec extends SparkTestBase {

  import spark.implicits._

  private def hashed = Tables.lineitem(spark, "/root/testdata/sf0.001")
    .select(col("l_returnflag").as("flag"), expr(
      "CAST(conv(substring(md5(CAST(CAST(l_partkey AS STRING) AS BINARY)), 1, 15), 16, 10) AS BIGINT)")
      .as("h"))

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Seq[Long]] =
    df.groupBy(col("flag")).agg(KmvAgg.kmv(col("h"), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

  test("sketch is partitioning-invariant and equals the sort-based reference") {
    val base = sketch(hashed, 64)
    assert(sketch(hashed.repartition(1), 64) == base, "single partition differs")
    assert(sketch(hashed.repartition(37), 64) == base, "37 partitions differ")
    // reference: per-group distinct + ascending sort + take 64
    val ref = hashed.distinct().collect()
      .groupBy(_.getString(0))
      .map { case (f, rows) => f -> rows.map(_.getLong(1)).distinct.sorted.take(64).toSeq }
    assert(base == ref, "aggregate differs from the sort-based formulation")
    base.values.foreach { sk =>
      assert(sk == sk.sorted && sk.distinct == sk, "output must be ascending + distinct")
      assert(sk.length == 64)
    }
  }

  test("duplicates never displace smaller hashes; short groups return everything") {
    val dup = Seq.fill(1000)(("a", 5L)) ++ Seq(("a", 1L), ("a", 9L), ("a", 3L))
    val out = sketch(dup.toDF("flag", "h").repartition(7), 3)
    assert(out("a") == Seq(1L, 3L, 5L), s"got ${out("a")}")
    val short = sketch(Seq(("b", 2L), ("b", 2L), ("b", 8L)).toDF("flag", "h"), 64)
    assert(short("b") == Seq(2L, 8L), "k > distinct count must return the distinct set")
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    val agg = KmvAgg(org.apache.spark.sql.catalyst.expressions.Literal(0L), 8)
    val buf = agg.createAggregationBuffer()
    Seq(42L, -7L, Long.MaxValue, 0L, 42L).foreach { v =>
      val one = agg.createAggregationBuffer(); one.add(v); agg.merge(buf, one)
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
    assert(agg.eval(back).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .toLongArray().toSeq == Seq(-7L, 0L, 42L, Long.MaxValue),
      "ascending distinct content after round-trip")
  }

  test("graft_kmv is callable from SQL and matches the DataFrame API") {
    GraftExtensions.register(spark)
    hashed.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT flag, graft_kmv(h, 64) AS sk FROM kmv_in GROUP BY flag")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(viaSql == sketch(hashed, 64))
  }

  test("misuse fails at analysis time, not at runtime") {
    GraftExtensions.register(spark)
    hashed.createOrReplaceTempView("kmv_in")
    intercept[Exception](spark.sql("SELECT graft_kmv(CAST(h AS STRING), 8) FROM kmv_in").collect())
    intercept[Exception](spark.sql("SELECT graft_kmv(h, h) FROM kmv_in").collect())
  }
}
