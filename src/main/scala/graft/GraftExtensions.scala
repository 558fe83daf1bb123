package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's codegen'd
  * similarity/dedup expressions as SQL functions, so `spark.sql` users get
  * the same native kernels the DataFrame API exposes through
  * [[graft.functions.ArrayFns]]:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)            // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_simhash64(graft_token_hashes64(text)) FROM docs")
  * }}}
  *
  * For a session that already exists (notebooks, shells), the companion's
  * [[GraftExtensions.register]] injects the same functions at runtime.
  *
  * Arity and literal-argument validation happens at analysis time — a wrong
  * call fails the query plan, not a task at runtime.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator extensions (logical node → physical exec); the
    // runtime path for existing sessions is GraftPlanBridge.addStrategy,
    // which graft.operators.TopK invokes on first use
    ext.injectPlannerStrategy(_ => new graft.plans.TopKPerKeyStrategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal INT argument, got: $other")
  }

  /** A literal ARRAY of STRING — written either as array('a', 'b') (a
    * CreateArray of string literals) or as a pre-folded array literal. */
  private def stringArrayLit(e: Expression, fn: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(elems, _)
        if elems.forall {
          case Literal(_: org.apache.spark.unsafe.types.UTF8String,
            org.apache.spark.sql.types.StringType) => true
          case _ => false
        } =>
      elems.map(_.asInstanceOf[Literal].value
        .asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)
    case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      val elems = arr.toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType)
      // a NULL element would NPE on toString below — surface the same clean
      // analysis-time error the non-literal branch raises
      if (elems.exists(_ == null))
        throw new IllegalArgumentException(
          s"$fn expects a literal ARRAY<STRING> argument with no NULL elements, got: $e")
      elems.map(_.toString).toSeq
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a literal ARRAY<STRING> argument, got: $other")
  }

  private def fixed(name: String, arity: Int)(build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = {
    val builder: FunctionBuilder = { args =>
      require(args.length == arity, s"$name expects $arity argument(s), got ${args.length}")
      build(args)
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)
  }

  /** The SQL function surface (name → codegen'd expression). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    fixed("graft_char_shingle_hashes", 1)(a => CharShingleHashes(a.head)),
    fixed("graft_token_hashes64", 1)(a => TokenHashes64(a.head)),
    fixed("graft_word_ngram_hashes", 2)(a =>
      WordNgramHashes(a.head, intLit(a(1), "graft_word_ngram_hashes"))),
    fixed("graft_intra_dup_counts", 1)(a => IntraDupCounts(a.head)),
    fixed("graft_minhash_sig", 1)(a => MinHashSig(a.head)),
    fixed("graft_simhash64", 1)(a => SimHash64(a.head)),
    fixed("graft_cosine_sim", 2)(a => CosineSim(a.head, a(1))),
    fixed("graft_dot", 2)(a => DotProduct(a.head, a(1))),
    fixed("graft_srp_bucket", 2)(a =>
      SrpBucket(a.head, intLit(a(1), "graft_srp_bucket"))),
    fixed("graft_l2_norm", 1)(a => L2Norm(a.head)),
    fixed("graft_sorted_intersect_count", 2)(a =>
      SortedIntersectCount(a.head, a(1))),
    // threshold is a full INT expression (per-row bands), not a literal
    fixed("graft_editdist_within", 3)(a => EditDistWithin(a.head, a(1), a(2))),
    // aggregate (not scalar): the analyzer wraps an AggregateFunction
    // returned from a builder in AggregateExpression(Complete) itself
    fixed("graft_kmv", 2)(a => KmvAgg(a.head, intLit(a(1), "graft_kmv"))),
    fixed("graft_nfc", 1)(a => NfcNormalize(a.head)),
    fixed("graft_nfkc", 1)(a => NfkcNormalize(a.head)),
    fixed("graft_strip_accents", 1)(a => StripAccents(a.head)),
    fixed("graft_blocklist_hits", 2)(a =>
      BlocklistHits(a.head, stringArrayLit(a(1), "graft_blocklist_hits"))),
    fixed("graft_cdc_chunk_ends", 1)(a => CdcChunkEnds(a.head)),
  )

  /** Runtime injection into an existing session (same surface as the
    * extensions path). Idempotent: re-registering overwrites in place. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
