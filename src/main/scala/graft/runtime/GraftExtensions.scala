package graft.runtime

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashBands, MortonCode, SimHash64, SortedArrayIntersectCount, SortedArrayJaccard, WinnowFingerprint}

/** SparkSessionExtensions installer exposing graft's native expressions
  * to SQL (`SELECT cosine_sim(a, b) ...`).
  *
  * Usable both programmatically
  * (`SparkSession.builder.withExtensions(new GraftExtensions)`) and via
  * `--conf spark.sql.extensions=graft.runtime.GraftExtensions` on an
  * unmodified Spark distribution — the standard way a library ships
  * engine extensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Wrong arity should read as a clear analysis-time error, not an
    * IndexOutOfBoundsException from the builder lambda.
    */
  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n arguments, got ${args.length}")
    args
  }

  def install(ext: SparkSessionExtensions): Unit = {
    // V2 view wiring for graft catalogs (parser interception + read
    // expansion — Spark 4.1 ships the ViewCatalog interface unwired).
    // GRAFT_NO_VIEWS=1 is the operational kill-switch for the wrapper.
    if (sys.env.get("GRAFT_NO_VIEWS").isEmpty) GraftViewRules.install(ext)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        val a = arity("cosine_sim", 2)(args); CosineSimilarity(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        val a = arity("minhash_bands", 3)(args)
        MinHashBands(a(0), litInt(a(1), "numHashes"), litInt(a(2), "numBands")) }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        val a = arity("simhash64", 1)(args); SimHash64(a(0)) }))
    ext.injectFunction((
      FunctionIdentifier("sorted_array_intersect_count"),
      new ExpressionInfo(classOf[SortedArrayIntersectCount].getName,
        "sorted_array_intersect_count"),
      (args: Seq[Expression]) => {
        val a = arity("sorted_array_intersect_count", 2)(args)
        SortedArrayIntersectCount(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("sorted_array_jaccard"),
      new ExpressionInfo(classOf[SortedArrayJaccard].getName, "sorted_array_jaccard"),
      (args: Seq[Expression]) => {
        val a = arity("sorted_array_jaccard", 2)(args)
        SortedArrayJaccard(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      (args: Seq[Expression]) => {
        val a = arity("winnow_fp", 3)(args)
        WinnowFingerprint(a(0), litInt(a(1), "k"), litInt(a(2), "w")) }))
    ext.injectFunction((
      FunctionIdentifier("morton_code"),
      new ExpressionInfo(classOf[MortonCode].getName, "morton_code"),
      (args: Seq[Expression]) => {
        val a = arity("morton_code", 2)(args); MortonCode(a(0), a(1)) }))
    ext.injectFunction((
      FunctionIdentifier("portable_string_hash"),
      new ExpressionInfo(classOf[graft.functions.PortableStringHash].getName,
        "portable_string_hash"),
      (args: Seq[Expression]) => {
        val a = arity("portable_string_hash", 1)(args)
        graft.functions.PortableStringHash(a(0)) }))
    ext.injectFunction((
      FunctionIdentifier("hashed_linear_score"),
      new ExpressionInfo(classOf[graft.functions.HashedLinearScore].getName,
        "hashed_linear_score"),
      (args: Seq[Expression]) => {
        val a = arity("hashed_linear_score", 1)(args)
        graft.functions.HashedLinearScore(a(0)) }))
    ext.injectFunction((
      FunctionIdentifier("portable_minhash_signature"),
      new ExpressionInfo(
        classOf[graft.functions.PortableMinHashSignature].getName,
        "portable_minhash_signature"),
      (args: Seq[Expression]) => {
        val a = arity("portable_minhash_signature", 2)(args)
        graft.functions.PortableMinHashSignature(
          a(0), litInt(a(1), "numHashes")) }))
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthPrune)
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
    // leaf-level group narrowing for partitioned MERGE/UPDATE/DELETE on
    // catalog tables: a rewrite touching one (year, month) reads and
    // replaces ONE leaf partition, not the whole year
    ext.injectOptimizerRule(_ => graft.sources.GraftCowLeafScope)
    // runtime source-key narrowing for merge-on-read (WriteDelta)
    // positional scans — Spark's own runtime group filtering covers
    // only group-based COW rewrites (r12 item 4)
    ext.injectOptimizerRule(_ => graft.sources.GraftMorRuntimeScope)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
