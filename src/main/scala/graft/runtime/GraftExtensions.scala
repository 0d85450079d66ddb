package graft.runtime

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, MinHashBands, SimHash64, SortedArrayJaccard, WinnowFingerprint}

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

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (args: Seq[Expression]) => MinHashBands(args(0),
        litInt(args(1), "numHashes"), litInt(args(2), "numBands"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("sorted_array_jaccard"),
      new ExpressionInfo(classOf[SortedArrayJaccard].getName, "sorted_array_jaccard"),
      (args: Seq[Expression]) => SortedArrayJaccard(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_fp"),
      new ExpressionInfo(classOf[WinnowFingerprint].getName, "winnow_fp"),
      (args: Seq[Expression]) => WinnowFingerprint(args(0),
        litInt(args(1), "k"), litInt(args(2), "w"))))
    ext.injectOptimizerRule(_ => graft.plans.JaccardLengthPrune)
  }
}
