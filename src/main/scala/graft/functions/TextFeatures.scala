package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

object TextFeaturesHelper {
  // Identical regex + limit semantics to Spark's split(trim(text), "\s+"):
  // UTF8String.trim trims ASCII spaces only; StringSplit delegates to
  // Java String.split(regex, -1).
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** One whitespace tokenization per row feeding every token-derived
    * feature of the quality/dedup-prep pipeline. The naive column-per-
    * feature formulation re-splits the text once per feature (and the
    * HOF occurrence counters run interpreted); Catalyst will not CSE
    * interpreted lambdas across projections, so q30 paid ~8 regex
    * splits per row. Fusing into one codegen'd struct-returning
    * expression makes the split cost once-per-operator (codegen
    * subexpression elimination dedupes the shared subtree).
    */
  def compute(text: UTF8String): InternalRow = {
    val trimmed = text.trim().toString
    val toks = Ws.split(trimmed, -1)
    var occThe = 0; var occA = 0; var occAnd = 0; var occOf = 0
    var i = 0
    while (i < toks.length) {
      toks(i) match {
        case "the" => occThe += 1
        case "a"   => occA += 1
        case "and" => occAnd += 1
        case "of"  => occOf += 1
        case _     =>
      }
      i += 1
    }
    // concat_ws(" ", slice(tokens, 1, 2)): first two tokens joined
    val prefix =
      if (toks.length >= 2) toks(0) + " " + toks(1)
      else if (toks.length == 1) toks(0)
      else ""
    new GenericInternalRow(Array[Any](
      toks.length, occThe, occA, occAnd, occOf,
      UTF8String.fromString(prefix)))
  }
}

/** string → struct(n_tokens, occ_the, occ_a, occ_and, occ_of, prefix_key):
  * the whitespace-token features of the quality filter + dedup blocking
  * key, computed in one pass. Semantics byte-identical to
  * split(trim(text), "\s+") + per-word token-filter counts +
  * concat_ws(" ", slice(tokens, 1, 2)).
  */
case class TextFeatures(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = TextFeatures.schema
  override def prettyName: String = "text_features"

  override protected def nullSafeEval(input: Any): Any =
    TextFeaturesHelper.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextFeaturesHelper.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFeatures =
    copy(child = newChild)
}

object TextFeatures {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("occ_the", IntegerType, nullable = false),
    StructField("occ_a", IntegerType, nullable = false),
    StructField("occ_and", IntegerType, nullable = false),
    StructField("occ_of", IntegerType, nullable = false),
    StructField("prefix_key", StringType, nullable = false)))
}
