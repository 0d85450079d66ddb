package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Hashing-trick linear text scorer (Weinberger et al., ICML'09 — the
  * fastText/VW feature layout): each token hashes into one of D = 1024
  * weight buckets via the SQL-portable squared-shift family
  * (PortableHash.slot(hash(t), 2) % D, the avalanche step the raw
  * Horner hash lacks), and the document score is the sum of its
  * tokens' bucket weights — a linear model evaluated without ever
  * materializing the D-dimensional feature vector.
  *
  * The weight table here is the deterministic stand-in
  * w(b) = (b % 13) − 6 ∈ [−6, 6] (a trained model would broadcast its
  * real weights; the PLUMBING — hash, bucket, multiset sum — is what's
  * under test and what an oracle replays bit-exactly, the same stub
  * discipline as the multimodal decode tier).
  *
  * One codegen'd pass per row inside the scan stage: no explode, no
  * shuffle, no per-row allocation.
  */
object HashedLinearScoreHelper {
  /** Feature-space width (buckets). */
  val D = 1024L
  /** Slot-family member used for bucketing (avalanche over Horner). */
  val Slot = 2

  def weight(bucket: Long): Long = bucket % 13L - 6L

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var score = 0L
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) {
        val b = PortableHash.slot(PortableHash.hash(t.toString), Slot) % D
        score += weight(b)
      }
      i += 1
    }
    score
  }
}

/** array<string> tokens → bigint hashed-linear-model score. */
case class HashedLinearScore(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedLinearScoreHelper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashedLinearScoreHelper.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HashedLinearScore =
    copy(child = newChild)
}
