package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting"):
  * a Rabin–Karp rolling polynomial hash over character k-grams, then the
  * minimum hash of every w-window of consecutive k-gram hashes, distinct
  * and sorted. Guarantees a shared fingerprint for any shared substring
  * of length ≥ k + w − 1 — the classic near-dup/plagiarism sketch.
  *
  * The hash is plain modular arithmetic (base 257, mod 2^31−1) over code
  * points rather than xxhash so the SAME values are computable in ANSI
  * SQL (see TextQueries' oracle) — this expression stays oracle-checkable
  * where the xxhash-based sketches are rows-only.
  */
object WinnowHelper {
  val Mod: Long = 2147483647L // 2^31 − 1 (prime)
  val Base: Long = 257L

  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    // code points, not UTF-16 units: SQL engines' length()/substr()/
    // ascii() are code-point-based, and the oracle must hash the same
    // values for non-BMP text
    val cps = text.toString.codePoints().toArray
    val m = cps.length - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Long])
    var pow = 1L // Base^(k−1) mod Mod
    var i = 0
    while (i < k - 1) { pow = pow * Base % Mod; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      // roll: drop code point i−1's contribution, shift, add i+k−1
      h = ((h - cps(i - 1).toLong * pow % Mod + Mod) % Mod * Base +
        cps(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    val nw = math.max(m - w + 1, 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    var j = 0
    while (j < nw) {
      var mn = Long.MaxValue
      var t = j
      val end = math.min(j + w, m)
      while (t < end) { if (hs(t) < mn) mn = hs(t); t += 1 }
      set.add(mn)
      j += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** string → sorted distinct array<long> of winnowed k-gram hashes. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(k >= 1 && w >= 1, "k and w must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(input: Any): Any =
    WinnowHelper.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowHelper.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object GramHashesHelper {
  /** PortableHash of every char n-gram of the text, by position (no
    * distinct — minhash minimization is idempotent under duplicates),
    * computed with one rolling pass instead of materializing gram
    * strings. Value-identical to PortableHash.hash over each
    * charNgrams element, including the clamp: shorter than n yields
    * one hash of the whole text.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val M = PortableHash.Mod
    val B = PortableHash.Base
    val cps = text.toString.codePoints().toArray
    val m = cps.length - n + 1
    if (m < 1) {
      var h = 0L
      var i = 0
      while (i < cps.length) {
        h = if (i == 0) cps(0).toLong else (h * B + cps(i)) % M
        i += 1
      }
      return new GenericArrayData(Array(h))
    }
    var pow = 1L // B^(n−1) mod M
    var i = 0
    while (i < n - 1) { pow = pow * B % M; i += 1 }
    val out = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < n) { h = if (i == 0) cps(0).toLong else (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    i = 1
    while (i < m) {
      h = ((h - cps(i - 1).toLong * pow % M + M) % M * B + cps(i + n - 1)) % M
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}


/** string → array<long> of PortableHash values of every char n-gram. */
case class GramHashes(child: Expression, n: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1, "gram size must be positive")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashesHelper.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GramHashesHelper.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}
