package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}

/** SQL-portable counterparts of the xxhash-based sketch expressions:
  * every hash step is integer arithmetic a SQL oracle can replay
  * verbatim (Horner base-257 string hash mod 2^31−1, the squared-shift
  * slot family of [[PortableHash]], Horner band folds, parity-of-square
  * hyperplane signs). The xxhash variants stay the production default —
  * these exist so the LSH pipelines (q21, q25) are hash-match checkable
  * END TO END by an independent engine, not just rows-counted.
  *
  * Same fusion rationale as Sketches.scala: one codegen'd pass per row,
  * no interpreted lambdas, no intermediate arrays.
  */
object PortableMinHashHelper {
  import PortableHash.{Base, Mod}

  /** array<string> shingles → `numBands` band keys: slot j holds
    * min over shingles of PortableHash.slot(hash(s), j); band b is the
    * Horner fold (first value as init, then acc·257+v mod M) of its
    * `numHashes/numBands` consecutive slots — exactly DuckDB's
    * `list_reduce(list(mn ORDER BY j), (a,b) -> (a*257+b) % M)`.
    */
  def compute(shingles: ArrayData, numHashes: Int, numBands: Int): ArrayData = {
    val rows = numHashes / numBands
    val n = shingles.numElements()
    val bands = new Array[Long](numBands)
    if (n == 0) {
      // unreachable via TokenShingles (≥1 shingle always); defensive
      // sentinel outside the [0, Mod) hash range so empty never collides
      java.util.Arrays.fill(bands, -1L)
      return new GenericArrayData(bands)
    }
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = PortableHash.hash(shingles.getUTF8String(i).toString)
      var j = 0
      while (j < numHashes) {
        val v = PortableHash.slot(h, j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    var b = 0
    while (b < numBands) {
      var acc = sig(b * rows)
      var r = 1
      while (r < rows) {
        acc = (acc * Base + sig(b * rows + r)) % Mod
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** array<string> shingles → the raw `numHashes`-slot signature
    * (no banding): slot j = min over shingles of
    * PortableHash.slot(hash(s), j) — DuckDB's
    * `min(((hv + j*Shift) % M)² % M) ... GROUP BY doc_id, j`. The
    * per-slot values are what estimator-calibration queries compare
    * (collision fraction ≈ Jaccard); [[compute]] folds these same
    * slots into band keys.
    */
  def signature(shingles: ArrayData, numHashes: Int): ArrayData = {
    val n = shingles.numElements()
    val sig = new Array[Long](numHashes)
    if (n == 0) {
      java.util.Arrays.fill(sig, -1L)
      return new GenericArrayData(sig)
    }
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = PortableHash.hash(shingles.getUTF8String(i).toString)
      var j = 0
      while (j < numHashes) {
        val v = PortableHash.slot(h, j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** array<string> shingles → array<long> raw MinHash slot signature
  * (SQL-portable family, no banding) — see
  * [[PortableMinHashHelper.signature]].
  */
case class PortableMinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    PortableMinHashHelper.signature(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinHashHelper.signature($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashSignature =
    copy(child = newChild)
}

/** array<string> shingles → array<long> of `numBands` SQL-portable
  * LSH band keys (MinHash signature + banding fused, PortableHash
  * family).
  */
case class PortableMinHashBands(child: Expression, numHashes: Int, numBands: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes % numBands == 0, "numHashes must divide into bands")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    PortableMinHashHelper.compute(input.asInstanceOf[ArrayData], numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableMinHashHelper.compute($c, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): PortableMinHashBands =
    copy(child = newChild)
}

/** string → its [[PortableHash]] Horner base-257 hash (mod 2^31−1) —
  * the scalar entry point of the portable family, for queries that
  * need to address a sketch (e.g. q96's Count-Min probe buckets)
  * with the same hash the Aggregator used. The DuckDB replay is the
  * q21 oracle's `list_reduce(... (a,b) -> (a*257+b) % M)` idiom.
  */
case class PortableStringHash(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_string_hash"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash.hash(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): PortableStringHash =
    copy(child = newChild)
}

object PortableSimHashHelper {

  /** 64-bit SimHash over a token array with SQL-portable votes: token
    * vote for bit j is the parity of PortableHash.slot(hash(token), j)
    * (+1 odd, −1 even); bit j of the fingerprint is set when the vote
    * sum is strictly positive. Every occurrence votes (multiset
    * semantics, matching SimHash64).
    */
  def compute(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h = if (t == null) 0L else PortableHash.hash(t.toString)
      var j = 0
      while (j < 64) {
        if ((PortableHash.slot(h, j) & 1L) == 1L) counts(j) += 1
        else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }
}

/** array<string> tokens → SQL-portable 64-bit SimHash fingerprint. */
case class PortableSimHash64(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    PortableSimHashHelper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableSimHashHelper.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash64 =
    copy(child = newChild)
}

object PortableHyperplaneHelper {

  /** Plane component for flat plane index x (= (t·bits + p)·dims + i):
    * +1 when PortableHash.slot(0, x+1) = ((x+1)·Shift)² mod M is odd,
    * −1 otherwise. (x+1)·Shift stays below M for every realistic
    * table/bit/dim product, so the square is the ONLY mod reduction —
    * which is the mixing step: a purely affine map preserves index
    * parity and would make the signs alternate deterministically.
    */
  def planeSign(x: Int): Double =
    if ((PortableHash.slot(0L, x + 1) & 1L) == 1L) 1.0 else -1.0

  /** array<float> vector → `tables` bucket keys; bit p of table t is set
    * (weight 2^(bits−1−p), matching HyperplaneHelper's packing) when the
    * signed projection sum_i planeSign((t·bits+p)·dims+i)·vec(i) is
    * strictly positive. Accumulation is left-to-right in doubles — the
    * order DuckDB's list_reduce replays.
    */
  def compute(vec: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dims = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var p = 0
      while (p < bits) {
        val base = (t * bits + p) * dims
        var dot = 0.0
        var i = 0
        while (i < dims) {
          dot += planeSign(base + i) * vec.getFloat(i)
          i += 1
        }
        if (dot > 0) key |= 1L << (bits - 1 - p)
        p += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** array<float> → array<long> of `tables` SQL-portable hyperplane-LSH
  * bucket keys.
  */
case class PortableHyperplaneBuckets(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "portable_hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    PortableHyperplaneHelper.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PortableHyperplaneHelper.compute($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): PortableHyperplaneBuckets =
    copy(child = newChild)
}
