package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType, StringType}

/** Fused sketch expressions for the dedup operators.
  *
  * Why custom expressions and not higher-order built-ins: a HOF chain
  * like `transform(seq(0,31), j -> array_min(transform(shingles, s ->
  * xxhash64(j, s))))` evaluates lambdas interpreted (HOFs don't codegen)
  * AND gets inlined by CollapseProject into every downstream use — in
  * the LSH pipeline the 32-slot signature was being recomputed once per
  * band plus once in the generator's pushed-down filter, turning a
  * ~100 ms computation into minutes. Fusing signature + banding into one
  * expression evaluates the loop exactly once per row, in JIT-compiled
  * code, with zero intermediate arrays.
  *
  * Codegen calls the static helpers below (Scala objects emit static
  * forwarders), so generated code stays a one-line call.
  */
object MinHashHelper {
  /** One xxhash64 over the shingle bytes, then `numHashes` derived
    * hash-family members via hashLong(base, slot) — the standard
    * one-pass MinHash; bands fold `rows` consecutive slots with a
    * rolling hashLong combine (seed 42, matching the HOF formulation's
    * shape).
    */
  def compute(shingles: ArrayData, numHashes: Int, numBands: Int): ArrayData = {
    val rows = numHashes / numBands
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      val base = XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(base, j.toLong)
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 42L
      var r = 0
      while (r < rows) {
        acc = XXH64.hashLong(sig(b * rows + r), acc)
        r += 1
      }
      bands(b) = acc
      b += 1
    }
    new GenericArrayData(bands)
  }
}

/** MinHash signature + LSH banding in one pass:
  * array<string> shingles → array<long> of `numBands` band keys.
  */
case class MinHashBands(child: Expression, numHashes: Int, numBands: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(numHashes % numBands == 0, "numHashes must divide into bands")

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHashHelper.compute(input.asInstanceOf[ArrayData], numHashes, numBands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashHelper.compute($c, $numHashes, $numBands)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object HyperplaneHelper {
  /** Multi-table random-hyperplane LSH bucket keys for a float vector:
    * plane component for (table t, bit p, dim i) is ±1 by the low bit
    * of xxhash(t, p, i); each signature bit is the sign of the
    * projected dot product. One fused loop, no plane storage.
    */
  def compute(vec: ArrayData, tables: Int, bits: Int): ArrayData = {
    val n = vec.numElements()
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      val seedT = XXH64.hashInt(t, 42L)
      var key = 0L
      var p = 0
      while (p < bits) {
        val seedTP = XXH64.hashInt(p, seedT)
        var dot = 0.0
        var i = 0
        while (i < n) {
          val sign = if ((XXH64.hashInt(i, seedTP) & 1L) == 1L) 1.0 else -1.0
          dot += vec.getFloat(i) * sign
          i += 1
        }
        key = key * 2 + (if (dot > 0) 1L else 0L)
        p += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
}

/** Hyperplane-LSH bucket keys: array<float> → array<long> (`tables`
  * keys of `bits` sign bits each).
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneHelper.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneHelper.compute($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object SimHashHelper {
  /** 64-bit SimHash: every token's xxhash64 votes ±1 per bit position;
    * the sign of each tally becomes the fingerprint bit.
    */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(
        t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var res = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) res |= (1L << b)
      b += 1
    }
    res
  }
}

object JaccardHelper {
  /** Set Jaccard of two SORTED, DISTINCT string arrays via merge-count —
    * no per-pair hash-set allocation (array_intersect builds one per
    * call, which dominates pairwise verify stages).
    */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n1 && j < n2) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = n1 + n2 - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  /** Intersection size of two SORTED, DISTINCT string arrays — the
    * integer-output sibling of [[compute]] for verify stages whose
    * result schema carries exact counts (union size = n1 + n2 − inter
    * from the already-known array sizes, no second merge).
    */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n1 && j < n2) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }
}

/** Intersection size of two sorted-distinct string arrays (merge-count;
  * `array_intersect` builds a per-call hash set, which dominates
  * pairwise verify stages). Callers must pre-sort
  * (array_sort(array_distinct(...))) — once per document, not per pair.
  */
case class SortedArrayIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_array_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardHelper.intersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardHelper.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Set Jaccard similarity of two sorted-distinct string arrays.
  * Callers must pre-sort (array_sort(array_distinct(...))) — done once
  * per document before the pair join, not once per pair.
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "sorted_array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardHelper.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaccardHelper.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayJaccard =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash fingerprint: array<string> tokens → long. */
case class SimHash64(child: Expression) extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashHelper.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashHelper.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object PackedNgramsHelper {
  /** Sorted distinct byte n-grams packed 8 bits/byte into an int
    * (n ≤ 4). For ASCII text the packing is a bijection from the
    * n-gram string set, so set sizes — and therefore Jaccard values —
    * are EXACTLY those of the string formulation, while each element
    * shrinks from a ~20-byte UTF8String to 4 bytes. In a pair join the
    * gram arrays are copied into every joined row, so element width is
    * the dominant byte-moved cost of the whole verify stage.
    */
  /** Marks a truncated (shorter-than-n) pack for n ≤ 3: full n-grams
    * occupy at most 24 bits, so bit 30 puts truncated packs in a
    * disjoint range for EVERY byte value — a length-2 text can never
    * collide with a full gram that happens to start with low bytes
    * (control characters). n = 4 uses all 32 bits and has no spare bit;
    * there the truncated/full separation relies on the ASCII contract
    * documented on [[PackedNgrams]].
    */
  final val TruncatedTag = 1 << 30

  def compute(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // shorter than n: one truncated gram, exactly like charNgrams'
    // substr clamp — tagged into its own value range (see TruncatedTag)
    if (bytes.length < n) {
      var v = 0
      var j = 0
      while (j < bytes.length) { v = (v << 8) | (bytes(j) & 0xff); j += 1 }
      if (n <= 3) v |= TruncatedTag
      return new GenericArrayData(Array(v))
    }
    val m = bytes.length - n + 1
    val packed = new Array[Int](m)
    var i = 0
    while (i < m) {
      var v = 0
      var j = 0
      while (j < n) { v = (v << 8) | (bytes(i + j) & 0xff); j += 1 }
      packed(i) = v
      i += 1
    }
    java.util.Arrays.sort(packed)
    var distinct = 1
    i = 1
    while (i < m) { if (packed(i) != packed(i - 1)) distinct += 1; i += 1 }
    val out = new Array[Int](distinct)
    out(0) = packed(0)
    var k = 1
    i = 1
    while (i < m) {
      if (packed(i) != packed(i - 1)) { out(k) = packed(i); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Merge-count Jaccard over two sorted distinct int arrays. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val n1 = a.numElements()
    val n2 = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < n1 && j < n2) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = n1 + n2 - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}

/** string → sorted distinct array<int> of BYTE n-grams (n ≤ 4).
  *
  * CONTRACT: pack values are bijective with the byte n-gram set for all
  * inputs (truncated short-text packs live in a tagged disjoint range
  * for n ≤ 3). Equality with the CHARACTER n-gram set — what a
  * `substr`-based oracle computes — additionally requires single-byte
  * characters, i.e. ASCII text: multi-byte UTF-8 makes byte grams and
  * char grams structurally different sets, silently changing Jaccard
  * values relative to a char-gram oracle. Validate or pre-filter the
  * corpus to ASCII where oracle parity matters (the bundled testdata
  * is ASCII).
  */
case class PackedNgrams(child: Expression, n: Int) extends UnaryExpression
  with ImplicitCastInputTypes {
  require(n >= 1 && n <= 4, "packed n-grams support n in [1,4]")
  override def inputTypes = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "packed_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    PackedNgramsHelper.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PackedNgramsHelper.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PackedNgrams =
    copy(child = newChild)
}

/** Jaccard of two sorted-distinct int arrays (see PackedNgramsHelper). */
case class SortedIntArrayJaccard(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes =
    Seq(ArrayType(IntegerType), ArrayType(IntegerType))
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "sorted_int_array_jaccard"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PackedNgramsHelper.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PackedNgramsHelper.jaccard($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntArrayJaccard =
    copy(left = newLeft, right = newRight)
}

object TokenShinglesHelper {
  /** Sorted distinct word n-gram shingles from a token array, fused
    * (shingle build + distinct + binary-order sort in one pass). Mirrors
    * `array_sort(array_distinct(Dedup.tokenShingles(toks, n)))` exactly,
    * including the clamp: fewer than n tokens yield ONE truncated
    * shingle. Sort order is UTF8String binary order — the order
    * SortedArrayJaccard's merge expects.
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - n + 1, 1)
    val set = new java.util.TreeSet[org.apache.spark.unsafe.types.UTF8String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      var appended = false
      val end = math.min(i + n, len)
      while (j < end) {
        // concat_ws SKIPS null elements entirely (no separator for
        // them); the separator flag must track appended tokens, not
        // position, or null-bearing arrays diverge from the HOF form
        val t = tokens.getUTF8String(j)
        if (t != null) {
          if (appended) sb.append(' ')
          sb.append(t.toString)
          appended = true
        }
        j += 1
      }
      set.add(org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString))
      i += 1
    }
    val out = new Array[AnyRef](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object TokenShinglesAllHelper {
  /** EVERY word n-gram shingle in document order, duplicates kept —
    * the occurrence-counting twin of TokenShinglesHelper (identical
    * clamp and concat_ws null semantics, no dedupe, no sort). Feeds
    * repetition profiling, where the HOF transform(sequence(...)) form
    * evaluates interpreted per row.
    */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var j = i
      var appended = false
      val end = math.min(i + n, len)
      while (j < end) {
        val t = tokens.getUTF8String(j)
        if (t != null) {
          if (appended) sb.append(' ')
          sb.append(t.toString)
          appended = true
        }
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<string> tokens → array<string> of ALL n-gram shingles, in
  * order, duplicates kept.
  */
case class TokenShinglesAll(child: Expression, n: Int) extends UnaryExpression
  with ImplicitCastInputTypes {
  require(n >= 1, "shingle size must be positive")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles_all"

  override protected def nullSafeEval(input: Any): Any =
    TokenShinglesAllHelper.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenShinglesAllHelper.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShinglesAll =
    copy(child = newChild)
}

/** array<string> tokens → sorted distinct array<string> n-gram shingles. */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression
  with ImplicitCastInputTypes {
  require(n >= 1, "shingle size must be positive")
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override protected def nullSafeEval(input: Any): Any =
    TokenShinglesHelper.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenShinglesHelper.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}
