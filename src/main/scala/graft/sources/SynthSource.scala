package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic document
  * generator (`spark.read.format("graft-synth")`), the smoke-data
  * source a 100 TB pipeline uses to rehearse plans without storage.
  * Exercises the full DSv2 surface a real connector needs:
  *
  *  - `planInputPartitions` splits the id range into `partitions`
  *    independent readers — scan parallelism with no files;
  *  - `SupportsPushDownRequiredColumns`: unreferenced columns are
  *    never generated (the widest column, `text`, costs real CPU);
  *  - `SupportsPushDownFilters`: doc_id range/equality predicates
  *    narrow the GENERATED range — the connector-side analogue of
  *    partition pruning; other predicates are left to Spark as
  *    residuals.
  *
  * Rows are a pure function of doc_id (Lehmer-mix arithmetic), so any
  * (options, pushdown) combination yields bit-identical data across
  * runs, executors, and retries — the property that makes generated
  * smoke data usable in correctness gates.
  */
class SynthSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft-synth"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SynthTable(
      numRows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      buckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(0),
      rowsPerBatch = Option(properties.get("rowsPerBatch")).map(_.toLong)
        .getOrElse(1000L))
}

object SynthSource {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // public so q79's oracle SQL interpolates the SAME constants the
  // generator uses — a drifted copy would silently desync the check
  val Langs: Array[String] = Array("en", "es", "de", "fr")
  val Words: Array[String] = Array("the", "data", "pipeline", "spark",
    "shuffle", "join", "scan", "column", "token", "model")

  def mix(id: Long, salt: Long): Long =
    ((id + salt) * 48271L) % 2147483647L

  def sourceOf(id: Long): String = s"src${mix(id, 1) % 20}"
  def langOf(id: Long): String = Langs((mix(id, 2) % Langs.length).toInt)

  def textOf(id: Long): String = {
    val n = 5 + (mix(id, 3) % 20).toInt
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Words((mix(id, 4 + i) % Words.length).toInt))
      i += 1
    }
    sb.toString
  }
}

private[graft] class SynthTable(numRows: Long, partitions: Int,
                                buckets: Int = 0,
                                rowsPerBatch: Long = 1000L)
  extends Table with SupportsRead {
  override def name(): String = s"graft-synth($numRows)"
  override def schema(): StructType = SynthSource.Schema
  // advertised table layout: bucketed tables declare their transform so
  // DESCRIBE-style introspection matches what the scan reports
  override def partitioning(): Array[Transform] =
    if (buckets > 0)
      Array(org.apache.spark.sql.connector.expressions.Expressions
        .bucket(buckets, "doc_id"))
    else Array.empty
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(numRows, partitions, buckets, rowsPerBatch)
}

private class SynthScanBuilder(numRows: Long, partitions: Int,
                               buckets: Int = 0, rowsPerBatch: Long = 1000L)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters
  with SupportsPushDownAggregates
  with SupportsPushDownLimit with SupportsPushDownTopN {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var required: StructType = SynthSource.Schema
  private var lo: Long = 0L
  private var hi: Long = numRows // exclusive
  private var pushed: Array[Filter] = Array.empty
  private var aggPushed: Option[Aggregation] = None

  /** COUNT(*) / MIN(doc_id) / MAX(doc_id) over the (filter-narrowed)
    * id range are O(1) arithmetic on [lo, hi) — the connector answers
    * them without generating a single row, the DSv2 analogue of
    * metadata-only aggregate answering (parquet footer counts, Iceberg
    * manifest stats). Non-range aggregates are declined and run in
    * Spark as usual.
    */
  private def rangeAggs(agg: Aggregation): Boolean =
    agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => m.column match {
          case f: NamedReference => f.fieldNames.sameElements(Array("doc_id"))
          case _ => false
        }
        case m: Max => m.column match {
          case f: NamedReference => f.fieldNames.sameElements(Array("doc_id"))
          case _ => false
        }
        case _ => false
      }

  private def answerable(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && rangeAggs(agg)

  /** GROUP BY the key the layout is organized by (doc_id — the bucket
    * key of bucketed tables) is ALSO metadata arithmetic: every id in
    * [lo, hi) is its own group, so each group's COUNT(*)/MIN/MAX is a
    * pure function of the id and the connector can emit finished
    * per-group rows with neither row generation (no text/source
    * synthesis) nor any Spark-side aggregation or exchange — the DSv2
    * analogue of a warehouse connector answering partition-grouped
    * aggregates from its manifest. The complete-pushdown contract
    * requires each group to appear in EXACTLY ONE emitted row, which
    * holds for both the contiguous range split and the strided bucket
    * split (each id lives in exactly one partition either way).
    */
  private def groupedAnswerable(agg: Aggregation): Boolean =
    agg.groupByExpressions.length == 1 &&
      (agg.groupByExpressions.head match {
        case f: NamedReference => f.fieldNames.sameElements(Array("doc_id"))
        case _ => false
      }) && rangeAggs(agg)

  // one row per group from one partition — the complete-pushdown contract
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    answerable(agg) || groupedAnswerable(agg)

  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = answerable(agg) || groupedAnswerable(agg)
    if (ok) aggPushed = Some(agg)
    ok
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT k over a deterministic generator is range arithmetic: any k
    * rows satisfy a bare LIMIT, so the id range narrows to its first k
    * ids and the generator never produces a row Spark would discard.
    * Fully pushed (`isPartiallyPushed` = false): Spark drops its own
    * Limit node entirely.
    */
  override def pushLimit(limit: Int): Boolean = {
    if (limit >= 0) hi = math.min(hi, lo + limit)
    limit >= 0
  }
  override def isPartiallyPushed(): Boolean = false

  /** ORDER BY doc_id LIMIT k is answerable from the range: ids
    * generate in order, so ascending top-k is the first k ids —
    * FULLY pushed (the reader emits them in the required order, so
    * Spark may drop its Sort). Descending top-k lives in the LAST k
    * ids: the range still narrows (the scan generates only k rows)
    * but the push is DECLINED, because a full push obliges the source
    * to emit rows in the requested order and the reader is ascending —
    * Spark keeps its (now k-row) sort. Other sort columns decline
    * untouched.
    */
  override def pushTopN(orders: Array[
      org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection}
    val onDocId = limit >= 0 && orders.length == 1 &&
      (orders.head.expression match {
        case f: NamedReference => f.fieldNames.sameElements(Array("doc_id"))
        case _ => false
      })
    if (!onDocId) false
    else if (orders.head.direction == SortDirection.ASCENDING) {
      hi = math.min(hi, lo + limit)
      // full push requires the scan's OUTPUT order to be ascending
      // ids: true for contiguous range partitions (collect
      // concatenates them in index order), false for strided bucket
      // partitions — those narrow the range but keep Spark's sort
      buckets == 0
    } else {
      lo = math.max(lo, hi - limit)
      false
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case EqualTo("doc_id", _: java.lang.Number) => true
      case GreaterThan("doc_id", _: java.lang.Number) => true
      case GreaterThanOrEqual("doc_id", _: java.lang.Number) => true
      case LessThan("doc_id", _: java.lang.Number) => true
      case LessThanOrEqual("doc_id", _: java.lang.Number) => true
      case _ => false
    }
    accepted.foreach {
      case EqualTo(_, v: java.lang.Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case GreaterThan(_, v: java.lang.Number) =>
        lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual(_, v: java.lang.Number) =>
        lo = math.max(lo, v.longValue)
      case LessThan(_, v: java.lang.Number) =>
        hi = math.min(hi, v.longValue)
      case LessThanOrEqual(_, v: java.lang.Number) =>
        hi = math.min(hi, v.longValue + 1)
      case _ =>
    }
    pushed = accepted
    // accepted filters are EXACT on the generated range — no need for
    // Spark to re-evaluate them — but returning them as residuals too
    // is the safe DSv2 default; we return only the true residuals.
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = aggPushed match {
    case Some(agg) if agg.groupByExpressions.isEmpty =>
      new SynthAggScan(lo, hi, agg)
    case Some(agg) =>
      new SynthGroupedAggScan(lo, hi, partitions, buckets, agg)
    case None => new SynthScan(lo, hi, partitions, required, buckets,
      rowsPerBatch)
  }
}

/** Completely-pushed GROUP BY doc_id scan: one finished row per group
  * (id, then the aggregates in pushed order), generated arithmetically
  * in parallel over the same range/bucket split as the row scan — no
  * column synthesis, no Spark-side aggregation.
  */
private class SynthGroupedAggScan(
    lo: Long, hi: Long, partitions: Int, buckets: Int,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
  extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  override def readSchema(): StructType = StructType(
    StructField("doc_id", LongType, nullable = false) +:
      agg.aggregateExpressions.zipWithIndex.map {
        case (_, i) => StructField(s"agg_$i", LongType, nullable = false)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth range=[$lo,$hi) pushedGroupBy=[doc_id] pushedAggregates=[" +
      agg.aggregateExpressions.map(_.toString).mkString(", ") + "]"

  override def planInputPartitions(): Array[InputPartition] = {
    if (buckets > 0)
      return (0 until buckets)
        .map(b => SynthBucket(b, buckets, lo, hi): InputPartition).toArray
    val total = math.max(0L, hi - lo)
    if (total == 0) return Array.empty
    val n = math.max(1L, math.min(partitions.toLong, total)).toInt
    val step = (total + n - 1) / n
    (0 until n).map { i =>
      val s = lo + i * step
      SynthRange(s, math.min(s + step, hi))
    }.filter(r => r.lo < r.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // resolve each aggregate to a per-id generator once, driver-side;
    // the factory ships only a serializable tag array
    val tags: Array[Int] = agg.aggregateExpressions.map {
      case _: CountStar => 0
      case _: Min => 1
      case _: Max => 2
      case other => throw new IllegalStateException(
        s"unanswerable pushed aggregate $other") // groupedAnswerable gates
    }.toArray
    new SynthGroupedAggReaderFactory(tags)
  }
}

private class SynthGroupedAggReaderFactory(tags: Array[Int])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val (first, hi, step) = p match {
      case SynthRange(lo, h) => (lo, h, 1L)
      case SynthBucket(b, n, lo, h) =>
        (lo + (((b - (lo % n).toInt) % n + n) % n).toLong, h, n.toLong)
      case other =>
        throw new IllegalArgumentException(s"unexpected partition $other")
    }
    new PartitionReader[InternalRow] {
      private var id = first - step
      override def next(): Boolean = { id += step; id < hi }
      override def get(): InternalRow = {
        val vals = new Array[Any](tags.length + 1)
        vals(0) = id
        var i = 0
        while (i < tags.length) {
          vals(i + 1) = if (tags(i) == 0) 1L else id // count=1; min=max=id
          i += 1
        }
        InternalRow.fromSeq(scala.collection.immutable.ArraySeq
          .unsafeWrapArray(vals))
      }
      override def close(): Unit = ()
    }
  }
}

/** Metadata-only scan for a completely-pushed global aggregate: one
  * partition, one row, each cell computed from the [lo, hi) range in
  * O(1). Empty ranges yield count 0 and NULL min/max — the same
  * semantics the aggregate would have over zero rows.
  */
private class SynthAggScan(
    lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
  extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate.{CountStar, Max, Min}

  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
      case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synth range=[$lo,$hi) pushedAggregates=[" +
      agg.aggregateExpressions.map(_.toString).mkString(", ") + "]"

  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthRange(lo, hi))

  override def createReaderFactory(): PartitionReaderFactory = {
    // answer the aggregates HERE (driver side, O(1) range arithmetic)
    // and ship only the finished values — the factory must be
    // serializable and must not capture this Scan or the Aggregation
    val empty = hi <= lo
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => math.max(0L, hi - lo)
      case _: Min => if (empty) null else lo
      case _: Max => if (empty) null else hi - 1
      case other => throw new IllegalStateException(
        s"unanswerable pushed aggregate $other") // answerable() gates these
    }.toArray
    new SynthAggReaderFactory(values)
  }
}

private class SynthAggReaderFactory(values: Array[Any])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val f = !emitted; emitted = true; f }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

private[graft] case class SynthRange(lo: Long, hi: Long) extends InputPartition

/** One bucket of a key-grouped scan: the ids in [lo, hi) with
  * id % nBuckets == bucket. `partitionKey` is what lets Spark line
  * partitions up across scans (storage-partitioned join) and satisfy
  * clustered distributions without an exchange.
  */
private[graft] case class SynthBucket(bucket: Int, nBuckets: Int,
                                      lo: Long, hi: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** The row scan, with DSv2 RUNTIME filtering on top of the static
  * pushdown: when this scan sits under a join on doc_id, Spark's
  * dynamic pruning executes the build side first and hands the
  * observed join keys to [[filter]] as an IN-set — the generated
  * range then narrows to [min, max+1) BEFORE planInputPartitions, the
  * DSv2 analogue of dynamic partition pruning (a contiguous superset
  * of the key set is sound: the join itself re-checks membership).
  */
private[graft] class SynthScan(lo: Long, hi: Long, partitions: Int,
                        required: StructType, buckets: Int = 0,
                        rowsPerBatch: Long = 1000L)
  extends Scan with Batch with SupportsRuntimeFiltering
  with SupportsReportPartitioning with SupportsReportStatistics {
  private var rlo = lo
  private var rhi = hi
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Exact statistics from the (filter-narrowed) generated range —
    * what lets Spark auto-broadcast a small synthetic side instead of
    * falling back to `defaultSizeInBytes` (= never broadcast). Width
    * is the PRUNED schema's: a doc_id-only projection reports 8
    * bytes/row however wide the table is — the same contract parquet
    * footer stats give the optimizer.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, rhi - rlo)
    // generated text averages ~60 chars; fixed-width columns by type
    private val width = required.fields.map { f =>
      f.name match {
        case "text" => 60L
        case "source" | "lang" => 8L
        case _ => 8L
      }
    }.sum.max(1L)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * width)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SynthMicroBatchStream(rlo, rhi, partitions, required, rowsPerBatch)
  override def description(): String =
    s"graft-synth range=[$rlo,$rhi) buckets=$buckets " +
      s"cols=${required.fieldNames.mkString(",")}"

  /** Bucketed scans report `bucket(buckets, doc_id)` key grouping —
    * with each [[SynthBucket]] carrying its key, Spark can satisfy a
    * ClusteredDistribution on doc_id (aggregate without an exchange)
    * and storage-partition joins between two compatible scans. The
    * bucket FUNCTION resolves through [[SynthCatalog]]'s
    * FunctionCatalog — plain `format()` reads fall back to unknown
    * partitioning (Spark needs the function to reason about the
    * transform).
    */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    if (buckets > 0)
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(org.apache.spark.sql.connector.expressions.Expressions
          .bucket(buckets, "doc_id")),
        buckets)
    else
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
        partitions)

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))

  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("doc_id", vs) if vs.nonEmpty =>
      val longs = vs.collect {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      if (longs.nonEmpty) {
        rlo = math.max(rlo, longs.min)
        rhi = math.min(rhi, longs.max + 1L)
      }
    case EqualTo("doc_id", v: java.lang.Long) =>
      rlo = math.max(rlo, v.longValue())
      rhi = math.min(rhi, v.longValue() + 1L)
    case _ => () // non-key or unconvertible: the join re-checks anyway
  }

  override def planInputPartitions(): Array[InputPartition] = {
    if (buckets > 0)
      // one partition per bucket, every bucket present even if its
      // narrowed slice is empty — key-grouped execution expects the
      // reported partitioning to match the planned partitions
      return (0 until buckets)
        .map(b => SynthBucket(b, buckets, rlo, rhi): InputPartition)
        .toArray
    val total = math.max(0L, rhi - rlo)
    // clamp in LONG space: total.toInt would wrap past 2^31 rows and
    // silently collapse scan parallelism
    val n = math.max(1L, math.min(partitions.toLong, total)).toInt
    val step = (total + n - 1) / n
    (0 until n).map { i =>
      val s = rlo + i * step
      SynthRange(s, math.min(s + step, rhi))
    }.filter(r => r.lo < r.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)
}

private class SynthReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case SynthRange(lo, hi) => new SynthReader(lo, hi, required)
      case SynthBucket(b, n, lo, hi) =>
        // first id >= lo congruent to b (mod n), then stride n
        val first = lo + (((b - (lo % n).toInt) % n + n) % n).toLong
        new SynthReader(first, hi, required, step = n.toLong)
      case other =>
        throw new IllegalArgumentException(s"unexpected partition $other")
    }
}

private class SynthReader(lo: Long, hi: Long, required: StructType,
                          step: Long = 1L)
  extends PartitionReader[InternalRow] {
  import SynthSource._

  private var id = lo - step
  // per-row memo so n_chars + text in the same projection generate the
  // (expensive) text once, while a pruned scan never generates it
  private var textId = Long.MinValue
  private var textVal: String = _
  private def textFor(i: Long): String = {
    if (textId != i) { textVal = textOf(i); textId = i }
    textVal
  }
  // column generators resolved ONCE per reader, not per row — only the
  // pruned-in columns pay their generation cost
  private val gens: Array[Long => Any] = required.fieldNames.map {
    case "doc_id" => (i: Long) => i
    case "source" => (i: Long) => UTF8String.fromString(sourceOf(i))
    case "lang" => (i: Long) => UTF8String.fromString(langOf(i))
    case "n_chars" => (i: Long) => textFor(i).length.toLong
    case "text" => (i: Long) => UTF8String.fromString(textFor(i))
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def next(): Boolean = { id += step; id < hi }
  override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(id)))
  override def close(): Unit = ()
}

/** Stream offset = the next unemitted doc_id — a pure position in the
  * deterministic id space, so checkpoint restarts replay byte-identical
  * batches.
  */
private[graft] case class SynthOffset(id: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** Micro-batch streaming over the generated id space — the DSv2
  * streaming surface next to the batch scan's pushdown tiers. Offsets
  * are positions in [lo, hi); each trigger admits `rowsPerBatch` ids
  * (admission control via [[SupportsAdmissionControl]], the same
  * mechanism Kafka/rate sources use), the batch's range splits into
  * `partitions` parallel readers, and the stream goes idle once `hi`
  * is reached. Because rows are a pure function of doc_id, a restart
  * from any checkpointed offset regenerates exactly the rows of every
  * uncommitted batch — exactly-once end to end with a transactional
  * sink, no source-side state beyond the offset.
  *
  * Column pruning applies to streaming reads through the same
  * ScanBuilder: a `select(doc_id)` stream never generates text.
  */
private[graft] class SynthMicroBatchStream(
    lo: Long, hi: Long, partitions: Int, required: StructType,
    rowsPerBatch: Long)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = SynthOffset(lo)

  override def deserializeOffset(json: String): Offset =
    SynthOffset(json.toLong)

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(rowsPerBatch)

  /** Spark calls the admission-control variant when implemented; the
    * no-arg form must not be reachable.
    */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SynthOffset].id
    val step = limit match {
      case r: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        r.maxRows()
      case _ => rowsPerBatch
    }
    SynthOffset(math.min(hi, s + math.max(1L, step)))
  }

  override def reportLatestOffset(): Offset = SynthOffset(hi)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SynthOffset].id
    val e = end.asInstanceOf[SynthOffset].id
    val total = math.max(0L, e - s)
    if (total == 0) return Array.empty
    val n = math.max(1L, math.min(partitions.toLong, total)).toInt
    val step = (total + n - 1) / n
    (0 until n).map { i =>
      val p = s + i * step
      SynthRange(p, math.min(p + step, e))
    }.filter(r => r.lo < r.hi).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
