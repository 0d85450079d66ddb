package graft.streaming

import java.sql.Date
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.TextAnalysis

/** A country's cumulative totals as published by the daily feed. */
case class CumulativeReport(country_region: String, report_date: Date,
                            confirmed: Long, deaths: Long)

/** Day-over-day increments derived from the cumulative stream. */
case class DeltaReport(country_region: String, report_date: Date,
                       new_confirmed: Long, new_deaths: Long)

/** Per-country running state: last processed day + its totals. */
case class RunningTotals(last_date: Date, confirmed: Long, deaths: Long)

/** A document keyed by its content fingerprint (TextAnalysis.fingerprint). */
case class FingerprintedDoc(doc_id: Long, fingerprint: String)

/** First-seen marker for a fingerprint. */
case class SeenState(first_doc_id: Long)

/** Custom-state streaming operators via `KeyValueGroupedDataset
  * .flatMapGroupsWithState` — the pieces of the pipeline whose batch
  * formulation is a full-history window and therefore cannot be an
  * incremental windowed aggregate.
  *
  * Scale design: state is keyed and bounded by construction —
  * [[cumulativeDeltas]] holds ONE small struct per country (~200 keys
  * total, far below one state-store partition), and [[dedupFirstSeen]]
  * holds one marker per fingerprint with an optional processing-time
  * TTL so the store cannot grow without bound on an infinite corpus.
  * Both shuffle once on the group key and then never again.
  */
object Stateful {

  /** Streaming twin of the batch LAG-delta analytic (MartLayer):
    * consumes a stream of per-(country, day) cumulative totals and
    * emits day-over-day increments incrementally, clamped at 0 exactly
    * like the batch `GREATEST(COALESCE(Δ,0),0)` — a country's first
    * observed day emits 0 (no predecessor), matching LAG-over-history
    * on the same data.
    *
    * Within a micro-batch, a country's rows are processed in
    * report_date order; a day at or before the state's last_date
    * arrives too late to difference against and is dropped — the
    * mapGroups analogue of a watermark (the batch path, which re-runs
    * full history, remains the backfill story).
    */
  def cumulativeDeltas(reports: Dataset[CumulativeReport]): Dataset[DeltaReport] = {
    import reports.sparkSession.implicits._
    reports
      .groupByKey(_.country_region)
      .flatMapGroupsWithState[RunningTotals, DeltaReport](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (country: String, rows: Iterator[CumulativeReport],
         state: GroupState[RunningTotals]) =>
          val ordered = rows.toSeq.sortBy(_.report_date.getTime)
          val out = Seq.newBuilder[DeltaReport]
          var st = state.getOption
          ordered.foreach { r =>
            st match {
              case None =>
                out += DeltaReport(country, r.report_date, 0L, 0L)
                st = Some(RunningTotals(r.report_date, r.confirmed, r.deaths))
              case Some(prev) if r.report_date.getTime > prev.last_date.getTime =>
                out += DeltaReport(country, r.report_date,
                  math.max(r.confirmed - prev.confirmed, 0L),
                  math.max(r.deaths - prev.deaths, 0L))
                st = Some(RunningTotals(r.report_date, r.confirmed, r.deaths))
              case _ => // late or duplicate day: drop
            }
          }
          st.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming exact-dedup: emit only the first document seen per
    * fingerprint; subsequent arrivals (same or later micro-batch) are
    * suppressed. Within one batch the smallest doc_id wins, making
    * replays deterministic. With `ttl` set (e.g. "30 minutes"), a
    * fingerprint's marker expires after that much processing time and
    * the next arrival is treated as new — bounded state for unbounded
    * streams; without it, state grows with distinct fingerprints
    * (suitable for finite backfills).
    */
  def dedupFirstSeen(docs: Dataset[FingerprintedDoc],
                     ttl: Option[String] = None): Dataset[FingerprintedDoc] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[SeenState, FingerprintedDoc](
        OutputMode.Update, timeoutConf) {
        (fp: String, rows: Iterator[FingerprintedDoc],
         state: GroupState[SeenState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val fresh = !state.exists
            if (fresh && rows.hasNext) {
              val first = rows.minBy(_.doc_id)
              state.update(SeenState(first.doc_id))
              ttl.foreach(state.setTimeoutDuration)
              Iterator.single(first)
            } else {
              ttl.foreach(state.setTimeoutDuration) // extend the marker's TTL
              Iterator.empty
            }
          }
      }
  }

  /** End-to-end streaming content dedup: raw (doc_id, text) stream →
    * batch-identical sha-256 content fingerprint (TextAnalysis) →
    * [[dedupFirstSeen]]. One shuffle (the fingerprint grouping); the
    * fingerprint itself is a scalar projection on the stream.
    * Defensive contract: malformed ids become null via try_cast (not
    * an ANSI micro-batch abort) and rows with a null id or null text
    * are passed over rather than deduped — null text would otherwise
    * fingerprint to null and collapse every text-less document into
    * one "duplicate" group, silently dropping all but the first.
    */
  def dedupStreamByContent(docs: DataFrame,
                           ttl: Option[String] = None): Dataset[FingerprintedDoc] = {
    import docs.sparkSession.implicits._
    dedupFirstSeen(
      docs.select(
          col("doc_id").try_cast("long").as("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .filter(col("doc_id").isNotNull && col("fingerprint").isNotNull)
        .as[FingerprintedDoc],
      ttl)
  }

  /** Event-time-bounded streaming content dedup: the watermark twin of
    * [[dedupStreamByContent]]. Fingerprints the text exactly like the
    * batch path, then `dropDuplicatesWithinWatermark` on the
    * fingerprint — Spark's state store keeps a marker only until the
    * event-time watermark passes (arrival_ts − `watermark`), so state
    * is bounded by the duplicate-arrival horizon instead of growing
    * with distinct fingerprints forever. This is the production
    * configuration for an unbounded crawl feed where a duplicate, if
    * it arrives at all, arrives within a bounded lateness of the
    * original (the TTL variant bounds by processing time; this one by
    * event time, so replays of historical data evict identically).
    * StateEvictionSpec proves the store's row count actually DROPS
    * once the watermark passes — the difference between "correct at
    * sf0.1" and "alive after a month of uptime".
    */
  def dedupStreamWithinWatermark(docs: DataFrame,
                                 watermark: String = "10 minutes"): DataFrame =
    docs.select(
        col("doc_id").try_cast("long").as("doc_id"),
        col("arrival_ts").cast("timestamp").as("arrival_ts"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .filter(col("doc_id").isNotNull && col("fingerprint").isNotNull)
      .withWatermark("arrival_ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Streaming heavy hitters: the SAME Misra–Gries algebra as the
    * batch aggregator ([[graft.functions.MisraGriesAgg]] — reduce per
    * element, merge per summary) carried as keyed state across
    * micro-batches, so the batch and streaming paths cannot drift.
    * State per key is bounded at k counters forever — the property
    * that makes a frequency sketch safe on an infinite stream — and
    * the emitted summary after any prefix of batches satisfies the
    * same est ≤ true ≤ est + N/(k+1) guarantees over the prefix.
    * Emits (key, summary) each update.
    */
  def streamingHeavyHitters(tokens: Dataset[(String, String)], k: Int)
      : Dataset[(String, Map[String, Long])] = {
    import tokens.sparkSession.implicits._
    val mg = new graft.functions.MisraGriesAgg(k)
    tokens
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, Map[String, Long])](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Map[String, Long]]) =>
          val batchSummary = rows.foldLeft(mg.zero)((b, r) => mg.reduce(b, r._2))
          val merged = mg.merge(state.getOption.getOrElse(mg.zero), batchSummary)
          state.update(merged)
          key -> merged
      }
  }

  /** Streaming distinct-count sketch: the SAME HyperLogLog algebra as
    * the batch aggregator ([[graft.functions.HllAgg]]) carried as
    * keyed state — 64 register ints per key FOREVER, whatever the
    * stream's cardinality, which is what makes a distinct count safe
    * on an infinite stream (exact streaming distinct needs unbounded
    * state). Because register merge is elementwise max (idempotent,
    * commutative, associative), replays and duplicate deliveries
    * cannot corrupt the state, and after any prefix of batches the
    * registers EQUAL the batch aggregator's over the same rows — the
    * spec asserts bit-equality, not tolerance.
    * Emits (key, registers) each update.
    */
  def streamingDistinctSketch(tokens: Dataset[(String, String)])
      : Dataset[(String, Seq[Int])] = {
    import tokens.sparkSession.implicits._
    val hll = new graft.functions.HllAgg
    tokens
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Int], (String, Seq[Int])](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[Array[Int]]) =>
          val batchRegs = rows.foldLeft(hll.zero)((b, r) => hll.reduce(b, r._2))
          val merged = hll.merge(state.getOption.getOrElse(hll.zero), batchRegs)
          state.update(merged)
          key -> merged.toSeq
      }
  }

  /** Alert throttle on the arbitrary-state v2 API
    * ([[org.apache.spark.sql.streaming.StatefulProcessor]] /
    * `transformWithState`, which requires the RocksDB state store):
    * a breach above `threshold` alerts AT MOST once per `cooldownSec`
    * of EVENT time per key — the paging-suppression semantic every
    * alerting pipeline needs so one flapping metric cannot page a
    * hundred times. State per key is ONE long (the last alerted
    * event-time), updated transactionally with the emit, so replayed
    * micro-batches converge. Rows are processed in event-time order
    * within each batch for a deterministic suppression decision; the
    * cooldown is event-time, so a backfilled stream throttles exactly
    * like live traffic.
    */
  def throttledAlerts(breaches: Dataset[Breach], threshold: Double,
                      cooldownSec: Long): Dataset[ThrottledAlert] = {
    import breaches.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    breaches
      .groupByKey(_.key)
      .transformWithState(
        new CooldownThrottle(threshold, cooldownSec),
        TimeMode.None(), OutputMode.Append())
  }
}

/** One over-threshold observation on a keyed metric stream. */
case class Breach(key: String, ts: java.sql.Timestamp, value: Double)

/** A breach that survived the cooldown throttle. */
case class ThrottledAlert(key: String, ts: java.sql.Timestamp, value: Double)

/** The [[Stateful.throttledAlerts]] processor: last-alerted event-time
  * as a single ValueState long per key.
  */
class CooldownThrottle(threshold: Double, cooldownSec: Long)
  extends org.apache.spark.sql.streaming.StatefulProcessor[
    String, Breach, ThrottledAlert] {
  import org.apache.spark.sql.streaming.{TimeMode, TTLConfig, ValueState}

  @transient private var lastAlertUs: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    lastAlertUs = getHandle.getValueState[Long]("lastAlertUs",
      org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[Breach],
                               timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[ThrottledAlert] = {
    // event-time order inside the batch → deterministic suppression
    val ordered = rows.toSeq.sortBy(r => (r.ts.getTime, r.value))
    var last = if (lastAlertUs.exists()) Some(lastAlertUs.get()) else None
    val out = Seq.newBuilder[ThrottledAlert]
    ordered.foreach { r =>
      val us = r.ts.getTime * 1000L
      if (r.value > threshold &&
          last.forall(l => us - l >= cooldownSec * 1000000L)) {
        out += ThrottledAlert(r.key, r.ts, r.value)
        last = Some(us)
        lastAlertUs.update(us)
      }
    }
    out.result().iterator
  }
}
