package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks up the LATEST right
  * row with the same key and `right.ts <= left.ts` — the temporal-join
  * primitive Spark has no native operator for (kdb asof, DuckDB ASOF
  * JOIN, Flink temporal table join).
  *
  * Implementation is the union-scan shape, not a range join: probe and
  * build rows are unioned, and one window per key (ordered by ts, build
  * rows before probes at equal ts so `<=` semantics hold) carries the
  * last non-null build payload forward. ONE shuffle on the key, work
  * linear in |left| + |right| — a backward range join would be
  * O(|left| × matching-window) and an equality-join-then-filter
  * O(|left| × |right per key|). This is the plan that survives a dense
  * build side at 100 TB.
  *
  * Skew note: like any per-key window, one key's probe+build rows land
  * in one task; a pathologically hot key (one user with 10^8 events)
  * needs pre-splitting (e.g. time-sliced sub-keys with boundary
  * carry-in) — not built in here because it changes the carry
  * semantics and the common key spaces (user, instrument, device) are
  * well spread.
  */
object AsOf {

  /** Left as-of join. Payload columns of `right` (everything except key
    * and ts) come back suffixed with `_asof`; left rows with no build
    * row at or before their ts keep nulls. Both inputs need the key
    * column(s) under the same names; `leftTs`/`rightTs` name each
    * side's event-time column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payload =
      right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val leftCols = left.columns.toSeq
    val probeCols = leftCols.filterNot(keys.contains)
    // union frame: probes carry the left columns (build payload nulled),
    // builds carry the payload (left columns nulled); __side orders
    // builds (0) before probes (1) at equal timestamps → `<=` semantics
    val probeSide = left.select(
      (keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        probeCols.map(col) ++
        payload.map(c => lit(null).as(s"__p_$c"))).toIndexedSeq: _*)
    val buildSide = right.select(
      (keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        probeCols.map(c => lit(null).as(c)) ++
        payload.map(c => col(c).as(s"__p_$c"))).toIndexedSeq: _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the build payload as ONE struct, non-null exactly on build
    // rows: carrying columns independently with ignoreNulls would skip a
    // null field of the latest build row and stitch a probe's result
    // from DIFFERENT build rows — a row that never existed. The struct
    // also collapses N window expressions into one.
    val buildRow = when(col("__side") === 0,
      struct(payload.map(c => col(s"__p_$c").as(c)).toIndexedSeq: _*))
    val carried = probeSide.unionByName(buildSide)
      .withColumn("__pay", last(buildRow, ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.map(c => col(s"__pay.$c").as(s"${c}_asof"))).toIndexedSeq: _*)
  }
}
