package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.runtime.Materialize

/** Distributed graph analytics with engine-exact integer semantics.
  * (PageRank per Brin & Page 1998; integer mass for partition-order
  * independence — integer addition is associative, float addition is
  * not, so a float rank would differ run to run at high parallelism.)
  */
object Graphs {

  /** Fixed-iteration PageRank over `edges(src, dst)` with integer rank
    * mass: every node starts at `initMass`; each iteration a node
    * keeps `baseMass` plus `damp`% of the floor-div inflow
    * Σ (prev(src) div outdeg(src)) over its in-edges. Dangling-node
    * mass is dropped (the usual simplified formulation). Returns
    * (node, mass) for all nodes.
    *
    * Shape: the degree-weighted edge frame is materialized ONCE and
    * reused by every iteration (out-degree from a partial-aggregated
    * count joined back map-side — the edge list is never re-shuffled
    * or sorted for it); each iteration is one key-partitioned join
    * plus one partial-aggregated shuffle on dst.
    */
  def pagerankInt(edges: DataFrame, iterations: Int,
                  initMass: Long = 1000000L, baseMass: Long = 150000L,
                  damp: Int = 85,
                  broadcastRanks: Option[Boolean] = None,
                  broadcastMaxNodes: Long = 10000000L): DataFrame = {
    require(iterations >= 1 && damp >= 0 && damp <= 100)
    // out-degree via aggregate + (broadcast) join rather than a window
    // over the edge list: the window re-shuffled and SORTED every edge
    // by src on top of distinct's own exchange; the aggregate is
    // partial-aggregated to |V| rows and joins back map-side when it
    // broadcasts — the edge list crosses the network once, not twice
    // (guide §2.3 "aggregate before you shuffle", §2.4)
    val eDist = edges.select(col("src"), col("dst"))
      .distinct()
      .transform(Materialize.once)
    val nodes = eDist.select(col("src").as("node"))
      .union(eDist.select(col("dst")))
      .distinct()
      .transform(Materialize.once)
    // rank/contribution frames are one row per NODE — tiny next to the
    // edge list in the usual |V| ≪ |E| regime, so broadcasting them
    // turns every per-iteration join map-side and leaves only the
    // partial-aggregated inflow shuffle. The choice is sized from the
    // ACTUAL node count (one count over the already-materialized node
    // frame — negligible next to even a single iteration) rather than
    // left to the caller: a rank vector beyond `broadcastMaxNodes`
    // (default 10M rows ≈ low hundreds of MB broadcast) falls back to
    // key-partitioned shuffle joins automatically. `broadcastRanks`
    // remains as an explicit override for either direction.
    val useBroadcast = broadcastRanks.getOrElse(
      nodes.count() <= broadcastMaxNodes)
    def side(df: DataFrame): DataFrame =
      if (useBroadcast) broadcast(df) else df
    val deg = eDist.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val ew = eDist.join(side(deg), Seq("src"))
      .transform(Materialize.once)
    var ranks = nodes.withColumn("mass", lit(initMass))
    for (_ <- 1 to iterations) {
      val contrib = ew.join(side(ranks), ranks("node") === ew("src"))
        .select(col("dst"), expr("mass div d").as("out"))
        .groupBy(col("dst")).agg(sum(col("out")).as("inc"))
      ranks = nodes.join(side(contrib), nodes("node") === contrib("dst"), "left")
        .select(nodes("node"),
          (lit(baseMass) +
            expr(s"($damp * coalesce(inc, CAST(0 AS BIGINT))) div 100"))
            .as("mass"))
    }
    ranks
  }

  /** In-memory reference of [[pagerankInt]] for property tests — same
    * integer semantics, sequential evaluation.
    */
  def pagerankRef(edges: Seq[(Long, Long)], iterations: Int,
                  initMass: Long = 1000000L, baseMass: Long = 150000L,
                  damp: Int = 85): Map[Long, Long] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = es.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var mass = nodes.map(_ -> initMass).toMap
    for (_ <- 1 to iterations) {
      val inflow = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (s, _) => mass(s) / outdeg(s) }.sum
      }
      mass = nodes.map(n =>
        n -> (baseMass + damp * inflow.getOrElse(n, 0L) / 100)).toMap
    }
    mass
  }
}

/** Slowly-changing-dimension type-2 builds: collapse a keyed, ordered
  * change stream into attribute versions with validity intervals.
  */
object Scd2 {

  /** One row per attribute VERSION per key: a new version opens only
    * when `attr` changes (ordered by `ts, tiebreak` within `key`);
    * [valid_from, valid_to) comes from lead(), the open version has
    * valid_to null / is_current 1. One shuffle on the key, two window
    * passes, no self-join.
    */
  def fromEvents(df: DataFrame, key: Column, ts: Column, attr: Column,
                 tiebreak: Column): DataFrame = {
    val byKey = Window.partitionBy(key).orderBy(ts, tiebreak)
    // internal working columns use a reserved prefix so an input frame
    // whose own columns are named "version"/"valid_to" can't be
    // clobbered mid-computation
    df.withColumn("__scd2_prev", lag(attr, 1).over(byKey))
      .filter(col("__scd2_prev").isNull || col("__scd2_prev") =!= attr)
      .withColumn("__scd2_version", row_number().over(byKey))
      .withColumn("__scd2_valid_to", lead(ts, 1).over(byKey))
      .select(
        key, col("__scd2_version").as("version"), attr.as("attr"),
        ts.as("valid_from"), col("__scd2_valid_to").as("valid_to"),
        col("__scd2_valid_to").isNull.cast("int").as("is_current"))
  }
}
