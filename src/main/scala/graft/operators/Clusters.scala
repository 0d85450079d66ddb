package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the clustering step that
  * turns near-duplicate PAIRS (MinHash/SimHash/embedding miners) into
  * duplicate GROUPS, from which a pipeline keeps one canonical document
  * per group.
  *
  * Algorithm: iterative min-label propagation (the Pregel formulation
  * GraphX's connectedComponents uses): every node starts labeled with
  * its own id; each round, a node adopts the minimum label among itself
  * and its neighbors; fixpoint = every node labeled with its
  * component's minimum id. Rounds needed = graph diameter — near-dup
  * graphs are unions of near-cliques (all pairs in a bucket mine
  * against each other), so the diameter is small in practice. When
  * propagation has NOT converged within `propagationRounds` (an
  * adversarially long chain), the loop hands the edge list to the
  * alternating large-star/small-star algorithm of Kiveris et al.
  * ("Connected Components in MapReduce and Beyond", SoCC'14), which
  * contracts any graph to min-rooted stars in O(log² n) worst-case
  * (O(log n) observed) rounds with the same per-round join shape.
  *
  * Scale design per round: one equi-join (labels keyed by node id, the
  * edge list keyed by endpoint) + one min-aggregate — both shuffle on
  * the node-id key, no all-pairs anything. The edge list and each
  * round's labels are materialized (Materialize.once policy) so the
  * loop re-reads stored blocks instead of replaying the pair miner's
  * lineage every iteration; the convergence probe is a count over the
  * (pre-aggregated, ≤ |nodes|-row) changed-label set, never a collect.
  */
object Clusters {

  /** Component labels for every node appearing in `pairs`: returns
    * (id, cluster) where cluster = the minimum node id reachable from
    * `id`. Nodes absent from `pairs` (singletons) are not returned —
    * callers union them back with cluster = own id.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50,
                          propagationRounds: Int = 8): DataFrame = {
    // symmetric edge list: propagation must flow both directions. The
    // two directions come from ONE explode over each pair row — a
    // two-branch union would embed the (possibly expensive) pair
    // miner's lineage twice, and Spark does not reuse identical
    // subtrees within a job.
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .transform(graft.runtime.Materialize.once)
    // initialization fused with the first propagation round: a node's
    // round-1 label is min(self, neighbors), which one aggregate over
    // the edge list yields directly — saves a full shuffle+probe round
    var labels = edges.groupBy(col("src"))
      .agg(min(col("dst")).as("mindst"))
      .select(col("src").as("id"),
        least(col("src"), col("mindst")).as("label"))
      .transform(graft.runtime.Materialize.once)
    var converged = false
    var i = 0
    while (!converged && i < math.min(propagationRounds, maxIter)) {
      val fromNeighbors = edges.join(labels, edges("dst") === labels("id"))
        .select(edges("src").as("id"), col("label"))
      // the node's own previous label rides through the SAME aggregate
      // (min over the tagged self-branch), so the convergence probe
      // needs no join back against the old labels — one shuffle and one
      // count action per round, full stop
      val next = labels.withColumn("own", lit(true))
        .unionByName(fromNeighbors.withColumn("own", lit(false)))
        .groupBy(col("id"))
        .agg(min(col("label")).as("label"),
          min(when(col("own"), col("label"))).as("prev"))
        .transform(graft.runtime.Materialize.once)
      val changed = next.filter(col("label") =!= col("prev")).count()
      converged = changed == 0L
      if (converged) {
        // zero changes ⇒ `next`'s (id, label) set equals `labels`'s, so
        // keep the already-materialized previous generation and free the
        // redundant new one
        graft.runtime.Materialize.free(next)
      } else {
        // free the previous round's checkpoint blocks now that `next` is
        // materialized: without this, executor storage accumulates one
        // label generation per round until driver GC gets around to it
        graft.runtime.Materialize.free(labels)
        labels = next.select(col("id"), col("label"))
      }
      i += 1
    }
    if (!converged) {
      // the diameter exceeded the propagation budget — this is the
      // adversarial-chain regime where per-round progress is one hop.
      // Hand the (already materialized) edge list to the star
      // algorithm, which contracts chains exponentially per round.
      graft.runtime.Materialize.free(labels)
      labels = starComponents(edges, maxIter - i)
    }
    // the symmetric edge list (the largest frame of the loop) is dead
    // once labels have converged — localCheckpoint truncated the label
    // lineage, so nothing downstream can reference it
    graft.runtime.Materialize.free(edges)
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * SoCC'14, Algorithm 3): repeat
    *
    *  - LARGE-STAR: per node u over the symmetric neighbor list,
    *    m = min(N(u) ∪ {u}); rewire every strictly LARGER neighbor to
    *    m — emits canonical (big, small) edges;
    *  - SMALL-STAR: per node u over its smaller neighbors,
    *    m = min(N(u)) (< u by orientation); rewire u and its other
    *    small neighbors to m.
    *
    * Both operations preserve connectivity and only ever lower the
    * reachable minimum, and their joint fixpoint is a forest of stars
    * whose centers are the component minima. Each round is two
    * groupBy-min aggregates and two equi-joins on node id — the same
    * shuffle shape as one propagation round — but chains contract
    * exponentially instead of one hop per round.
    *
    * `sym` must be the deduplicated symmetric edge list. Returns
    * (id, label) for every node with degree ≥ 1.
    */
  private def starComponents(sym: DataFrame, maxRounds: Int): DataFrame = {
    val nodes = sym.select(col("src").as("id")).distinct()
      .transform(graft.runtime.Materialize.once)
    // canonical (a > b) undirected edge list
    var cur = sym.filter(col("src") > col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .transform(graft.runtime.Materialize.once)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // large-star over the re-symmetrized list
      val nbrs = cur.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(col("b").as("u"), col("a").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      val lmin = nbrs.groupBy(col("u"))
        .agg(min(least(col("v"), col("u"))).as("m"))
      val large = nbrs.join(lmin, Seq("u"))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()
        .transform(graft.runtime.Materialize.once)
      // small-star: edges are canonical (a > b), so grouping by a IS
      // the orient-to-larger map phase and min(b) IS m (< a always)
      val smin = large.groupBy(col("a")).agg(min(col("b")).as("m"))
      val small = large.join(smin, Seq("a"))
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionByName(smin.select(col("a"), col("m").as("b")))
        .distinct()
        .transform(graft.runtime.Materialize.once)
      // fixpoint test: stars are invariant under BOTH maps, so compare
      // across the full alternation. Sets are distinct, so |A| = |B|
      // with A \ B = ∅ proves equality — one anti-join, no collect.
      converged = small.count() == cur.count() &&
        small.except(cur).isEmpty
      graft.runtime.Materialize.free(cur)
      graft.runtime.Materialize.free(large)
      cur = small
      round += 1
    }
    require(converged,
      s"connectedComponents (star phase) did not converge within $maxRounds rounds")
    // fixpoint edges are (child, root) stars with root = component min;
    // roots label themselves
    val labels = cur.select(col("a").as("id"), col("b").as("label"))
      .unionByName(nodes.join(cur.select(col("a").as("id")), Seq("id"),
        "left_anti").select(col("id"), col("id").as("label")))
      .transform(graft.runtime.Materialize.once)
    labels.count() // materialize before freeing the frames it read
    graft.runtime.Materialize.free(cur)
    graft.runtime.Materialize.free(nodes)
    labels
  }

  /** Free the checkpoint blocks behind a frame returned by
    * [[connectedComponents]] once it has been fully consumed. The
    * returned labels are backed by one materialized generation that
    * otherwise lives until the driver GCs the frame.
    */
  def release(labels: DataFrame): Unit = graft.runtime.Materialize.free(labels)


}
