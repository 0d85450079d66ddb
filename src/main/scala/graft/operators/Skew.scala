package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: manual key salting.
  *
  * When one join key carries a disproportionate share of rows (the
  * classic "US rows are 30% of the fact table" problem), a plain
  * shuffle join puts the whole hot key in one task. Salting splits the
  * hot key's rows across `salt` sub-keys and replicates the matching
  * build-side rows `salt` ways, trading a bounded build-side blowup for
  * even task sizes.
  *
  * Spark's AQE skew-join (spark.sql.adaptive.skewJoin.enabled) handles
  * sort-merge cases automatically at runtime; this manual form remains
  * necessary when the skewed side feeds an aggregation on the same key,
  * or on engines/paths AQE doesn't cover. Salt assignment cycles a
  * per-row ordinal (monotonically_increasing_id), so even IDENTICAL
  * duplicate rows scatter evenly — a content hash would send every
  * copy of a duplicated hot row to one bucket, leaving the skew in
  * place. The ordinal varies with partitioning, which is fine: any
  * salt assignment yields the same join result.
  */
object Skew {

  /** Round-robin salt in [0, salt) that scatters every probe row,
    * duplicates included.
    */
  def saltColumn(salt: Int): org.apache.spark.sql.Column =
    pmod(monotonically_increasing_id(), lit(salt.toLong))

  /** Inner equi-join `probe ⋈ build` on `key`, with the probe side's
    * rows scattered across `salt` sub-keys and the (small) build side
    * replicated once per sub-key. Result equals the unsalted join
    * row-for-row; build-side duplication is salt × |build|, so keep
    * `salt` modest (8–64) and the build side the smaller input.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val saltedProbe = probe.withColumn("__salt", saltColumn(salt))
    val replicatedBuild = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-safe exact COUNT(DISTINCT distinctCol) per `key`, via the
    * two-phase rewrite. Algebraic aggregates (sum/count) survive skew
    * for free — map-side partial aggregation collapses hot keys before
    * the shuffle — but a direct distinct count must ship every row of a
    * hot key to that key's single reduce task. Phase 1 aggregates on
    * the COMPOSITE (key, distinctCol), spreading each hot key across
    * the full shuffle space; phase 2 reduces one pre-collapsed row per
    * distinct value. Returns (key, n_distinct, n_rows).
    */
  def twoPhaseDistinct(df: DataFrame, key: String,
                       distinctCol: String): DataFrame =
    df.groupBy(col(key), col(distinctCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(key))
      // count(distinctCol), not count(*): a NULL distinctCol forms its
      // own phase-1 group, and COUNT(DISTINCT x) semantics exclude it —
      // n_rows still counts every input row including the NULL group's
      .agg(count(col(distinctCol)).as("n_distinct"),
        sum(col("__n")).as("n_rows"))
}
