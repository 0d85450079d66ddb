package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event stream: how many users
  * completed stage 1, then stage 2 STRICTLY AFTER their first stage-1
  * completion, and so on — the classic conversion-funnel operator of
  * event-analytics engines.
  *
  * Scale design: no arrays, no per-user collect, no window over the
  * whole stream. Each stage is `filter → partial-agg min(ts) → join on
  * user`, so every shuffle carries one (user, ts) row per qualifying
  * user, and the event scan is filtered to one stage's type before
  * anything aggregates. Stage frames are localCheckpoint'd: each is
  * referenced by both the next stage AND its own count, and the final
  * union would otherwise re-execute stage 1's lineage once per stage.
  */
object Funnel {

  /** Per-stage reach counts for a strictly-ordered funnel. Output:
    * (stage_idx 1-based, stage, n_users), one row per stage.
    */
  def strictFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      "funnel stages must be distinct (repeat-stage funnels need ordinal semantics this operator does not define)")
    def firstAt(df: DataFrame): DataFrame =
      df.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        .transform(graft.runtime.Materialize.once)
    val reached = stages.tail.scanLeft(
      firstAt(events.filter(col(typeCol) === stages.head))) { (prev, s) =>
      firstAt(
        events.filter(col(typeCol) === s)
          .join(prev.select(col(userCol), col("__t").as("__t_prev")), Seq(userCol))
          .filter(col(tsCol) > col("__t_prev")))
    }
    stages.zip(reached).zipWithIndex.map { case ((s, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(s).as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
  }
}
