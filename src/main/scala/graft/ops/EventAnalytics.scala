package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Classic event-analytics operators over the events stream — the OLAP
  * surfaces a telemetry/product warehouse runs daily, expressed as
  * chains of keyed aggregates (no per-user sorted scans, no windows):
  * every step is a groupBy/join on the user key, so the whole analysis
  * shuffles on one key and scales with users, not events-per-user.
  */
object EventAnalytics {

  /** ORDERED FUNNEL (signup → view → … conversion): per user,
    * `t_k` = the earliest event time of type `steps(k-1)` STRICTLY
    * AFTER `t_{k-1}` — the standard in-order funnel semantics (a
    * purchase before the view does not convert the view). `t_k` is
    * null as soon as a step is unreached, and `steps_reached` counts
    * the non-null prefix (nulls propagate: `ts > null` is null, so a
    * missing step nulls everything after it).
    *
    * Shape: one filtered aggregate for step 1, then per step one left
    * join + re-aggregate, all keyed on the user — k equi joins total.
    * The join fans out to that step's events per user and collapses
    * immediately; partitioning by user is reused across every stage.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tusCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(userCol),
      col(typeCol).as("__t"), col(tusCol).as("__ts"))
    val first = base.filter(col("__t") === steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (st, i)) =>
        val prevCols = (1 to i).map(j => col(s"t$j"))
        acc.join(base.filter(col("__t") === st), Seq(userCol), "left")
          .groupBy((col(userCol) +: prevCols): _*)
          .agg(min(when(col("__ts") > col(s"t$i"), col("__ts")))
            .as(s"t${i + 1}"))
    }
    full.withColumn("steps_reached",
      steps.indices.map(i => when(col(s"t${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** COHORT RETENTION: cohort = the user's first-activity bucket
    * (`tus div bucketUs` — weekly at 604800e6); one output row per
    * (cohort, offset) with the distinct users active `offset` buckets
    * after their cohort's start. Two aggregates on the user key plus
    * one equi join back — the (user, bucket) distinct collapse runs
    * BEFORE the join, so the join input is bounded by users × buckets,
    * not raw events.
    */
  def retention(events: DataFrame, userCol: String, tusCol: String,
                bucketUs: Long): DataFrame = {
    // `div`, not `/`: Column./ on longs is double division (inexact past
    // 2^53 and a different value domain than the SQL mirror)
    val w = events
      .select(col(userCol),
        expr(s"cast($tusCol as bigint) div ${bucketUs}L").as("w"))
      .distinct()
    val cohorts = w.groupBy(col(userCol)).agg(min(col("w")).as("cohort_w"))
    w.join(cohorts, Seq(userCol))
      .withColumn("week_offset", col("w") - col("cohort_w"))
      .groupBy(col("cohort_w"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
