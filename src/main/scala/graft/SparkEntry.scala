package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** Driver contract (see SURVEY.md §7): one `queries` entry per implemented
  * operator from SURVEY §2, each with a DuckDB-equivalent `oracleSql`.
  *
  * Determinism policy: every oracle-checked value is computed in an exact
  * integer domain — epoch-microseconds for time (`events.ts` is read as a
  * long of nanos, equal to DuckDB's `epoch_us(ts)`) and scaled integer
  * cents/e4/e6 for money (scaled so the true decimal value is integral
  * before rounding). Doubles only appear as single divisions of two exact
  * integers, which IEEE-754 evaluates identically in both engines. Every
  * query ends in a total deterministic ORDER BY.
  */
object SparkEntry {
  // ---------------------------------------------------------------------
  // Flagship: 5-table star join with broadcast dims (driver smoke check).
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(round(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 10000d)
          .cast("long")).as("revenue_e4"))
      .orderBy(col("r_name"), col("o_orderpriority"))
  }

  import graft.QuerySupport.Q

  private def registry: Seq[Q] =
    QueriesCore.entries ++ QueriesSpeech.entries ++ QueriesText.entries ++
      QueriesDedup.entries ++ QueriesSim.entries ++ QueriesCuration.entries ++
      QueriesAnalytics.entries ++ QueriesMultimodal.entries ++
      QueriesStreaming.entries

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    // a duplicated name would silently shadow the earlier query in the
    // Map (it happened: two streaming_dedup flavors) — fail loudly
    val names = registry.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    registry.map(q => q.name -> q.fn).toMap
  }

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}

