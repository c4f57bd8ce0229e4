package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table co-location (SURVEY §7.0 "co-locate joins via
  * bucketing"): persist the tables a pipeline joins REPEATEDLY —
  * segments, chunks, sidecars, all keyed by `file`/`user_id` — bucketed
  * and sorted by that key with one shared bucket count. Every subsequent
  * equi join between them reads matching buckets directly: zero
  * exchanges, zero sorts, on either side, for every join, forever. At
  * 100 TB this converts the pipeline's dominant repeated shuffle into a
  * one-time write-side cost.
  *
  * Bucket-count guidance: pick ≈ (total size / 256 MB) rounded to a
  * power of two, and KEEP IT EQUAL across the tables that join — Spark
  * only elides the shuffle when both sides agree.
  */
object Bucketed {

  /** Persist `df` as a managed table bucketed+sorted by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** The co-located read side: just `spark.table` — bucketing metadata
    * rides in the catalog, and joins between tables written with the
    * same (key, buckets) plan with no Exchange (asserted in ScaleSpec).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
