package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table loaders for the driver-generated TPC-H-ish star schema plus the
  * `events`/`documents`/`embeddings` tables (see TESTDATA.md).
  *
  * The `events.ts` column is written as parquet INT64 TIMESTAMP(NANOS),
  * which Spark 4 rejects by default; `nanosAsLong` reads it as a plain
  * long of epoch-nanoseconds, truncated here to microseconds (`ts div
  * 1000`). That is exactly DuckDB's `epoch_us(ts)` (DuckDB itself
  * truncates parquet nanos to micros on read), so every time computation
  * downstream stays in the exact integer domain and is bit-reproducible
  * against the oracle.
  */
object Tables {

  /** Session settings every entry point needs regardless of who built the
    * SparkSession (the driver builds its own for Verify/Bench).
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tune(spark).read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** `events` rows as timestamped intervals — the engine's segment relation
    * (SURVEY §1.1): `user_id` plays the reference's per-file partition key,
    * `[s_us, e_us]` an interval whose duration is the `value` column in
    * seconds, all in exact integer microseconds.
    */
  def eventIntervals(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("user_id"),
      col("event_id"),
      col("event_type"),
      expr("ts div 1000").as("s_us"),
      (expr("ts div 1000") + round(col("value") * 1e6d).cast("long")).as("e_us"),
      round(col("value") * 100d).cast("long").as("cents"))
}
