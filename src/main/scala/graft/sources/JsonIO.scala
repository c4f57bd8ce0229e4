package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** S4/S5 — JSON compatibility IO. The reference persists every stage as a
  * pretty-printed JSON array per file (`utils.py:197-204`); the engine's
  * canonical store is parquet, with JSON kept as a compatibility
  * source/sink for interop with reference outputs.
  */
object JsonIO {

  /** S4 — read a reference-style (possibly pretty-printed, multi-line)
    * JSON array with an explicit schema. `multiLine=true` is what lets
    * Spark parse the reference's indented array files
    * (`vad_multi.py:39-44` writes `indent=4`).
    */
  def readSegmentArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** S4 — read line-delimited JSON (the engine's own JSON sink format). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** S5 — JSON compatibility sink (line-delimited; splittable at scale,
    * unlike the reference's single-array files).
    */
  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** The canonical stage store: parquet partitioned by the dataset/stage
    * key (SURVEY §1.5 — the reference's `{dir}/{basename}_outputs/{stage}`
    * directory-as-table layout becomes partition pruning).
    */
  def writeStageTable(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  def readStageTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
