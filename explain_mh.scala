import org.apache.spark.sql.SparkSession
object ExplainMh {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // print join nodes with their keys
    p.split("\n").filter(l => l.contains("Join") || l.contains("keys")).take(40).foreach(println)
    spark.stop()
  }
}
