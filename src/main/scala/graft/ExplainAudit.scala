package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans of representative queries for the plan
  * quality audit (pushdown, broadcast, join strategy).
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "s1_scan_prune", "j5_broadcast_star", "j1_containment",
      "sim_cosine_topk", "w1_sessionize", "dedup_minhash_lsh")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
