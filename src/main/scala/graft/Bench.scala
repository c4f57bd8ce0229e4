package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to every core on the host (the driver's box is local[32]);
    // an explicit SPARK_GRAFT_CPUS still pins it
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT and the file listing so the first timed query
    // doesn't absorb session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // min of two runs per query: the second run reuses warmed codegen and
    // file listings, so the figure reflects steady-state execution.
    // Queries run in SORTED name order (Map iteration order is hash-based
    // and changes across builds — nondeterministic ordering made round-2
    // timings incomparable), and the session cache is dropped after every
    // run: several dedup/ANN queries cache() eagerly inside their plan,
    // and without unpersist the storage tier fills with dead tables whose
    // memory pressure taxes every later query. Clearing after EACH of the
    // two runs also keeps min-of-2 honest — run 2 rebuilds its own caches
    // instead of silently reusing run 1's.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) dt else Double.MaxValue
      }
      name -> (if (times.min == Double.MaxValue) -1d else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
