package graft

import org.apache.spark.sql.SparkSession

/** TEMPORARY round-16 diagnostic (deleted before round close): decomposes
  * a tail key's cost into plan-build / analysis+optimization / execution
  * under the exact Bench session config. */
object TimeTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def ms(t0: Long): String = f"${(System.nanoTime() - t0) / 1e6}%.0f ms"
    // warm the scan family once
    SparkEntry.queries("scan_parquet")(spark, sfDir).count()
    val keys = args.toSeq.flatMap(_.split(',')).filter(_.nonEmpty)
    keys.foreach { k =>
      (1 to 2).foreach { rep =>
        val fn = SparkEntry.queries(k)
        var t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = ms(t0)
        t0 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val tPlan = ms(t0)
        t0 = System.nanoTime()
        df.count()
        val tExec = ms(t0)
        println(s"[tail] $k rep$rep build=$tBuild plan=$tPlan exec(count incl codegen)=$tExec")
      }
    }
    spark.stop()
  }
}
