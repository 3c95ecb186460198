package graft.tools

import org.apache.spark.sql.SparkSession

/** Run named SparkEntry queries with full stack traces (the bench swallows
  * exceptions into an `errors` marker by design; this is the companion
  * diagnosis tool). Args: query names; env SPARK_GRAFT_SF_DIR selects data.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { q =>
      val t0 = System.nanoTime()
      try {
        val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
        println(f"$q -> rows=$n  (${(System.nanoTime() - t0) / 1e9}%.2f s)")
      } catch { case t: Throwable => println(s"$q FAILED"); t.printStackTrace() }
    }
    spark.stop()
  }
}
