package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of the write-session lineage-cut policy
  * (`graft.cypher.planCutThreshold`): runs each named query alternating
  * the conf value WITHIN one JVM (A,B,A,B,A,B) so box drift — this
  * sandbox runs bimodal at the hypervisor level — cancels out of the
  * comparison. Args: [thresholdA] [thresholdB] [query ...]; defaults
  * A=64 (the gated default) B=0 (the r17 eager per-statement cut).
  */
object ProfileCutAB {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (ta, tb, names) = args.toSeq match {
      case a +: b +: rest if a.forall(_.isDigit) && b.forall(_.isDigit) =>
        (a, b, rest)
      case rest => ("64", "0", rest)
    }
    def time1(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { q =>
      time1(q) // warm the store caches once, uncounted
      val as = scala.collection.mutable.ArrayBuffer[Double]()
      val bs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        spark.conf.set(graft.cypher.CypherEngine.PlanCutThresholdKey, ta)
        as += time1(q)
        spark.conf.set(graft.cypher.CypherEngine.PlanCutThresholdKey, tb)
        bs += time1(q)
      }
      spark.conf.unset(graft.cypher.CypherEngine.PlanCutThresholdKey)
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"$q%-42s cut=$ta%-4s ${as.map(x => f"$x%.2f").mkString(" ")}  med ${med(as.toSeq)}%.2f | cut=$tb%-4s ${bs.map(x => f"$x%.2f").mkString(" ")}  med ${med(bs.toSeq)}%.2f")
    }
    spark.stop()
  }
}
