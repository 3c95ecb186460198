package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved conf A/B for any SparkEntry query: alternates two
  * `SPARK_GRAFT_CONF`-style conf bundles WITHIN one JVM (A,B,A,B,A,B) so
  * the sandbox's bimodal drift cancels out of the comparison.
  * Args: <confA> <confB> <query ...> where each conf is "k=v;k2=v2" or
  * "-" for no overrides. Session mirrors Bench (32-way, UTC, nanos).
  */
object ProfileConfAB {
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
    val confA = args(0)
    val confB = args(1)
    val names = args.drop(2).toSeq
    def parse(c: String): Seq[(String, String)] =
      if (c == "-") Nil
      else c.split(';').filter(_.nonEmpty).toSeq.map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }
    val keys = (parse(confA) ++ parse(confB)).map(_._1).distinct
    def setAll(c: String): Unit = {
      keys.foreach(spark.conf.unset)
      parse(c).foreach { case (k, v) => spark.conf.set(k, v) }
    }
    def time1(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { q =>
      time1(q) // warm store caches once, uncounted
      val as = scala.collection.mutable.ArrayBuffer[Double]()
      val bs = scala.collection.mutable.ArrayBuffer[Double]()
      (1 to 3).foreach { _ =>
        setAll(confA); as += time1(q)
        setAll(confB); bs += time1(q)
      }
      keys.foreach(spark.conf.unset)
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      println(f"$q%-42s A[$confA] ${as.map(x => f"$x%.2f").mkString(" ")} med ${med(as.toSeq)}%.2f | B[$confB] ${bs.map(x => f"$x%.2f").mkString(" ")} med ${med(bs.toSeq)}%.2f")
    }
    spark.stop()
  }
}
