package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.GraphAnalytics
import graft.sources.Tables

/** Dev-only timing harness for the GraphX analytics path: separates the
  * derived-edge build, cold-JIT first run, and warm steady-state so bench
  * regressions can be attributed (not part of the query surface).
  */
object TimeGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    def edges(sampleMod: Option[Int]): DataFrame = {
      val o = sampleMod match {
        case Some(m) => Tables.load(spark, sfDir, "orders")
          .filter(pmod(col("o_orderkey"), lit(m)) === 0)
        case None => Tables.load(spark, sfDir, "orders")
      }
      Tables.load(spark, sfDir, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").cast(LongType).as("src"),
          (col("l_partkey").cast(LongType) + 1000000000L).as("dst"))
        .distinct()
    }

    val sampled = t("build sampled (count)") { val e = edges(Some(97)).coalesce(1)
      .persist(); e.count(); e }
    val full = t("build full (count)") { val e = edges(None).coalesce(2)
      .persist(); e.count(); e }
    t("cc sampled COLD") { GraphAnalytics.connectedComponents(spark, sampled).count() }
    t("cc sampled WARM") { GraphAnalytics.connectedComponents(spark, sampled).count() }
    t("bfs full COLD") { GraphAnalytics.bfs(spark, full, 1L, 4).count() }
    t("bfs full WARM") { GraphAnalytics.bfs(spark, full, 1L, 4).count() }
    t("pagerank sampled") { GraphAnalytics.pageRank(spark, sampled, 10).count() }
    spark.stop()
  }
}
