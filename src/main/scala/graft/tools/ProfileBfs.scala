package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import graft.graph.GraphAnalytics
import graft.sources.Tables

/** Dev-only A/B: q34's BFS at full-graph scale, local single-task
  * strategy vs Pregel, to place [[GraphAnalytics.LocalEdgeThreshold]]
  * empirically (sf1's ~6M-edge bipartite graph sits just above the 5M
  * threshold and Pregel's first-run cost there is both higher and wildly
  * variable — 10-75 s across bench runs — while reruns are ~5.7 s).
  */
object ProfileBfs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val edges = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast(LongType).as("src"),
        (col("l_partkey").cast(LongType) + 1000000000L).as("dst"))
      .distinct()
      .coalesce(12)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = t("edge build+persist") { edges.count() }
    println(s"edges: $n")
    (1 to 2).foreach { i =>
      t(s"local  bfs #$i") {
        GraphAnalytics.bfs(spark, edges, 1L, 4, localThreshold = Long.MaxValue).count()
      }
      t(s"df     bfs #$i") {
        GraphAnalytics.bfs(spark, edges, 1L, 4, localThreshold = 0L).count()
      }
      t(s"pregel bfs #$i") {
        GraphAnalytics.pregelBfs(spark, edges, 1L, 4).count()
      }
    }
    (1 to 2).foreach { i =>
      t(s"df     cc  #$i") {
        GraphAnalytics.connectedComponents(spark, edges, localThreshold = 0).count()
      }
      t(s"pregel cc  #$i") {
        GraphAnalytics.pregelComponents(spark, edges).count()
      }
    }
    (1 to 2).foreach { i =>
      t(s"df     pr  #$i") {
        GraphAnalytics.dfPageRank(spark, edges, iters = 10).count()
      }
      t(s"graphx pr  #$i") {
        GraphAnalytics.pageRank(spark, edges, iters = 10, localThreshold = 0).count()
      }
    }
    spark.stop()
  }
}
