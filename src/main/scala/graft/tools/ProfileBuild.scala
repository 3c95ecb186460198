package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.{GraphBuilder, GraphSchema}
import graft.sources.Tables

/** Dev-only timing harness for graph-store construction: isolates the
  * per-edge-type build cost (dedup + validation + cache materialization)
  * from the first query that gets charged for it in the bench (q63 pays
  * the CONTAINS build; see BASELINE.md's per-query notes).
  */
object ProfileBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[time] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val schema = GraphSchema.testdata
    val tables = (n: String) => Tables.load(spark, sfDir, n)
    val store = GraphBuilder.buildAll(tables, schema).persisted
    schema.nodes.foreach { nt =>
      t(s"node ${nt.name} build+cache") { store.nodes(nt.name).count() }
    }
    schema.edges.foreach { et =>
      t(s"edge ${et.label} build+cache") { store.edges(et.label).count() }
    }
    // warm store: the query side alone
    val q = () => store.edges("CONTAINS").alias("l")
      .join(store.nodes("Order").alias("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .groupBy(year(col("o.o_orderdate")).as("yr")).count()
      .orderBy("yr")
    t("q63-equivalent on warm store (1st)") { q().collect() }
    t("q63-equivalent on warm store (2nd)") { q().collect() }
    store.unpersistAll()
    spark.stop()
  }
}
