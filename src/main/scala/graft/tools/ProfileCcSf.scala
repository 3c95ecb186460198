package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

import graft.graph.GraphAnalytics

/** Dev-only: profile connected components on the REAL q33 graph shape at
  * any SF dir (vs ProfileCc's synthetic path/random graphs). Replays the
  * q33 sampled-bipartite edge build (orders `o_orderkey % 97 == 0` joined
  * to lineitem, distinct (custkey, partkey+1e9) pairs), persists it, then
  * times the adaptive CC with `graft.iter.verbose` round logging so a
  * scale cliff decomposes into (round count) × (per-round cost).
  *
  * Usage: tools/run.sh graft.tools.ProfileCcSf <sfDir> [escalateRounds]
  */
object ProfileCcSf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(GraphAnalytics.IterVerboseKey, "true")
    // only a numeric second arg is an escalateRounds override — `verify`
    // (or any other flag) must not poison the conf with a non-int
    args.drop(1).headOption.filter(r => scala.util.Try(r.toInt).isSuccess)
      .foreach(r => spark.conf.set(GraphAnalytics.CcEscalateRoundsKey, r))

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val (d, j) = GraphAnalytics.LastCcRounds.get()
      println(f"[time] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"   rounds: delta=$d jump=$j")
      r
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .filter(pmod(col("o_orderkey"), lit(97)) === 0)
    val edges = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast(LongType).as("src"),
        (col("l_partkey").cast(LongType) + 1000000000L).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = t("edge build+materialize")(edges.count())
    println(s"edges: $n")

    val comps = t("connectedComponents") {
      GraphAnalytics.connectedComponents(spark, edges, localThreshold = 0)
        .groupBy("component").agg(count(lit(1))).count()
    }
    println(s"components: $comps")

    if (args.contains("verify")) {
      // ground truth: single-task union-find (forced via a huge local
      // threshold); exact (node, component) equality, not just counts
      val local = t("local union-find") {
        GraphAnalytics.connectedComponents(spark, edges, localThreshold = Long.MaxValue)
      }
      val dist = GraphAnalytics.connectedComponents(spark, edges, localThreshold = 0)
      val diff = t("exact frame compare") {
        dist.exceptAll(local).count() + local.exceptAll(dist).count()
      }
      println(s"verify: ${if (diff == 0) "IDENTICAL" else s"MISMATCH rows=$diff"}")
    }
    spark.stop()
  }
}
