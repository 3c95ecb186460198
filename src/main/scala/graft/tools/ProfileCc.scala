package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.GraphAnalytics

/** Dev-only A/B for the connected-components escalation (round 9): on a
  * synthetic 1M-node PATH graph — the worst case for min-label
  * propagation, whose round count is O(component diameter) — compare
  *
  *   - the default adaptive path (delta iteration, escalating to
  *     pointer-doubling after `graft.cc.escalateRounds` rounds), and
  *   - pure pointer-doubling from round 1 (escalateRounds=0),
  *
  * printing wall time and the (delta, jump) round split. Pure delta
  * iteration is NOT run: on this graph it would need ~10^6 rounds at
  * ~0.25 s/round of job scheduling — the measurement the escalation
  * exists to avoid. A low-diameter control (random graph, same node
  * count) shows the delta path untouched by the change.
  */
object ProfileCc {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_CC_NODES", "1000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      val (d, j) = GraphAnalytics.LastCcRounds.get()
      println(f"[time] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        f"   rounds: delta=$d jump=$j")
      r
    }

    // 1M-node path: diameter = n-1
    val chain = spark.range(1, n)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
      .persist()
    println(s"path edges: ${chain.count()}")
    (1 to 2).foreach { i =>
      t(s"escalated (delta->jump) #$i") {
        GraphAnalytics.connectedComponents(spark, chain, localThreshold = 0).count()
      }
      spark.conf.set(GraphAnalytics.CcEscalateRoundsKey, "0")
      t(s"pure pointer-doubling   #$i") {
        GraphAnalytics.connectedComponents(spark, chain, localThreshold = 0).count()
      }
      spark.conf.unset(GraphAnalytics.CcEscalateRoundsKey)
    }

    // low-diameter control: random graph, same scale — the delta path
    // converges inside its budget and never escalates
    val rand = spark.range(0, n)
      .select((col("id") * 2654435761L % n).as("src"),
        (col("id") * 40503L % n).as("dst"))
      .filter(col("src") =!= col("dst"))
      .persist()
    println(s"random edges: ${rand.count()}")
    t("random graph (delta only)") {
      GraphAnalytics.connectedComponents(spark, rand, localThreshold = 0).count()
    }
    spark.stop()
  }
}
