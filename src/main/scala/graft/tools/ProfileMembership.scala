package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cypher.CypherEngine
import graft.graph.{GraphBuilder, GraphStore}

/** Dev aid (round 13, r12 verdict directive #6): scale profile of the
  * M44 membership lift — a `v:Label` predicate over a SET-mutated label
  * at sf1/sf10-class inputs, A/B'd against the equivalent plain property
  * predicate (the constant-fold-class baseline the lift replaces).
  *
  * What the lift costs structurally: ONE extra LEFT join per (variable,
  * label) pair against the provenance key frame (only the explicitly SET
  * keys — here customers with custkey % 10 = 0, i.e. 10% of the label).
  * The frame sits far under the broadcast threshold at every realistic
  * mutation size, so the expected profile is broadcast-hash-join cost ≈
  * the plain predicate's scan cost, no shuffle added and no per-row
  * cliff. A second timed run per shape separates plan/JIT warmup from
  * steady state.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   tools/run.sh graft.tools.ProfileMembership
  * Results → BASELINE.md round-13 membership table.
  */
object ProfileMembership {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val store = GraphStore.cached(sfDir)(GraphBuilder.buildAll(spark, sfDir))
    def t(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (rows=$n)")
    }

    // the write: provenance keys only — never touches Customer's store
    var mutated: GraphStore = null
    t("SET c:Vip (10% of Customer)") {
      mutated = CypherEngine(store).execute(
        "MATCH (c:Customer) WHERE c.c_custkey % 10 = 0 SET c:Vip").store
      mutated.memberships((("Vip", "Customer"))).count()
    }

    val liftQ =
      """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
         WHERE c:Vip AND c.c_acctbal > 0
         RETURN n.n_name AS nation, count(*) AS vips"""
    val plainQ =
      """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
         WHERE c.c_custkey % 10 = 0 AND c.c_acctbal > 0
         RETURN n.n_name AS nation, count(*) AS vips"""
    // plan audit: the lift must broadcast the provenance frame
    val plan = CypherEngine(mutated).run(liftQ)
      .queryExecution.executedPlan.toString
    println("lift joins broadcast: " + plan.contains("BroadcastHashJoin"))
    for (round <- 1 to 2) {
      t(s"membership lift (run $round)") { CypherEngine(mutated).run(liftQ).count() }
      t(s"plain predicate  (run $round)") { CypherEngine(mutated).run(plainQ).count() }
    }
    // differential: identical row sets by construction
    val a = CypherEngine(mutated).run(liftQ).collect().map(_.toSeq).toSet
    val b = CypherEngine(mutated).run(plainQ).collect().map(_.toSeq).toSet
    println(s"results agree: ${a == b}")
    spark.stop()
  }
}
