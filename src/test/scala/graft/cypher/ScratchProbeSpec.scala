package graft.cypher

import graft.SparkSpec
import graft.graph.GraphBuilder

/** Throwaway probe (delete before commit). */
class ScratchProbeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private lazy val store = GraphBuilder.buildAll(spark, sf)
  private lazy val engine = CypherEngine(store)

  test("probe: CALL body with intermediate aggregating WITH") {
    val res = engine.run(
      """MATCH (r:Region)
        CALL { WITH r MATCH (n:Nation)-[:IN_REGION]->(r) WITH count(n) AS cnt RETURN cnt }
        RETURN r.r_name AS name, cnt ORDER BY name""")
    res.show(false)
  }

  test("probe: direct aggregate RETURN in CALL body (known-good path)") {
    val res = engine.run(
      """MATCH (r:Region)
        CALL { WITH r MATCH (n:Nation)-[:IN_REGION]->(r) RETURN count(n) AS cnt }
        RETURN r.r_name AS name, cnt ORDER BY name""")
    res.show(false)
  }
}
