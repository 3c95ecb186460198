package graft.rca

import graft.SparkSpec
import graft.cypher.CypherEngine
import graft.graph.GraphBuilder

class RcaSpec extends SparkSpec {

  private lazy val engine =
    CypherEngine(GraphBuilder.buildAll(spark, "/root/testdata/sf0.001"))

  test("scripted RCA loop runs queries in order and accumulates the trace") {
    val script = Iterator(
      "MATCH (o:Order) RETURN count(o) AS orders",
      "MATCH (o:Order)-[:PLACED_BY]->(c:Customer) RETURN c.c_nationkey AS nk, count(o) AS cnt ORDER BY cnt DESC LIMIT 3")
    val (trace, summary) = Rca.run(engine, "where do orders concentrate?",
      planner = _ => if (script.hasNext) Some(script.next()) else None)
    assert(trace.steps.size == 2)
    assert(trace.steps.forall(_.error.isEmpty))
    assert(trace.steps.head.rows.head.getLong(0) > 0)
    assert(trace.steps(1).rows.size == 3)
    assert(summary.contains("where do orders concentrate?"))
  }

  test("loop is bounded at maxRounds even if the planner never stops") {
    val (trace, _) = Rca.run(engine, "loop forever",
      planner = _ => Some("MATCH (r:Region) RETURN count(r) AS c"))
    assert(trace.steps.size == Rca.MaxRounds)
  }

  test("parallel hypotheses run concurrently and keep separate traces") {
    def onceThenStop(q: String): Rca.Planner = {
      val it = Iterator(q)
      _ => if (it.hasNext) Some(it.next()) else None
    }
    val results = Rca.runParallel(engine, "what drives volume?", Map(
      "by-nation" -> onceThenStop(
        "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) RETURN n.n_name AS nn, count(c) AS cnt ORDER BY cnt DESC LIMIT 3"),
      "by-status" -> onceThenStop(
        "MATCH (o:Order) RETURN o.o_orderstatus AS st, count(o) AS cnt ORDER BY cnt DESC")))
    assert(results.keySet == Set("by-nation", "by-status"))
    results.foreach { case (name, (trace, summary)) =>
      assert(trace.steps.size == 1 && trace.steps.head.error.isEmpty, name)
      assert(summary.contains(s"[$name]"))
    }
  }

  test("a failing query is recorded as an error step, not a crash") {
    val script = Iterator(
      "MATCH (x:Nope) RETURN count(x) AS c",
      "MATCH (r:Region) RETURN count(r) AS c")
    val (trace, summary) = Rca.run(engine, "resilience",
      planner = _ => if (script.hasNext) Some(script.next()) else None)
    assert(trace.steps.size == 2)
    assert(trace.steps.head.error.isDefined)
    assert(trace.steps(1).error.isEmpty)
    assert(summary.contains("ERROR"))
  }
}
