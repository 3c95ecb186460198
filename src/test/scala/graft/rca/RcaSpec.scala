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

  test("golden: reference RCA session trace over sales_master") {
    // Replays the reference agent's recorded tool-call sequence
    // (final/experimenting_new/rca.ipynb:345-420) through the Rca loop:
    // serial per-year sum probes with an ANONYMOUS unlabeled endpoint
    // (the agent's exact pattern shape), then the 2-year comparison and
    // the order-count drill-down — asserting the notebook's recorded
    // values: 2003 → 3,516,979.54; 2004 → 4,724,162.60;
    // 2005 → 1,791,486.71; orders 2003 → 104, 2004 → 144.
    import graft.model.{Modeler, TestCatalogs}
    import graft.sources.Csv
    val dir = "/root/reference/final/sales_master_files"
    val (tables, _) = Csv.loadCatalog(spark, dir, TestCatalogs.salesCatalog)
    val schema = Modeler.model(TestCatalogs.salesCatalog)
    val eng = CypherEngine(GraphBuilder.buildAll(tables(_), schema))
    val script = Iterator(
      "MATCH (o:Order)-[c:ORDER_PRODUCT]->() WHERE o.YEAR_ID = 2003 RETURN sum(c.SALES) AS total",
      "MATCH (o:Order)-[c:ORDER_PRODUCT]->() WHERE o.YEAR_ID = 2004 RETURN sum(c.SALES) AS total",
      "MATCH (o:Order)-[c:ORDER_PRODUCT]->() WHERE o.YEAR_ID = 2005 RETURN sum(c.SALES) AS total",
      """MATCH (o:Order)-[c:ORDER_PRODUCT]->(:Product)
         WHERE o.YEAR_ID IN [2003, 2004]
         RETURN o.YEAR_ID AS Year, sum(c.SALES) AS TotalSales ORDER BY Year""",
      """MATCH (o:Order)
         WHERE o.YEAR_ID IN [2003, 2004]
         RETURN o.YEAR_ID AS Year, count(o) AS NumberOfOrders ORDER BY Year""")
    val (trace, summary) = Rca.run(eng, "analyze yearly sales",
      planner = _ => if (script.hasNext) Some(script.next()) else None)
    assert(trace.steps.size == 5)
    assert(trace.steps.forall(_.error.isEmpty), trace.steps.flatMap(_.error))
    val yearTotals = trace.steps.take(3).map(_.rows.head.getDouble(0))
    val want = Seq(3516979.54, 4724162.60, 1791486.71)
    yearTotals.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 0.01, s"$got vs $w")
    }
    val twoYear = trace.steps(3).rows.map(r => r.getLong(0) -> r.getDouble(1))
    assert(twoYear.map(_._1) == Seq(2003L, 2004L))
    assert(math.abs(twoYear(0)._2 - 3516979.54) < 0.01)
    assert(math.abs(twoYear(1)._2 - 4724162.60) < 0.01)
    val counts = trace.steps(4).rows.map(r => r.getLong(0) -> r.getLong(1))
    assert(counts == Seq(2003L -> 104L, 2004L -> 144L))
    assert(summary.contains("analyze yearly sales"))
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
