package graft

import org.apache.spark.sql.execution.FormattedMode

/** CI pins for the plan-shape claims SCALING.md makes — previously verified
  * only by a `tools.ExplainAudit` run, so a compiler change that silently
  * un-broadcast a dimension join or dropped parquet pushdown surfaced (if at
  * all) as a bench regression instead of a red test. These assert the
  * LOGICAL properties that survive any data scale: which join strategy the
  * plan picks, whether predicates reach the scan, and that no accidental
  * cartesian appears. (q81's zero-Exchange bucketed join is pinned
  * separately by BucketingSpec, which owns the bucketed-table fixtures.)
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("cypher 1-hop/2-hop pattern joins compile to pure broadcast-hash-join chains") {
    // the dimension-star shape: every pattern join against a node/edge
    // store frame broadcasts the small side — a sort-merge fallback here
    // means statistics or the join order regressed
    for (q <- Seq(
        "q60_cypher_count_by_nation", "q61_cypher_status_topk",
        "q62_cypher_2hop_region", "q63_cypher_with_year",
        "q64_cypher_where_in", "q65_cypher_distinct_propmatch")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast joins:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge join:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$q grew a cartesian/nested-loop join:\n$p")
    }
  }

  test("explicit broadcast star (q04) keeps both dimension joins broadcast") {
    val p = plan("q04_broadcast_star")
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"q04 should broadcast nation AND region:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q04 fell back to sort-merge join:\n$p")
  }

  test("correlated CALL shapes compile to keyed joins, never correlated subplans") {
    // q103 (intermediate aggregating WITH + zero-match restore): ONE
    // grouped aggregate, a left-anti keyed restore, a union, and keyed
    // join-backs — no per-key loop, no cartesian, nothing quadratic
    val p103 = plan("q103_cypher_call_stage_agg")
    assert(p103.contains("LeftAnti"), s"q103 lost the keyed zero-match restore:\n$p103")
    assert(p103.contains("Union"), s"q103 lost the restore union:\n$p103")
    assert(!p103.contains("CartesianProduct") && !p103.contains("BroadcastNestedLoopJoin"),
      s"q103 grew a cartesian/nested-loop join:\n$p103")
    // q104 (correlated UNION body): the two branches are keyed joins
    // unioned by name; bare UNION's dedupe is an aggregate, not a loop
    val p104 = plan("q104_cypher_call_union")
    assert(p104.contains("Union"), s"q104 lost the branch union:\n$p104")
    assert(!p104.contains("CartesianProduct") && !p104.contains("BroadcastNestedLoopJoin"),
      s"q104 grew a cartesian/nested-loop join:\n$p104")
    // q100 (per-key top-k): still the partitioned row_number window
    val p100 = plan("q100_cypher_call_topk")
    assert(p100.contains("Window"), s"q100 lost its per-key window:\n$p100")
    assert(!p100.contains("CartesianProduct"),
      s"q100 grew a cartesian:\n$p100")
  }

  test("group-variable closure (q110) stays keyed: seed semi-join, no cartesian") {
    // the bounded closure with relationship-struct accumulation is still
    // the same join chain: a bound anchor seed-restricts the first hop
    // (left semi), every chain step is a keyed join, and the per-hop
    // struct array is pure projection — no loop, no cartesian
    val p = plan("q110_cypher_group_vars")
    assert(p.contains("LeftSemi"), s"q110 lost its anchored seed semi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q110 grew a cartesian/nested-loop join:\n$p")
  }

  test("filter+project (q02) pushes predicates and prunes columns at the scan") {
    val p = plan("q02_filter_project")
    val pushed = p.linesIterator.exists(l =>
      l.contains("PushedFilters") && !l.contains("PushedFilters: []"))
    assert(pushed, s"q02's scan lost its pushed filters:\n$p")
    // column pruning: the scan must read only the 5 referenced columns
    // (2 filter + 3 projected), not the 16-column lineitem schema
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    val colCount = readSchema.count(_ == ',') + 1
    assert(colCount <= 5, s"q02's scan reads too many columns: $readSchema")
  }
}
