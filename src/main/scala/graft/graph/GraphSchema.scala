package graft.graph

/** Property-graph schema catalog.
  *
  * Mirrors the reference's Pydantic modeling output (reference:
  * final/schema.py:51-68 — `Node{name, key, properties, table_name}` and
  * `Relationship{source, target, label, key_s, key_t, properties,
  * table_name}`), as plain Scala case classes. The reference derives this
  * schema with an LLM prompt (final/schema.py:7-78); our engine declares it
  * deterministically from the FK catalog (see [[graft.model.Modeler]]), with
  * explicit override via these case classes.
  */
final case class NodeType(
    name: String,
    key: String,
    properties: Seq[String] = Nil,
    tables: Seq[String] = Nil,
    /** The catalog proves `key` unique in the (single) source table — e.g.
      * it is the declared PK — so the builder can skip the last-wins dedup
      * shuffle entirely. At 100 TB that's one full shuffle of every node
      * table saved whenever PK metadata exists.
      */
    keyUnique: Boolean = false)

/** Directed edge type: rows come from `table`, `keyS` references the source
  * node's key, `keyT` the target node's key (reference:
  * final/schema.py:57-64).
  */
final case class EdgeType(
    label: String,
    src: String,
    dst: String,
    keyS: String,
    keyT: String,
    properties: Seq[String] = Nil,
    table: String = "",
    /** The catalog proves (keyS, keyT) unique in `table` (e.g. keyS is the
      * PK, or the pair is a composite PK) — the builder skips pair dedup.
      */
    pairsUnique: Boolean = false)

final case class GraphSchema(nodes: Seq[NodeType], edges: Seq[EdgeType]) {
  def node(name: String): NodeType =
    nodes.find(_.name == name).getOrElse(sys.error(s"unknown node type: $name"))
  def edge(label: String): EdgeType =
    edges.find(_.label == label).getOrElse(sys.error(s"unknown edge type: $label"))

  /** Edge types incident to a node label (used by direction correction,
    * reference: final/langraph_neo4j3.py:299-331).
    */
  def edgesFor(nodeName: String): Seq[EdgeType] =
    edges.filter(e => e.src == nodeName || e.dst == nodeName)
}

object GraphSchema {

  /** Declared property-graph model of the testdata star schema — what the
    * reference's LLM modeling step would emit for these tables (FK→edge,
    * fact-table FK pairs→edge-with-properties; rule spec in the reference's
    * own prompt, final/schema.py:13-29).
    */
  val testdata: GraphSchema = GraphSchema(
    nodes = Seq(
      NodeType("Region", "r_regionkey", Seq("r_name"), Seq("region"), keyUnique = true),
      NodeType("Nation", "n_nationkey", Seq("n_name", "n_regionkey"), Seq("nation"), keyUnique = true),
      NodeType("Customer", "c_custkey", Seq("c_name", "c_nationkey", "c_acctbal"), Seq("customer"), keyUnique = true),
      NodeType("Supplier", "s_suppkey", Seq("s_name", "s_nationkey"), Seq("supplier"), keyUnique = true),
      NodeType("Part", "p_partkey", Seq("p_name", "p_brand", "p_type"), Seq("part"), keyUnique = true),
      NodeType("Order", "o_orderkey", Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"), Seq("orders"), keyUnique = true)),
    edges = Seq(
      EdgeType("IN_REGION", "Nation", "Region", "n_nationkey", "n_regionkey", Nil, "nation", pairsUnique = true),
      EdgeType("IN_NATION", "Customer", "Nation", "c_custkey", "c_nationkey", Nil, "customer", pairsUnique = true),
      EdgeType("SUPP_IN_NATION", "Supplier", "Nation", "s_suppkey", "s_nationkey", Nil, "supplier", pairsUnique = true),
      EdgeType("PLACED_BY", "Order", "Customer", "o_orderkey", "o_custkey", Nil, "orders", pairsUnique = true),
      // lineitem repeats (orderkey, partkey) pairs — dedup stays on
      EdgeType("CONTAINS", "Order", "Part", "l_orderkey", "l_partkey",
        Seq("l_quantity", "l_extendedprice"), "lineitem")))
}
