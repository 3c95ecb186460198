package graft.model

import graft.graph.{EdgeType, GraphSchema, NodeType}

/** Deterministic relational→property-graph modeling.
  *
  * The reference derives its graph schema by prompting an LLM with the ERD
  * (reference: final/schema.py:7-78); the prompt itself spells out the
  * rules (final/schema.py:13-29): tables become nodes; look-up/junction
  * tables — "multiple foreign keys or file nomenclature with multiple
  * entities" — become relationships carrying their leftover columns as
  * properties; remaining FKs become plain relationships. This module makes
  * those rules a pure function of the FK catalog, so modeling is
  * reproducible (SURVEY.md §3.2; divergence from the reference's
  * case-by-case LLM judgment is by design and can be overridden by passing
  * an explicit [[graft.graph.GraphSchema]]).
  *
  * Naming rules (deterministic):
  *  - node name: capitalized table name, `_table` suffix stripped, then a
  *    trailing `s` stripped unless the name ends in `ss`
  *    (customers→Customer, staffs→Staff, address→Address);
  *  - FK edge label: `<SRCTABLE>_HAS_<FKCOL>` with an `_id`/`_ID` suffix
  *    stripped from the column (orders.customer_id → ORDERS_HAS_CUSTOMER) —
  *    the table prefix keeps labels unique, which the reference demands of
  *    its LLM ("Donot repeat labels", final/schema.py:24);
  *  - junction edge label: the junction table name uppercased, `_TABLE`
  *    stripped (order_items → ORDER_ITEMS).
  */
object Modeler {

  def nodeName(table: String): String = {
    val base = stripSuffix(table, "_table")
    val cap = base.capitalize
    if (cap.endsWith("s") && !cap.endsWith("ss")) cap.dropRight(1) else cap
  }

  private def stripSuffix(s: String, suffix: String): String =
    if (s.toLowerCase.endsWith(suffix)) s.dropRight(suffix.length) else s

  private def stripIdSuffix(c: String): String = {
    val lower = c.toLowerCase
    if (lower.endsWith("_id")) c.dropRight(3) else c
  }

  /** A junction (look-up) table: ≥2 FKs and its primary key is either
    * undeclared or overlaps the FK columns — i.e. the row exists to relate
    * other rows, not to be an entity.
    */
  def isJunction(t: TableDef): Boolean = {
    val fkCols = t.foreignKeys.map(_.from).toSet
    t.foreignKeys.size >= 2 &&
      (t.primaryKeys.isEmpty || t.primaryKeys.exists(fkCols.contains))
  }

  /** Key column for a node table: single declared PK, else first PK, else
    * the first column (documented fallback; the reference's LLM guesses in
    * the same situation).
    */
  def nodeKey(t: TableDef): String =
    t.primaryKeys.headOption.getOrElse(t.columns.head.name)

  def model(catalog: RelationalCatalog): GraphSchema = {
    val (junctions, entities) = catalog.tables.partition(isJunction)
    val nodeByTable: Map[String, NodeType] = entities.map { t =>
      val key = nodeKey(t)
      t.name -> NodeType(
        name = nodeName(t.name),
        key = key,
        properties = t.columns.map(_.name).filterNot(_ == key),
        tables = Seq(t.name),
        // a declared single-column PK proves uniqueness → builder skips
        // the dedup shuffle
        keyUnique = t.primaryKeys.size == 1)
    }.toMap

    val fkEdges = entities.flatMap { t =>
      t.foreignKeys.flatMap { fk =>
        nodeByTable.get(fk.table).map { target =>
          EdgeType(
            label = s"${t.name.toUpperCase}_HAS_${stripIdSuffix(fk.from).toUpperCase}",
            src = nodeByTable(t.name).name,
            dst = target.name,
            keyS = nodeKey(t),
            keyT = fk.from,
            properties = Nil,
            table = t.name,
            // keyS is the row PK → one edge per row, pairs unique
            pairsUnique = t.primaryKeys.size == 1)
        }
      }
    }

    val junctionEdges = junctions.flatMap { t =>
      val resolvable = t.foreignKeys.filter(fk => nodeByTable.contains(fk.table))
      if (resolvable.size < 2) Nil
      else {
        val Seq(f1, f2) = resolvable.take(2)
        val used = Set(f1.from, f2.from)
        Seq(EdgeType(
          label = stripSuffix(t.name, "_table").toUpperCase,
          src = nodeByTable(f1.table).name,
          dst = nodeByTable(f2.table).name,
          keyS = f1.from,
          keyT = f2.from,
          properties = t.columns.map(_.name).filterNot(used.contains),
          table = t.name,
          // unique only when the composite PK IS exactly the FK pair
          pairsUnique = t.primaryKeys.toSet == used))
      }
    }

    GraphSchema(nodeByTable.values.toSeq.sortBy(_.name), (fkEdges ++ junctionEdges).sortBy(_.label))
  }

  /** Schema-graph JSON for interactive visualization — `{nodes, edges}` in
    * the shape vis-network consumes (the reference renders the same graph
    * with pyvis, final/graph.py:4-69).
    */
  def schemaJson(schema: GraphSchema): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val nodes = schema.nodes.map { n =>
      s"{${q("id")}: ${q(n.name)}, ${q("label")}: ${q(n.name)}, ${q("key")}: ${q(n.key)}}"
    }.mkString("[", ", ", "]")
    val edges = schema.edges.map { e =>
      s"{${q("from")}: ${q(e.src)}, ${q("to")}: ${q(e.dst)}, ${q("label")}: ${q(e.label)}}"
    }.mkString("[", ", ", "]")
    s"""{"nodes": $nodes, "edges": $edges}"""
  }
}
