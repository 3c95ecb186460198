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

  private val log = org.slf4j.LoggerFactory.getLogger("graft.model.Modeler")

  /** A PK name specific enough to identify an entity across tables —
    * generic names (`id`, `key`, …) would merge unrelated tables.
    */
  private def isEntityKey(pk: String): Boolean =
    !Set("id", "key", "pk", "rowid", "uid").contains(pk.toLowerCase)

  /** Entity tables sharing the same single-column PK name AND declared type
    * describe one entity split across tables (the reference's LLM merges
    * these into one node with `tables: [a, b]`, exercised by
    * final/inject_node.py:390-403's multi-table outer merge). Returns the
    * merge groups, ≥2 tables each, in catalog order.
    */
  def mergeGroups(entities: Seq[TableDef]): Seq[Seq[TableDef]] =
    entities
      .filter(t => t.primaryKeys.size == 1 && isEntityKey(t.primaryKeys.head))
      .groupBy(t => (t.primaryKeys.head,
        t.columns.find(_.name == t.primaryKeys.head).map(_.sqlType.toUpperCase).getOrElse("")))
      .values.filter(_.size >= 2).toSeq
      .sortBy(_.head.name)

  def model(catalog: RelationalCatalog): GraphSchema = {
    val (junctions, entities) = catalog.tables.partition(isJunction)

    val groups = mergeGroups(entities)
    val groupedTables: Set[String] = groups.flatten.map(_.name).toSet
    val mergedNodes: Map[String, NodeType] = groups.flatMap { g =>
      val key = g.head.primaryKeys.head
      // name from the shared key (customer_id → Customer): the key is the
      // entity's identity; no member table name is privileged
      val merged = NodeType(
        name = stripIdSuffix(key).capitalize,
        key = key,
        properties = g.flatMap(_.columns.map(_.name)).distinct.filterNot(_ == key),
        tables = g.map(_.name),
        // each member's PK is unique but the outer merge can still pad —
        // multi-table nodes always go through the builder's dedup
        keyUnique = false)
      g.map(t => t.name -> merged)
    }.toMap

    val nodeByTable: Map[String, NodeType] = mergedNodes ++
      entities.filterNot(t => groupedTables(t.name)).map { t =>
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
        nodeByTable.get(fk.table).flatMap { target =>
          // a same-group FK ON THE SHARED KEY (one merge member referencing
          // another) is the merge join itself, not an edge; genuine
          // self-references on other columns (manager_id → staffs) stay
          if ((target eq nodeByTable(t.name)) && fk.from == target.key) None
          // an FK declared against a non-key unique column (legal in
          // SQLite) cannot join the target's node key — emitting the edge
          // would validate against the wrong column and silently drop
          // every row, so skip it loudly instead (ADVICE r1)
          else if (fk.to.nonEmpty && fk.to != target.key) {
            log.warn(s"skipping FK edge ${t.name}.${fk.from} -> ${fk.table}.${fk.to}: " +
              s"references non-key column (node ${target.name} is keyed by ${target.key})")
            None
          } else Some(EdgeType(
            label = s"${t.name.toUpperCase}_HAS_${stripIdSuffix(fk.from).toUpperCase}",
            src = nodeByTable(t.name).name,
            dst = target.name,
            keyS = nodeKey(t),
            keyT = fk.from,
            properties = Nil,
            table = t.name,
            // keyS is the row PK → one edge per row, pairs unique
            pairsUnique = t.primaryKeys.size == 1))
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

    GraphSchema(nodeByTable.values.toSeq.distinct.sortBy(_.name),
      (fkEdges ++ junctionEdges).sortBy(_.label))
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
