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

  /** Self-contained interactive schema-graph HTML — the reference ships a
    * pyvis page with the same content (final/graph.py:4-69): one box per
    * node type labeled `name / PK / first-5-props preview`, directed
    * labeled edges, hover tooltips carrying source tables, full property
    * lists and `keyS → keyT`, draggable nodes, pan and wheel zoom. This
    * emitter embeds the graph JSON plus a small dependency-free
    * force-directed canvas renderer, so the file opens offline (the
    * reference bundles vis-9.1.2 for the same reason).
    */
  def schemaHtml(schema: GraphSchema): String = {
    // \r and the JS line separators U+2028/U+2029 terminate a JS string
    // literal just like \n — a schema/table/column name carrying one would
    // otherwise break the embedded script
    def js(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r").replace("<", "\\u003c")
      .replace("\u2028", "\\u2028").replace("\u2029", "\\u2029")
    def q(s: String) = "\"" + js(s) + "\""
    val nodes = schema.nodes.map { n =>
      val preview = n.properties.take(5).mkString(", ") +
        (if (n.properties.size > 5) "..." else "")
      val label = s"${n.name}\nPK: ${n.key}\nProps: $preview"
      val title = s"Table: ${n.tables.mkString(", ")}\n" +
        s"Properties: ${n.properties.mkString(", ")}"
      s"{id:${q(n.name)},label:${q(label)},title:${q(title)}}"
    }.mkString("[", ",\n", "]")
    val edges = schema.edges.map { e =>
      val props = if (e.properties.nonEmpty) s" (${e.properties.mkString(", ")})" else ""
      val title = s"${e.table}\n${e.keyS} → ${e.keyT}$props"
      s"{from:${q(e.src)},to:${q(e.dst)},label:${q(e.label)},title:${q(title)}}"
    }.mkString("[", ",\n", "]")
    s"""<!DOCTYPE html>
<html>
<head>
<meta charset="utf-8">
<title>Graph schema</title>
<style>
  body { margin: 0; background: #ffffff; font-family: sans-serif; }
  #net { width: 100%; height: 700px; display: block; cursor: grab; }
  #tip { position: fixed; display: none; background: #fffbe6; color: black;
         border: 1px solid #999; padding: 4px 8px; font-size: 12px;
         pointer-events: none; white-space: pre; z-index: 10; }
</style>
</head>
<body>
<canvas id="net"></canvas>
<div id="tip"></div>
<script>
var nodes = $nodes;
var edges = $edges;
(function () {
  var canvas = document.getElementById('net'), ctx = canvas.getContext('2d');
  var tip = document.getElementById('tip');
  var W, H, dpr = window.devicePixelRatio || 1;
  function resize() {
    W = canvas.clientWidth; H = 700;
    canvas.width = W * dpr; canvas.height = H * dpr;
    ctx.setTransform(dpr, 0, 0, dpr, 0, 0);
  }
  window.addEventListener('resize', function () { resize(); draw(); });
  resize();

  var byId = {};
  nodes.forEach(function (n, i) {
    // deterministic circular start so layouts are reproducible
    var a = 2 * Math.PI * i / nodes.length;
    n.x = W / 2 + 250 * Math.cos(a); n.y = H / 2 + 250 * Math.sin(a);
    n.vx = 0; n.vy = 0; byId[n.id] = n;
  });
  edges.forEach(function (e) { e.s = byId[e.from]; e.t = byId[e.to]; });

  // barnes-hut-free O(n^2) force pass — schema graphs are tens of nodes
  function step() {
    var i, j, k = 8000, spring = 0.02, rest = 300;
    for (i = 0; i < nodes.length; i++) for (j = i + 1; j < nodes.length; j++) {
      var a = nodes[i], b = nodes[j];
      var dx = b.x - a.x, dy = b.y - a.y, d2 = dx * dx + dy * dy + 0.01, d = Math.sqrt(d2);
      var f = k / d2;
      a.vx -= f * dx / d; a.vy -= f * dy / d; b.vx += f * dx / d; b.vy += f * dy / d;
    }
    edges.forEach(function (e) {
      if (!e.s || !e.t || e.s === e.t) return;
      var dx = e.t.x - e.s.x, dy = e.t.y - e.s.y, d = Math.sqrt(dx * dx + dy * dy) + 0.01;
      var f = spring * (d - rest);
      e.s.vx += f * dx / d; e.s.vy += f * dy / d; e.t.vx -= f * dx / d; e.t.vy -= f * dy / d;
    });
    nodes.forEach(function (n) {
      n.vx += (W / 2 - n.x) * 0.005; n.vy += (H / 2 - n.y) * 0.005;
      if (n !== dragNode) { n.x += n.vx * 0.85; n.y += n.vy * 0.85; }
      n.vx *= 0.6; n.vy *= 0.6;
    });
  }

  var view = { x: 0, y: 0, scale: 1 };
  function nodeBox(n) {
    var lines = n.label.split('\\n');
    ctx.font = '12px sans-serif';
    var w = 0; lines.forEach(function (l) { w = Math.max(w, ctx.measureText(l).width); });
    return { w: w + 16, h: lines.length * 15 + 10 };
  }
  function draw() {
    ctx.clearRect(0, 0, W, H);
    ctx.save(); ctx.translate(view.x, view.y); ctx.scale(view.scale, view.scale);
    ctx.font = '12px sans-serif';
    edges.forEach(function (e) {
      if (!e.s || !e.t) return;
      var mx = (e.s.x + e.t.x) / 2, my = (e.s.y + e.t.y) / 2;
      ctx.strokeStyle = '#848484'; ctx.lineWidth = 2;
      ctx.beginPath(); ctx.moveTo(e.s.x, e.s.y); ctx.lineTo(e.t.x, e.t.y); ctx.stroke();
      var dx = e.t.x - e.s.x, dy = e.t.y - e.s.y, d = Math.sqrt(dx * dx + dy * dy) + 0.01;
      var b = nodeBox(e.t);
      var ax = e.t.x - dx / d * (b.w / 2 + 4), ay = e.t.y - dy / d * (b.h / 2 + 4);
      ctx.fillStyle = '#848484';
      ctx.beginPath();
      ctx.moveTo(ax, ay);
      ctx.lineTo(ax - 10 * dx / d - 4 * dy / d, ay - 10 * dy / d + 4 * dx / d);
      ctx.lineTo(ax - 10 * dx / d + 4 * dy / d, ay - 10 * dy / d - 4 * dx / d);
      ctx.fill();
      ctx.fillStyle = '#555';
      ctx.textAlign = 'center'; ctx.fillText(e.label, mx, my - 4);
    });
    nodes.forEach(function (n) {
      var b = nodeBox(n), lines = n.label.split('\\n');
      ctx.fillStyle = 'lightblue'; ctx.strokeStyle = '#4a7c9b'; ctx.lineWidth = 1;
      ctx.fillRect(n.x - b.w / 2, n.y - b.h / 2, b.w, b.h);
      ctx.strokeRect(n.x - b.w / 2, n.y - b.h / 2, b.w, b.h);
      ctx.fillStyle = 'black'; ctx.textAlign = 'center';
      lines.forEach(function (l, i) {
        ctx.fillText(l, n.x, n.y - b.h / 2 + 15 * (i + 1));
      });
    });
    ctx.restore();
  }

  var iter = 0, maxIter = 250; // stabilization budget, as the reference sets
  function tick() { step(); draw(); if (++iter < maxIter || dragNode) requestAnimationFrame(tick); }
  requestAnimationFrame(tick);

  function toWorld(px, py) {
    return { x: (px - view.x) / view.scale, y: (py - view.y) / view.scale };
  }
  function hit(px, py) {
    var p = toWorld(px, py), found = null;
    nodes.forEach(function (n) {
      var b = nodeBox(n);
      if (Math.abs(p.x - n.x) < b.w / 2 && Math.abs(p.y - n.y) < b.h / 2) found = n;
    });
    if (found) return found;
    var best = null;
    edges.forEach(function (e) {
      if (!e.s || !e.t) return;
      var mx = (e.s.x + e.t.x) / 2, my = (e.s.y + e.t.y) / 2;
      if (Math.abs(p.x - mx) < 40 && Math.abs(p.y - my) < 15) best = e;
    });
    return best;
  }
  var dragNode = null, panning = false, last = null;
  canvas.addEventListener('mousedown', function (ev) {
    var h = hit(ev.offsetX, ev.offsetY);
    if (h && h.id !== undefined) { dragNode = h; iter = 0; requestAnimationFrame(tick); }
    else { panning = true; }
    last = { x: ev.offsetX, y: ev.offsetY };
  });
  canvas.addEventListener('mousemove', function (ev) {
    if (dragNode) {
      var p = toWorld(ev.offsetX, ev.offsetY);
      dragNode.x = p.x; dragNode.y = p.y; draw();
    } else if (panning) {
      view.x += ev.offsetX - last.x; view.y += ev.offsetY - last.y;
      last = { x: ev.offsetX, y: ev.offsetY }; draw();
    } else {
      var h = hit(ev.offsetX, ev.offsetY);
      if (h && h.title) {
        tip.style.display = 'block';
        tip.style.left = (ev.clientX + 12) + 'px';
        tip.style.top = (ev.clientY + 12) + 'px';
        tip.textContent = h.title;
      } else tip.style.display = 'none';
    }
  });
  window.addEventListener('mouseup', function () { dragNode = null; panning = false; });
  canvas.addEventListener('wheel', function (ev) {
    ev.preventDefault();
    var f = ev.deltaY < 0 ? 1.1 : 1 / 1.1;
    var p = toWorld(ev.offsetX, ev.offsetY);
    view.scale *= f;
    view.x = ev.offsetX - p.x * view.scale; view.y = ev.offsetY - p.y * view.scale;
    draw();
  }, { passive: false });
})();
</script>
</body>
</html>
"""
  }
}
