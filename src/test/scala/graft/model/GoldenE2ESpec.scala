package graft.model

import graft.SparkSpec
import graft.cypher.CypherEngine
import graft.graph.GraphBuilder
import graft.sources.Csv

/** Golden end-to-end tests replicating the reference's own recorded runs
  * (SURVEY.md §5.1-5.2): ingest its committed fixture CSVs (read-only at
  * /root/reference/final/), model the graph deterministically, build it,
  * and run the notebooks' flagship queries through the Cypher compiler —
  * asserting the values the notebooks recorded.
  *
  * Goldens:
  *  - bike store revenue/year (final/experimenting_new/notebook1.ipynb:836-844):
  *    2016 → 2427378.5276, 2017 → 3447208.2425, 2018 → 1814529.7875
  *  - sales_master SALES/year (final/experimenting_new/rca.ipynb:346-354):
  *    2003 → 3,516,979.54; 2004 → 4,724,162.60; 2005 → 1,791,486.71
  */
class GoldenE2ESpec extends SparkSpec {

  // FK/PK registries as SQLite's PRAGMA introspection reports them for the
  // fixture databases (metadata, declared here since the engine ingests the
  // CSV exports, not the .sqlite files).
  private val bikeCatalog = RelationalCatalog(Seq(
    TableDef("brands",
      Seq(ColumnDef("brand_id", "INTEGER"), ColumnDef("brand_name", "TEXT")),
      primaryKeys = Seq("brand_id")),
    TableDef("categories",
      Seq(ColumnDef("category_id", "INTEGER"), ColumnDef("category_name", "TEXT")),
      primaryKeys = Seq("category_id")),
    TableDef("customers",
      Seq("customer_id" -> "INTEGER", "first_name" -> "TEXT", "last_name" -> "TEXT",
        "phone" -> "TEXT", "email" -> "TEXT", "street" -> "TEXT", "city" -> "TEXT",
        "state" -> "TEXT", "zip_code" -> "TEXT").map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("customer_id")),
    TableDef("orders",
      Seq("order_id" -> "INTEGER", "customer_id" -> "INTEGER", "order_status" -> "INTEGER",
        "order_date" -> "DATE", "required_date" -> "DATE", "shipped_date" -> "DATE",
        "store_id" -> "INTEGER", "staff_id" -> "INTEGER").map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("order_id"),
      foreignKeys = Seq(
        ForeignKey("customer_id", "customers", "customer_id"),
        ForeignKey("store_id", "stores", "store_id"),
        ForeignKey("staff_id", "staffs", "staff_id"))),
    TableDef("order_items",
      Seq("order_id" -> "INTEGER", "item_id" -> "INTEGER", "product_id" -> "INTEGER",
        "quantity" -> "INTEGER", "list_price" -> "DECIMAL", "discount" -> "DECIMAL")
        .map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("order_id", "item_id"),
      foreignKeys = Seq(
        ForeignKey("order_id", "orders", "order_id"),
        ForeignKey("product_id", "products", "product_id"))),
    TableDef("products",
      Seq("product_id" -> "INTEGER", "product_name" -> "TEXT", "brand_id" -> "INTEGER",
        "category_id" -> "INTEGER", "model_year" -> "INTEGER", "list_price" -> "DECIMAL")
        .map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("product_id"),
      foreignKeys = Seq(
        ForeignKey("brand_id", "brands", "brand_id"),
        ForeignKey("category_id", "categories", "category_id"))),
    TableDef("staffs",
      Seq("staff_id" -> "INTEGER", "first_name" -> "TEXT", "last_name" -> "TEXT",
        "email" -> "TEXT", "phone" -> "TEXT", "active" -> "INTEGER",
        "store_id" -> "INTEGER", "manager_id" -> "INTEGER").map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("staff_id"),
      foreignKeys = Seq(
        ForeignKey("store_id", "stores", "store_id"),
        ForeignKey("manager_id", "staffs", "staff_id"))),
    TableDef("stocks",
      Seq("store_id" -> "INTEGER", "product_id" -> "INTEGER", "quantity" -> "INTEGER")
        .map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("store_id", "product_id"),
      foreignKeys = Seq(
        ForeignKey("store_id", "stores", "store_id"),
        ForeignKey("product_id", "products", "product_id"))),
    TableDef("stores",
      Seq("store_id" -> "INTEGER", "store_name" -> "TEXT", "phone" -> "TEXT",
        "email" -> "TEXT", "street" -> "TEXT", "city" -> "TEXT", "state" -> "TEXT",
        "zip_code" -> "TEXT").map((ColumnDef.apply _).tupled),
      primaryKeys = Seq("store_id"))))

  private val salesCatalog = TestCatalogs.salesCatalog

  test("modeler: bike junction/entity split and edge shapes") {
    val schema = Modeler.model(bikeCatalog)
    assert(schema.nodes.map(_.name).toSet ==
      Set("Brand", "Categorie", "Customer", "Order", "Product", "Staff", "Store"))
    // junctions became edges with properties
    val items = schema.edge("ORDER_ITEMS")
    assert(items.src == "Order" && items.dst == "Product")
    assert(items.properties.toSet == Set("item_id", "quantity", "list_price", "discount"))
    val stocks = schema.edge("STOCKS")
    assert(stocks.src == "Store" && stocks.dst == "Product")
    // FK edges exist and are unique, incl. the staffs self-reference
    assert(schema.edge("STAFFS_HAS_MANAGER").dst == "Staff")
    assert(schema.edge("ORDERS_HAS_CUSTOMER").src == "Order")
  }

  test("golden: bike store revenue per year through the full pipeline") {
    val dir = "/root/reference/final/bike_files"
    val (tables, repl) = Csv.loadCatalog(spark, dir, bikeCatalog)
    // timestamp expansion recorded and visible to the catalog
    assert(repl("orders")("order_date").contains("order_date_year"))
    val schema = Modeler.model(bikeCatalog.withReplacements(repl))
    val store = GraphBuilder.buildAll(tables(_), schema)
    val rows = CypherEngine(store).run(
      """MATCH (o:Order)-[ci:ORDER_ITEMS]->(p:Product)
        WITH o.order_date_year AS year, sum(ci.list_price * ci.quantity * (1 - ci.discount)) AS revenue
        RETURN year, revenue ORDER BY year""").collect()
    val got = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Map(2016L -> 2427378.5276, 2017L -> 3447208.2425, 2018L -> 1814529.7875)
    assert(got.keySet == want.keySet)
    want.foreach { case (y, v) => assert(math.abs(got(y) - v) < 0.01, s"year $y: ${got(y)} vs $v") }
  }

  test("golden: notebook's recorded flagship Cypher runs VERBATIM") {
    // The exact query string the reference's text2cypher run recorded
    // (final/experimenting_new/notebook1.ipynb:844) — binds `order` (a
    // keyword) as a variable and spells the year extraction
    // `date(order.order_date).year`. The graph it ran against kept the raw
    // date property, so load with order_date as TEXT (explicit-catalog
    // surface) and name the junction edge CONTAINS_ITEM as the notebook's
    // LLM modeling pass did.
    import graft.graph.{EdgeType, GraphSchema, NodeType}
    val dir = "/root/reference/final/bike_files"
    val cat = RelationalCatalog(Seq(
      TableDef("orders",
        Seq("order_id" -> "INTEGER", "customer_id" -> "INTEGER",
          "order_status" -> "INTEGER", "order_date" -> "TEXT")
          .map((ColumnDef.apply _).tupled),
        primaryKeys = Seq("order_id")),
      TableDef("order_items",
        Seq("order_id" -> "INTEGER", "item_id" -> "INTEGER", "product_id" -> "INTEGER",
          "quantity" -> "INTEGER", "list_price" -> "DECIMAL", "discount" -> "DECIMAL")
          .map((ColumnDef.apply _).tupled),
        primaryKeys = Seq("order_id", "item_id")),
      TableDef("products",
        Seq("product_id" -> "INTEGER", "product_name" -> "TEXT")
          .map((ColumnDef.apply _).tupled),
        primaryKeys = Seq("product_id"))))
    val (tables, _) = Csv.loadCatalog(spark, dir, cat)
    val schema = GraphSchema(
      nodes = Seq(
        NodeType("Order", "order_id", Seq("order_date"), Seq("orders"), keyUnique = true),
        NodeType("Product", "product_id", Seq("product_name"), Seq("products"), keyUnique = true)),
      edges = Seq(
        EdgeType("CONTAINS_ITEM", "Order", "Product", "order_id", "product_id",
          Seq("quantity", "list_price", "discount"), "order_items")))
    val store = GraphBuilder.buildAll(tables(_), schema)
    val verbatim =
      "MATCH (order:Order)-[ci:CONTAINS_ITEM]->(product:Product)\n" +
        "WITH toString(date(order.order_date).year) AS year, " +
        "SUM((ci.list_price * ci.quantity) * (1 - ci.discount)) AS revenue\n" +
        "RETURN year, revenue\nORDER BY year"
    val rows = CypherEngine(store).run(verbatim).collect()
    val got = rows.map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Map("2016" -> 2427378.5276, "2017" -> 3447208.2425, "2018" -> 1814529.7875)
    assert(got.keySet == want.keySet)
    want.foreach { case (y, v) => assert(math.abs(got(y) - v) < 0.01, s"year $y: ${got(y)} vs $v") }
  }

  test("golden: sales_master SALES per year (RCA notebook values)") {
    val dir = "/root/reference/final/sales_master_files"
    val (tables, _) = Csv.loadCatalog(spark, dir, salesCatalog)
    val schema = Modeler.model(salesCatalog)
    val store = GraphBuilder.buildAll(tables(_), schema)
    val engine = CypherEngine(store)
    val want = Map(2003L -> 3516979.54, 2004L -> 4724162.60, 2005L -> 1791486.71)
    want.foreach { case (year, v) =>
      val got = engine.run(
        s"""MATCH (o:Order)-[c:ORDER_PRODUCT]->(p:Product)
           WHERE o.YEAR_ID = $year
           RETURN sum(c.SALES) AS total""").collect().head.getDouble(0)
      assert(math.abs(got - v) < 0.01, s"year $year: $got vs $v")
    }
  }

  test("ERD text + DOT + schema JSON emitters render the catalog") {
    val erd = bikeCatalog.erdText
    assert(erd.contains("Table: orders"))
    assert(erd.contains("Primary Key: order_id"))
    assert(erd.contains("customer_id -> customers.customer_id"))
    val dot = bikeCatalog.erdDot
    assert(dot.startsWith("digraph ERD {"))
    assert(dot.contains("orders -> customers"))
    val json = Modeler.schemaJson(Modeler.model(bikeCatalog))
    assert(json.contains(""""from": "Order""""))
    // must be machine-parseable
    assert(json.trim.startsWith("{") && json.trim.endsWith("}"))
  }

  test("schema HTML emitter: self-contained interactive page (pyvis parity)") {
    val schema = Modeler.model(bikeCatalog)
    val html = Modeler.schemaHtml(schema)
    assert(html.startsWith("<!DOCTYPE html>"))
    // self-contained: no external scripts, stylesheets, or network fetches
    assert(!html.contains("<script src") && !html.contains("<link") &&
      !html.contains("http://") && !html.contains("https://"))
    // every node type is a box labeled name + PK (reference final/graph.py:17-21)
    schema.nodes.foreach { n =>
      assert(html.contains(n.name), s"node ${n.name} missing")
      assert(html.contains(s"PK: ${n.key}"), s"PK line for ${n.name} missing")
    }
    // every edge label present; tooltip carries keyS → keyT (graph.py:37)
    schema.edges.foreach { e =>
      assert(html.contains(e.label), s"edge ${e.label} missing")
      assert(html.contains(s"${e.keyS} \\u2192 ${e.keyT}") ||
        html.contains(s"${e.keyS} → ${e.keyT}"), s"key tooltip for ${e.label} missing")
    }
    // interaction surface: drag, pan, zoom, hover tooltip handlers exist
    Seq("mousedown", "mousemove", "wheel", "requestAnimationFrame").foreach { h =>
      assert(html.contains(h), s"handler $h missing")
    }
    // the embedded JSON must not break out of its script context
    assert(!html.replace("<script", "").replace("</script", "").contains("<scr"))

    // hostile names: \r and the JS line separators U+2028/U+2029 terminate
    // a JS string literal just like \n — they must reach the page escaped
    import graft.graph.{EdgeType, GraphSchema, NodeType}
    val hostile = Modeler.schemaHtml(GraphSchema(
      Seq(NodeType("Bad\rName", "k ey", Seq("p rop"), Seq("t\nbl"))),
      Seq(EdgeType("E\rdge", "Bad\rName", "Bad\rName", "k", "k"))))
    Seq("\r", " ", " ").foreach { c =>
      assert(!hostile.contains(c), s"raw ${c.map(_.toInt)} must not reach the page")
    }
    assert(hostile.contains("\\r") && hostile.contains("\\u2028") &&
      hostile.contains("\\u2029"))
  }

  test("csv normalization: coerce-to-null and blob/string passthrough") {
    import spark.implicits._
    val raw = Seq(("1", "x", "2020-05-06 07:08:09"), ("oops", "y", "not-a-date"))
      .toDF("n", "s", "d")
    val t = TableDef("t", Seq(ColumnDef("n", "INTEGER"), ColumnDef("s", "TEXT"),
      ColumnDef("d", "TIMESTAMP")))
    val norm = Csv.normalize(raw, t)
    val rows = norm.df.orderBy("s").collect()
    assert(norm.replacements("d") == Seq("d_year", "d_month", "d_day", "d_hour", "d_minute", "d_second"))
    assert(rows(0).getLong(0) == 1L)
    assert(rows(0).getLong(rows(0).fieldIndex("d_year")) == 2020L)
    assert(rows(0).getLong(rows(0).fieldIndex("d_second")) == 9L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("n"))) // coerce-to-null
    assert(rows(1).isNullAt(rows(1).fieldIndex("d_year")))
  }
}
