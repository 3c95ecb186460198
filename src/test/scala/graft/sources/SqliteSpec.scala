package graft.sources

import graft.SparkSpec
import graft.cypher.CypherEngine
import graft.graph.GraphBuilder
import graft.model.Modeler

/** Native SQLite reader tests against the reference's own databases,
  * cross-checked row-for-row with its committed CSV exports of the same
  * data (reference: final/bike.sqlite vs the final/bike_files CSVs).
  */
class SqliteSpec extends SparkSpec {

  private lazy val bike = Sqlite.read(spark, "/root/reference/final/bike.sqlite")

  test("discovers all tables with row counts matching the CSV exports") {
    val expected = Map(
      "brands" -> 9L, "categories" -> 7L, "customers" -> 1445L, "orders" -> 1615L,
      "order_items" -> 4722L, "products" -> 321L, "staffs" -> 10L,
      "stocks" -> 939L, "stores" -> 3L)
    assert(bike.tables.keySet == expected.keySet)
    expected.foreach { case (t, n) => assert(bike.tables(t).count() == n, t) }
  }

  test("catalog introspection: PKs and FKs match the declared schema") {
    val orders = bike.catalog.table("orders")
    assert(orders.primaryKeys == Seq("order_id"))
    assert(orders.foreignKeys.map(fk => (fk.from, fk.table, fk.to)).toSet == Set(
      ("customer_id", "customers", "customer_id"),
      ("store_id", "stores", "store_id"),
      ("staff_id", "staffs", "staff_id")))
    val items = bike.catalog.table("order_items")
    assert(items.primaryKeys == Seq("order_id", "item_id"))
    assert(items.foreignKeys.size == 2)
    assert(bike.catalog.table("staffs").foreignKeys
      .exists(fk => fk.from == "manager_id" && fk.table == "staffs"))
  }

  test("values match the CSV export byte-for-byte on a whole table") {
    import org.apache.spark.sql.functions._
    val viaSqlite = bike.tables("products")
      .orderBy("product_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    val viaCsv = Csv.read(spark, "/root/reference/final/bike_files/products.csv")
      .select(col("product_id").cast("long"), col("product_name"),
        col("brand_id").cast("long"), col("category_id").cast("long"),
        col("model_year").cast("long"), col("list_price").cast("double"))
      .orderBy("product_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(viaSqlite.toSeq == viaCsv.toSeq)
  }

  test("golden: full pipeline straight from the .sqlite file") {
    // the reference's actual flow: upload .sqlite → introspect → model →
    // build → query; revenue/year must reproduce the notebook's values
    val schema = Modeler.model(bike.catalog)
    val store = GraphBuilder.buildAll(bike.tables(_), schema)
    val rows = CypherEngine(store).run(
      """MATCH (o:Order)-[ci:ORDER_ITEMS]->(p:Product)
        WITH year(date(o.order_date)) AS yr, sum(ci.list_price * ci.quantity * (1 - ci.discount)) AS revenue
        RETURN yr, revenue ORDER BY yr""").collect()
    val got = rows.map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = Map(2016 -> 2427378.5276, 2017 -> 3447208.2425, 2018 -> 1814529.7875)
    assert(got.keySet == want.keySet)
    want.foreach { case (y, v) => assert(math.abs(got(y) - v) < 0.01, s"$y: ${got(y)} vs $v") }
  }

  test("edge cases: overflow pages, blobs, rowid gaps, interior b-trees") {
    val db = Sqlite.read(spark, "src/test/resources/edgecases.sqlite")
    val rows = db.tables("mixed").orderBy("id").collect()
    assert(rows.length == 203) // 3 kept specials + 200 bulk (one deleted)
    val r1 = rows.find(_.getLong(0) == 1L).get
    assert(r1.getString(1).length == 9003 && r1.getString(1).endsWith("END")) // overflow chain
    assert(r1.getDouble(2) == 3.14159)
    assert(r1.getLong(3) == -42L) // negative int
    assert(r1.getAs[Array[Byte]](4).length == 256)
    assert(r1.isNullAt(5))
    val r7 = rows.find(_.getLong(0) == 7L).get
    assert(r7.getLong(3) == (1L << 40)) // 48-bit serial int
    assert(r7.getAs[Array[Byte]](4).isEmpty)
    assert(!rows.exists(_.getLong(0) == 3L)) // deleted row really gone
    assert(rows.find(_.getLong(0) == 9L).get.getDouble(2) == 1e308)
    // WITHOUT ROWID tables are skipped with a clear reason, not garbage —
    // and don't sink the rest of the upload
    assert(!db.tables.contains("norowid"))
    assert(db.skipped("norowid").contains("WITHOUT ROWID"))
  }

  test("virtual tables are skipped with a reason; the rest of the db reads") {
    // fts5 virtual table: type='table' in sqlite_master with rootpage 0 —
    // walking it would compute a negative page offset, and its DDL has no
    // column list. It must degrade to a skipped entry, not sink the upload.
    val db = Sqlite.read(spark, "src/test/resources/virtual.sqlite")
    assert(!db.tables.contains("ft"))
    assert(db.skipped("ft").contains("virtual table"))
    val plain = db.tables("plain").orderBy("id").collect()
    assert(plain.map(_.getString(1)).toSeq == Seq("hello world", "spark engine"))
    // fts5's real shadow tables still read (or skip individually) without
    // affecting plain tables
    assert(db.tables.contains("ft_config") || db.skipped.contains("ft_config"))
  }

  test("sales_master database reads and models too") {
    val sales = Sqlite.read(spark, "/root/reference/final/sales_master.sqlite")
    assert(sales.tables.keySet == Set(
      "customer_table", "order_table", "product_table", "order_product_table"))
    val schema = Modeler.model(sales.catalog)
    assert(schema.edges.exists(_.label == "ORDER_PRODUCT"))
    assert(sales.tables("order_product_table").count() == 2823L)
  }
}
