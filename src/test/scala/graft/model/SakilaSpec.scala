package graft.model

import graft.SparkSpec
import graft.cypher.CypherEngine
import graft.graph.GraphBuilder
import graft.sources.Csv

/** Modeling-breadth test on the reference's 16-table Sakila fixture
  * (FIXTURES.md §A3): a real FK web with junction tables (film_actor,
  * film_category), self-contained dimension chains
  * (country←city←address←customer/store/staff) and a staff↔store cycle.
  * No committed golden outputs — assertions pin structure + row counts.
  */
class SakilaSpec extends SparkSpec {

  private val dir = "/root/reference/final/sqlite-sakila_files"
  private val tables = Seq("actor", "address", "category", "city", "country",
    "customer", "film", "film_actor", "film_category", "film_text",
    "inventory", "language", "payment", "rental", "staff", "store")

  // PK/FK registry as sqlite-sakila declares it (PRAGMA metadata)
  private val pks = Map(
    "actor" -> Seq("actor_id"), "address" -> Seq("address_id"),
    "category" -> Seq("category_id"), "city" -> Seq("city_id"),
    "country" -> Seq("country_id"), "customer" -> Seq("customer_id"),
    "film" -> Seq("film_id"), "film_actor" -> Seq("actor_id", "film_id"),
    "film_category" -> Seq("film_id", "category_id"), "film_text" -> Seq("film_id"),
    "inventory" -> Seq("inventory_id"), "language" -> Seq("language_id"),
    "payment" -> Seq("payment_id"), "rental" -> Seq("rental_id"),
    "staff" -> Seq("staff_id"), "store" -> Seq("store_id"))

  private def fk(from: String, table: String, to: String) = ForeignKey(from, table, to)
  private val fks = Map(
    "address" -> Seq(fk("city_id", "city", "city_id")),
    "city" -> Seq(fk("country_id", "country", "country_id")),
    "customer" -> Seq(fk("address_id", "address", "address_id"), fk("store_id", "store", "store_id")),
    "film" -> Seq(fk("language_id", "language", "language_id")),
    "film_actor" -> Seq(fk("actor_id", "actor", "actor_id"), fk("film_id", "film", "film_id")),
    "film_category" -> Seq(fk("film_id", "film", "film_id"), fk("category_id", "category", "category_id")),
    "inventory" -> Seq(fk("film_id", "film", "film_id"), fk("store_id", "store", "store_id")),
    "payment" -> Seq(fk("customer_id", "customer", "customer_id"), fk("staff_id", "staff", "staff_id"),
      fk("rental_id", "rental", "rental_id")),
    "rental" -> Seq(fk("inventory_id", "inventory", "inventory_id"),
      fk("customer_id", "customer", "customer_id"), fk("staff_id", "staff", "staff_id")),
    "staff" -> Seq(fk("address_id", "address", "address_id"), fk("store_id", "store", "store_id")),
    "store" -> Seq(fk("manager_staff_id", "staff", "staff_id"), fk("address_id", "address", "address_id")))

  private lazy val catalog =
    Csv.catalogFromHeaders(spark, dir, tables, pks, fks,
      types = Map("payment" -> Map("amount" -> "DECIMAL")))

  test("sakila models: junctions detected, entities kept, labels unique") {
    val schema = Modeler.model(catalog)
    // film_actor/film_category are pure junctions; inventory has 2 FKs but
    // its own PK → entity; payment/rental have ≥2 FKs but own PKs → entities
    assert(schema.edges.exists(_.label == "FILM_ACTOR"))
    assert(schema.edges.exists(_.label == "FILM_CATEGORY"))
    assert(schema.nodes.exists(_.name == "Inventory"))
    assert(schema.nodes.exists(_.name == "Payment"))
    assert(schema.nodes.exists(_.name == "Rental"))
    assert(!schema.nodes.exists(_.name == "Film_actor"))
    // film + film_text share PK film_id (same declared type) → ONE Film
    // node sourced from both tables (the reference's LLM merges split
    // entities the same way, final/inject_node.py:390-403)
    val film = schema.node("Film")
    assert(film.tables == Seq("film", "film_text"))
    assert(!schema.nodes.exists(_.name == "Film_text"))
    assert(film.properties.contains("language_id")) // from film
    assert(film.key == "film_id")
    // every label unique
    val labels = schema.edges.map(_.label)
    assert(labels.distinct.size == labels.size)
    // FK chain address→city→country became edges
    assert(schema.edges.exists(e => e.src == "Addres" || e.src == "Address"))
  }

  test("sakila graph builds and answers a 2-junction cypher query") {
    val (loaded, _) = Csv.loadCatalog(spark, dir, catalog)
    val schema = Modeler.model(catalog)
    val store = GraphBuilder.buildAll(loaded(_), schema)
    // every node store non-empty — including the merged Film node, whose
    // film_text member ships header-only in the fixture (outer merge keeps
    // the film rows and null-pads the missing film_text columns)
    schema.nodes.foreach { nt =>
      assert(store.nodes(nt.name).limit(1).count() == 1, s"empty node store ${nt.name}")
    }
    // actors per category via the two junction edges through Film
    val rows = CypherEngine(store).run(
      """MATCH (a:Actor)<-[:FILM_ACTOR]-(f:Film)-[:FILM_CATEGORY]->(c:Category)
        RETURN c.name AS category, count(a) AS appearances
        ORDER BY appearances DESC, category LIMIT 5""").collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getLong(1) > 0))
  }
}
