package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphBuilderSpec extends SparkSpec {

  import spark.implicits._

  private def tables(m: Map[String, DataFrame]): String => DataFrame = m(_)

  test("node build: multi-table outer merge keeps left copy on column conflict") {
    // reference semantics: _dup-suffix columns dropped after outer merge
    // (final/inject_node.py:399-403)
    val a = Seq((1L, "a1"), (2L, "a2")).toDF("k", "name")
    val b = Seq((2L, "b2", 20L), (3L, "b3", 30L)).toDF("k", "name", "extra")
    val nt = NodeType("T", "k", Seq("name", "extra"), Seq("a", "b"))
    val out = GraphBuilder.buildNodes(tables(Map("a" -> a, "b" -> b)), nt)
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // key 2 exists in both: left (a) copy of `name` wins
    assert(out(1).getString(1) == "a2")
    // key 3 only in b: its `name` lived in the dropped right-side copy, so
    // it is null — exactly the reference's `_dup`-drop outcome
    // (final/inject_node.py:399-403); `extra` (b-only column) survives
    assert(out(2).isNullAt(1))
    assert(out(2).getLong(2) == 30L)
    assert(out(0).isNullAt(2))
  }

  test("modeler-driven multi-table node: same PK name+type merges via J1 path") {
    import graft.model.{ColumnDef, ForeignKey, RelationalCatalog, TableDef}
    import graft.model.Modeler
    // users + user_profiles share single PK user_id INTEGER → one User node
    val cat = RelationalCatalog(Seq(
      TableDef("users",
        Seq(ColumnDef("user_id", "INTEGER"), ColumnDef("name", "TEXT")),
        primaryKeys = Seq("user_id")),
      TableDef("user_profiles",
        Seq(ColumnDef("user_id", "INTEGER"), ColumnDef("bio", "TEXT")),
        primaryKeys = Seq("user_id")),
      TableDef("events",
        Seq(ColumnDef("event_id", "INTEGER"), ColumnDef("user_id", "INTEGER")),
        primaryKeys = Seq("event_id"),
        foreignKeys = Seq(ForeignKey("user_id", "users", "user_id")))))
    val schema = Modeler.model(cat)
    val user = schema.node("User")
    assert(user.tables == Seq("users", "user_profiles"))
    assert(user.key == "user_id")
    assert(user.properties.toSet == Set("name", "bio"))
    assert(!schema.nodes.exists(n => n.name == "User_profile"))
    // FK from events resolves to the MERGED node
    assert(schema.edge("EVENTS_HAS_USER").dst == "User")
    // build: outer merge + null padding across the two member tables
    val users = Seq((1L, "ann"), (2L, "bo")).toDF("user_id", "name")
    val profiles = Seq((2L, "likes spark"), (3L, "likes ducks")).toDF("user_id", "bio")
    val events = Seq((10L, 1L)).toDF("event_id", "user_id")
    val store = GraphBuilder.buildAll(
      tables(Map("users" -> users, "user_profiles" -> profiles, "events" -> events)), schema)
    val rows = store.nodes("User").orderBy("user_id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) == "ann" && rows(0).isNullAt(2)) // no profile
    assert(rows(1).getString(1) == "bo" && rows(1).getString(2) == "likes spark")
    assert(rows(2).isNullAt(1) && rows(2).getString(2) == "likes ducks") // profile-only
  }

  test("modeler skips FK edges declared against a non-key target column") {
    import graft.model.{ColumnDef, ForeignKey, RelationalCatalog, TableDef}
    import graft.model.Modeler
    // orders references customers.email (UNIQUE but not the PK): joining it
    // against customer_id would silently drop every edge — skip instead
    val cat = RelationalCatalog(Seq(
      TableDef("customers",
        Seq(ColumnDef("customer_id", "INTEGER"), ColumnDef("email", "TEXT")),
        primaryKeys = Seq("customer_id")),
      TableDef("orders",
        Seq(ColumnDef("order_id", "INTEGER"), ColumnDef("cust_email", "TEXT")),
        primaryKeys = Seq("order_id"),
        foreignKeys = Seq(ForeignKey("cust_email", "customers", "email")))))
    val schema = Modeler.model(cat)
    assert(schema.nodes.map(_.name).toSet == Set("Customer", "Order"))
    assert(schema.edges.isEmpty, schema.edges.map(_.label).mkString(","))
  }

  test("node build: last-wins dedup is deterministic and drops null keys") {
    val t = Seq(
      (Some(1L), "x", 5L), (Some(1L), "y", 9L), // dup key: max-prop row wins
      (None, "z", 1L) // null key dropped
    ).toDF("k", "name", "v")
    val nt = NodeType("T", "k", Seq("name", "v"), Seq("t"))
    val out = GraphBuilder.buildNodes(tables(Map("t" -> t)), nt).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "y") // desc_nulls_last ordering on props
  }

  test("edge build: null keys, duplicate pairs and dangling FKs dropped") {
    val edges = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(10L)), // dup pair → 1
      (Some(2L), None), // null dst → dropped
      (Some(9L), Some(10L)), // dangling src → dropped (MATCH semantics,
      // reference: final/inject_relationship.py:636-644)
      (Some(2L), Some(11L))).toDF("s", "d")
    val src = Seq(1L, 2L).toDF("sk")
    val dst = Seq(10L, 11L).toDF("dk")
    val et = EdgeType("E", "S", "D", "s", "d", Nil, "e")
    val out = GraphBuilder.buildEdges(tables(Map("e" -> edges)), et, src, dst, "sk", "dk")
      .orderBy("s", "d").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 10L), (2L, 11L)))
  }

  test("edge dedup with properties is deterministic under partitioning") {
    val src = Seq(1L).toDF("sk")
    val dst = Seq(10L).toDF("dk")
    val et = EdgeType("E", "S", "D", "s", "d", Seq("w"), "e")
    def build(rows: Seq[(Long, Long, Long)], parts: Int) =
      GraphBuilder.buildEdges(
        tables(Map("e" -> rows.toDF("s", "d", "w").repartition(parts))),
        et, src, dst, "sk", "dk").collect().toSeq
    val rows = Seq((1L, 10L, 5L), (1L, 10L, 9L), (1L, 10L, 2L))
    val a = build(rows, 1)
    val b = build(rows.reverse, 5)
    assert(a == b)
    assert(a.head.getLong(2) == 9L) // max property wins (desc_nulls_last)
  }

  test("edge metrics report input/cleaned/committed/dropped counts") {
    val edges = Seq(
      (Some(1L), Some(10L)), (Some(1L), Some(10L)), // dup pair
      (Some(2L), None), // null dst
      (Some(9L), Some(10L)), // dangling src
      (Some(2L), Some(11L))).toDF("s", "d")
    val src = Seq(1L, 2L).toDF("sk")
    val dst = Seq(10L, 11L).toDF("dk")
    val et = EdgeType("E", "S", "D", "s", "d", Nil, "e")
    val t = tables(Map("e" -> edges))
    val built = GraphBuilder.buildEdges(t, et, src, dst, "sk", "dk")
    val m = GraphBuilder.edgeMetrics(t, et, built)
    assert(m == GraphBuilder.EdgeMetrics(input = 5, afterClean = 3, committed = 2))
    assert(m.dropped == 1) // the dangling (9,10) edge
  }

  test("graph store describe counts nodes and edges per label") {
    val dir = "/root/testdata/sf0.001"
    val store = GraphBuilder.buildAll(spark, dir)
    val stats = store.describe(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toMap2
    assert(stats(("node", "Region")) == 5L)
    assert(stats(("edge", "IN_REGION")) == 25L)
    assert(stats.keys.count(_._1 == "node") == 6)
    assert(stats.keys.count(_._1 == "edge") == 5)
  }

  private implicit class Tup3Ops(rows: Array[(String, String, Long)]) {
    def toMap2: Map[(String, String), Long] =
      rows.map { case (a, b, c) => ((a, b), c) }.toMap
  }

  test("edgeCount memoizes per store instance; derived stores recount") {
    val store = GraphBuilder.buildAll(spark, "/root/testdata/sf0.001")
    val et = store.schema.edges.head.label
    val direct = store.edges(et).count()
    assert(store.edgeCount(et) == direct)
    // memoized: the second read returns the same value without a job —
    // pin via value equality after dropping the frame's blocks (a recount
    // would still agree, so additionally pin identity via timing-free
    // proxy: a store copy must NOT share the memo)
    assert(store.edgeCount(et) == direct)
    val derived = store.copy()
    assert(derived.edgeCount(et) == direct) // fresh cache, fresh count, same value
    intercept[NoSuchElementException](store.edgeCount("NO_SUCH_EDGE_TYPE"))
  }

  test("openOrBuild loads a saved store when the root has one, builds otherwise") {
    // the deployment ingest split (r17 verdict #1): SaveStore persists the
    // built graph once; query sessions with SPARK_GRAFT_STORE_ROOT load it.
    // Loaded and built stores must agree row-for-row, and a root WITHOUT a
    // manifest for this SF must fall back to the build path.
    val dir = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("graft-store").toString
    val built = GraphBuilder.buildAll(spark, dir)
    built.save(s"$root/sf0.001")
    val loaded = GraphBuilder.openOrBuild(spark, dir, storeRoot = Some(root))
    assert(loaded.schema == built.schema)
    assert(loaded.validatedEdges == built.validatedEdges)
    for (n <- built.nodes.keys) {
      val key = built.schema.node(n).key
      assert(loaded.nodes(n).orderBy(key).collect().toSeq ==
        built.nodes(n).orderBy(key).collect().toSeq, s"node store $n")
    }
    for (e <- built.edges.keys)
      assert(loaded.edges(e).count() == built.edges(e).count(), s"edge store $e")
    // no manifest for this SF under the root → build path (not an error)
    val other = GraphBuilder.openOrBuild(spark, dir,
      storeRoot = Some(s"$root/empty-subdir"))
    assert(other.nodes("Region").count() == 5)
  }
}
