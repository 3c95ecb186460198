package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-label node stores + per-type edge stores — our analogue of the
  * reference's Neo4j database, laid out as Parquet datasets
  * (`graph/nodes/<Label>/`, `graph/edges/<LABEL>/`; SURVEY.md §1.3).
  *
  * At scale each store is a partitioned parquet dataset; a query touching one
  * label scans one directory with full pushdown, never the whole graph.
  */
final case class GraphStore(
    schema: GraphSchema,
    nodes: Map[String, DataFrame],
    edges: Map[String, DataFrame],
    /** Edge labels whose rows are endpoint-validated against the CURRENT
      * node stores (every src/dst key resolves to a stored node, and node
      * stores are key-unique by builder/writer construction). The
      * builder's FK semi-joins establish it; [[GraphWriter]] maintains it
      * per mutation (plain `DELETE` of nodes clears incident labels —
      * dangling edges become possible). The Cypher compiler's MATCH bind
      * site reads it to elide the endpoint node-store join for pattern
      * endpoints the query never references (gated on
      * `graft.cypher.elideUnusedEndpoints`, A/B-pinned by CypherSpec) — at
      * 100 TB that join is a full shuffle of the edge store against a node
      * store, spent validating what the flag already guarantees.
      * Conservative default: stores assembled outside the builder/writer
      * (e.g. [[GraphStore.load]]) start unvalidated and just keep the join.
      */
    validatedEdges: Set[String] = Set.empty,
    /** Labels that have received secondary membership via the Cypher
      * label-mutation write surface (`SET n:Label`, M44): membership is
      * key-linked rows in that label's store, so for THESE labels a
      * `v:Label` predicate on a differently-labeled binding is a per-row
      * key lookup (the compiler's membership lift). For every other label
      * the predicate stays a compile-time constant — nodes of distinct
      * native labels are distinct entities even when key values collide
      * across keyspaces (Customer 7 is not Supplier 7). Conservative like
      * [[validatedEdges]]: [[GraphStore.load]] starts empty, so a
      * reloaded store reverts `v:Label` to the constant fold.
      */
    mutatedLabels: Set[String] = Set.empty) {

  /** Graph statistics report — nodes by label, edges by type (the
    * reference's pre-flight and final count audits, reference:
    * final/inject_relationship.py:927-961,1017-1031). One row per
    * label/type: (kind, name, cnt), totally ordered.
    */
  def describe(spark: SparkSession): DataFrame = {
    val parts =
      nodes.toSeq.map { case (n, df) =>
        df.agg(count(lit(1)).as("cnt")).select(lit("node").as("kind"), lit(n).as("name"), col("cnt"))
      } ++
      edges.toSeq.map { case (n, df) =>
        df.agg(count(lit(1)).as("cnt")).select(lit("edge").as("kind"), lit(n).as("name"), col("cnt"))
      }
    parts.reduce(_.unionByName(_)).orderBy("kind", "name")
  }

  /** The build-once/query-many posture: every node/edge frame persisted
    * (MEMORY_AND_DISK), so repeated queries against the same store don't
    * re-scan or rebuild. Idempotent on already-persisted frames.
    */
  def persisted: GraphStore = copy(
    nodes = nodes.map { case (k, df) =>
      k -> df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    },
    edges = edges.map { case (k, df) =>
      k -> df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })

  /** Row count of edge store `label`, computed once per store INSTANCE and
    * memoized. The Cypher path-strategy gates (local-vs-distributed BFS and
    * walk enumeration) consult edge sizes on every path query; without this
    * the gate itself cost an O(edges) column-pruned scan per query. Safe to
    * memoize because stores are immutable — every write op returns a NEW
    * GraphStore (whose cache starts empty), so staleness is impossible by
    * construction.
    */
  def edgeCount(label: String): Long =
    edgeCounts.computeIfAbsent(label, l => java.lang.Long.valueOf(edges(l).count()))

  @transient private lazy val edgeCounts =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Release the cached blocks of a [[persisted]] store (non-blocking). */
  def unpersistAll(): Unit = {
    nodes.values.foreach(_.unpersist(false))
    edges.values.foreach(_.unpersist(false))
  }

  /** Persist per-label/type Parquet datasets, key-sorted within partitions
    * (the reference sorts before write for locality,
    * final/inject_relationship.py:696, final/inject_node.py:425; for us the
    * payoff is parquet min/max statistics on the keys → row-group pruning
    * for key-range scans at any scale).
    */
  def save(root: String): Unit = {
    nodes.foreach { case (n, df) =>
      df.sortWithinPartitions(schema.node(n).key)
        .write.mode("overwrite").parquet(s"$root/nodes/$n")
    }
    edges.foreach { case (n, df) =>
      val et = schema.edge(n)
      df.sortWithinPartitions(et.keyS, et.keyT)
        .write.mode("overwrite").parquet(s"$root/edges/$n")
    }
  }
}

object GraphStore {
  /** A store with no labels — the starting point for building a graph
    * purely through Cypher write clauses ([[graft.cypher.CypherEngine]]
    * `.execute`) or [[GraphWriter]].
    */
  def empty: GraphStore = GraphStore(GraphSchema(Nil, Nil), Map.empty, Map.empty)

  def load(spark: SparkSession, root: String, schema: GraphSchema): GraphStore =
    GraphStore(
      schema,
      schema.nodes.map(nt => nt.name -> spark.read.parquet(s"$root/nodes/${nt.name}")).toMap,
      schema.edges.map(et => et.label -> spark.read.parquet(s"$root/edges/${et.label}")).toMap)

  /** Per-JVM build-once/query-many cache: the first call under `key` runs
    * `build` and [[GraphStore.persisted persists]] the result; later calls
    * return the same store without rebuilding. The production pattern the
    * reference encodes as a pre-injected database (inject once, query
    * many — final/app.py's upload→inject→query flow): within one JVM the
    * persisted frames play that role, across JVMs [[save]]/[[load]] do.
    * Safe to share because stores are immutable — every write op returns
    * a NEW GraphStore over new frames, never mutating the cached one.
    */
  def cached(key: String)(build: => GraphStore): GraphStore =
    storeCache.computeIfAbsent(key, _ => build.persisted)

  /** Drop one cached store (releasing its blocks), or all with no key. */
  def evict(key: String = null): Unit =
    if (key == null) {
      storeCache.values.forEach(_.unpersistAll())
      storeCache.clear()
    } else Option(storeCache.remove(key)).foreach(_.unpersistAll())

  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[String, GraphStore]()
}
