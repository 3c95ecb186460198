package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
      * (e.g. [[GraphStore.load]] without saved metadata) start unvalidated
      * and just keep the join.
      */
    validatedEdges: Set[String] = Set.empty,
    /** Secondary label membership (`SET n:Label`, M44) as PROVENANCE rows,
      * keyed `(targetLabel, sourceLabel)` → a one-column frame `__m_key`
      * (the member node's SOURCE key rendered as a string), deduped.
      *
      * The target label's node store is NEVER touched by label mutation:
      * members materialize at MATCH time by joining the membership keys
      * back to the LIVE source store (so later property updates and node
      * deletions on the source are visible through the secondary label,
      * like Neo4j's one-node-many-labels), and a `v:Label` membership
      * predicate joins only the `(Label, v's label)` frame — scoped by
      * source, so key-value collisions with the target's own keyspace or
      * with OTHER labels' keyspaces can neither corrupt target rows nor
      * fabricate memberships (r12 ADVICE: the previous design upserted
      * rows INTO the target store, silently overwriting/deleting genuine
      * native nodes on key collisions). Labels never mutated keep the
      * compile-time constant fold: nodes of distinct native labels are
      * distinct entities even when key values collide (Customer 7 is not
      * Supplier 7).
      *
      * Scale posture: membership frames hold only keys of explicitly
      * SET-mutated rows — broadcastable in practice, and every consumer
      * joins them by key (no driver collect).
      */
    memberships: Map[(String, String), DataFrame] = Map.empty) {

  /** Labels that currently hold secondary membership rows (the compiler's
    * lift gate; empty for every store the write surface never mutated).
    */
  def mutatedLabels: Set[String] = memberships.keysIterator.map(_._1).toSet

  /** Key-rendering collision audit frame for membership pair `(t, s)`
    * (§2.15 deviation 2, r15: silent → surfaced): one `__t_key` row per
    * member of the pair whose key, rendered into `t`'s keyspace, equals
    * the key of a NATIVE `t` node. In Neo4j the member and the native node
    * are distinct entities; here both match a `(n:t {key})` pattern and
    * the member can reach the native node's edges through key joins —
    * a documented deviation that is exact whenever no collision exists.
    * This frame makes the collision case COUNTABLE: [[describe]] reports
    * it per pair, and the write surface publishes it at SET-label time,
    * so a user whose integer-keyed tables share id ranges finds out
    * instead of silently double-matching. Cost: one semi-join of the
    * bounded (broadcastable) provenance frame against each store's key
    * column — never a fact-table shuffle.
    */
  def membershipCollisionFrame(t: String, s: String): DataFrame = {
    val m = memberships((t, s))
    val nt = schema.node(t)
    val snt = schema.node(s)
    val srcDf = nodes(s)
    val tgtType = nodes(t).schema(nt.key).dataType
    srcDf
      .join(m, srcDf(snt.key).cast(StringType) === m("__m_key"), "left_semi")
      .select(col(snt.key).cast(tgtType).cast(StringType).as("__t_key"))
      .na.drop()
      .join(nodes(t).select(col(nt.key).cast(StringType).as("__t_key")),
        Seq("__t_key"), "left_semi")
      .distinct()
  }

  /** Graph statistics report — nodes by label, edges by type (the
    * reference's pre-flight and final count audits, reference:
    * final/inject_relationship.py:927-961,1017-1031), plus one row per
    * secondary-membership provenance pair (`Label<-Source`) and one
    * `collision` row per pair counting its key-rendering collisions
    * against the target's native keys ([[membershipCollisionFrame]] —
    * nonzero means the §2.15 identity blur is LIVE in this store, not
    * just theoretical). One row per label/type: (kind, name, cnt),
    * totally ordered.
    */
  def describe(spark: SparkSession): DataFrame = {
    val parts =
      nodes.toSeq.map { case (n, df) =>
        df.agg(count(lit(1)).as("cnt")).select(lit("node").as("kind"), lit(n).as("name"), col("cnt"))
      } ++
      edges.toSeq.map { case (n, df) =>
        df.agg(count(lit(1)).as("cnt")).select(lit("edge").as("kind"), lit(n).as("name"), col("cnt"))
      } ++
      memberships.toSeq.map { case ((t, s), df) =>
        df.agg(count(lit(1)).as("cnt"))
          .select(lit("membership").as("kind"), lit(s"$t<-$s").as("name"), col("cnt"))
      } ++
      memberships.keys.toSeq.map { case (t, s) =>
        membershipCollisionFrame(t, s).agg(count(lit(1)).as("cnt"))
          .select(lit("collision").as("kind"), lit(s"$t<-$s").as("name"), col("cnt"))
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
    },
    memberships = memberships.map { case (k, df) =>
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

  /** Key-column statistics of node store `label`: row count, plus min/max
    * as longs when the key type is integral. ONE aggregate job, memoized
    * JVM-WIDE on the node FRAME's identity (not the store instance —
    * write ops copy the store but share unchanged frames, so a chained
    * mutation session reuses the stats its predecessors paid for).
    * Consumed by [[collisionPossible]] (r15 verdict #5).
    */
  def keyStats(label: String): GraphStore.KeyStats = {
    val key = schema.node(label).key
    val df = nodes(label)
    GraphStore.keyStatsOf(df, key)
  }

  /** Cheap necessary-condition probe for [[membershipCollisionFrame]]:
    * `false` PROVES no collision can exist for pair `(t, s)` — the
    * target's native store is empty, or both key domains are integral
    * with t's type at least as wide as s's (so the audit's
    * render-into-t's-keyspace cast is value-preserving) and the min/max
    * ranges are disjoint. The write surface skips the per-SET audit
    * semi-join in those cases (r15 verdict #5: the audit paid its join
    * even when it could not fire). `true` means "possible", never
    * "present" — the audit still runs and may count zero.
    */
  def collisionPossible(t: String, s: String): Boolean = {
    val ts = keyStats(t)
    if (ts.count == 0L) false
    else {
      val widthOk = GraphStore.integralWidth(nodes(t).schema(schema.node(t).key).dataType) >=
        GraphStore.integralWidth(nodes(s).schema(schema.node(s).key).dataType)
      (for {
        (tmin, tmax) <- ts.range if widthOk
        (smin, smax) <- keyStats(s).range
      } yield !(smax < tmin || smin > tmax)).getOrElse(true)
    }
  }

  /** Release the cached blocks of a [[persisted]] store (non-blocking). */
  def unpersistAll(): Unit = {
    nodes.values.foreach(_.unpersist(false))
    edges.values.foreach(_.unpersist(false))
    memberships.values.foreach(_.unpersist(false))
  }

  /** Persist per-label/type Parquet datasets, key-sorted within partitions
    * (the reference sorts before write for locality,
    * final/inject_relationship.py:696, final/inject_node.py:425; for us the
    * payoff is parquet min/max statistics on the keys → row-group pruning
    * for key-range scans at any scale). Membership frames and the
    * validated-edge set persist too (a small `_graft_meta.json` manifest —
    * written through the Hadoop FileSystem API so object-store roots work),
    * so a reloaded store keeps `v:Label` semantics and the endpoint-join
    * elision instead of silently reverting (r12 ADVICE: `mutatedLabels`
    * was session-only — the same query returned different results across
    * a save/load).
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
    memberships.foreach { case ((t, s), df) =>
      df.write.mode("overwrite").parquet(s"$root/memberships/${t}__FROM__$s")
    }
    GraphStore.writeMeta(root, validatedEdges, memberships.keys.toSeq)
  }
}

object GraphStore {
  /** A store with no labels — the starting point for building a graph
    * purely through Cypher write clauses ([[graft.cypher.CypherEngine]]
    * `.execute`) or [[GraphWriter]].
    */
  def empty: GraphStore = GraphStore(GraphSchema(Nil, Nil), Map.empty, Map.empty)

  def load(spark: SparkSession, root: String, schema: GraphSchema): GraphStore = {
    val (validated, memberPairs) = readMeta(spark, root)
    GraphStore(
      schema,
      schema.nodes.map(nt => nt.name -> spark.read.parquet(s"$root/nodes/${nt.name}")).toMap,
      schema.edges.map(et => et.label -> spark.read.parquet(s"$root/edges/${et.label}")).toMap,
      // only trust the manifest's validated set for edge types the passed
      // schema still declares (a schema drift should fail conservative)
      validatedEdges = validated.filter(l => schema.edges.exists(_.label == l)),
      memberships = memberPairs
        .filter { case (t, s) =>
          schema.nodes.exists(_.name == t) && schema.nodes.exists(_.name == s)
        }
        .map(p => p -> spark.read.parquet(s"$root/memberships/${p._1}__FROM__${p._2}"))
        .toMap)
  }

  /** Tiny JSON manifest beside the parquet datasets. Hand-rolled writer/
    * reader (labels are identifiers — no escaping needed) to avoid a
    * parser dependency; any read failure degrades to the conservative
    * empty sets, never an error.
    */
  private def writeMeta(root: String,
      validated: Set[String], pairs: Seq[(String, String)]): Unit = {
    val json =
      s"""{"validatedEdges":[${validated.toSeq.sorted.map(l => s""""$l"""").mkString(",")}],""" +
        s""""memberships":[${pairs.sorted.map { case (t, s) => s"""["$t","$s"]""" }.mkString(",")}]}"""
    val path = new org.apache.hadoop.fs.Path(s"$root/_graft_meta.json")
    val fs = path.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def readMeta(spark: SparkSession,
      root: String): (Set[String], Seq[(String, String)]) =
    try {
      val path = new org.apache.hadoop.fs.Path(s"$root/_graft_meta.json")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(path)) (Set.empty, Nil)
      else {
        val in = fs.open(path)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                  finally in.close()
        val validated = """"validatedEdges"\s*:\s*\[([^\]]*)\]""".r
          .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSet
        val pairs = """\["([^"]+)","([^"]+)"\]""".r.findAllMatchIn(txt)
          .map(m => (m.group(1), m.group(2))).toSeq
        (validated, pairs)
      }
    } catch { case _: Throwable => (Set.empty, Nil) }

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

  /** Memoize WITHOUT block-manager persistence — for stores whose frames
    * are already materialized files (a [[GraphStore.load]]ed store):
    * re-persisting key-sorted parquet doubles its storage and at sf100
    * the duplicate spill competed with the BFS checkpoints for the same
    * disk; the OS page cache already serves repeated scans
    * ([[graft.graph.GraphBuilder.savedStoreRoot]] doc).
    */
  def cachedAsIs(key: String)(build: => GraphStore): GraphStore =
    storeCache.computeIfAbsent(key, _ => build)

  /** Drop one cached store (releasing its blocks), or all with no key. */
  def evict(key: String = null): Unit =
    if (key == null) {
      storeCache.values.forEach(_.unpersistAll())
      storeCache.clear()
    } else Option(storeCache.remove(key)).foreach(_.unpersistAll())

  private val storeCache =
    new java.util.concurrent.ConcurrentHashMap[String, GraphStore]()

  /** (row count, integral-key min/max) of one node frame's key column —
    * see [[GraphStore.keyStats]].
    */
  final case class KeyStats(count: Long, range: Option[(Long, Long)])

  /** Comparable width of an integral key type (0 = not integral). The
    * collision-audit short-circuit only trusts range disjointness when
    * the target type is at least as wide as the source's: a NARROWING
    * cast can wrap values back into the target's range.
    */
  private[graph] def integralWidth(dt: org.apache.spark.sql.types.DataType): Int =
    dt match {
      case org.apache.spark.sql.types.ByteType => 1
      case org.apache.spark.sql.types.ShortType => 2
      case org.apache.spark.sql.types.IntegerType => 3
      case org.apache.spark.sql.types.LongType => 4
      case _ => 0
    }

  /** Frame-identity key for [[keyStatsCache]] (same pattern as the BFS
    * edge-union cache): reference equality on the DataFrame, so a mutated
    * store's NEW frame can never hit a stale entry.
    */
  private final class FrameKey(val df: AnyRef, val key: String) {
    override val hashCode: Int = System.identityHashCode(df) * 31 + key.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: FrameKey => (k.df eq df) && k.key == key
      case _ => false
    }
  }
  private val keyStatsCache =
    new java.util.concurrent.ConcurrentHashMap[FrameKey, KeyStats]()
  /** Entry bound: stats are one cheap job to recompute — on overflow the
    * cache resets rather than pinning frames of long-dead stores from GC.
    */
  private val KeyStatsMaxEntries = 256

  private[graph] def keyStatsOf(df: org.apache.spark.sql.DataFrame,
      key: String): KeyStats = {
    if (keyStatsCache.size > KeyStatsMaxEntries) keyStatsCache.clear()
    keyStatsCache.computeIfAbsent(new FrameKey(df, key), _ => {
      import org.apache.spark.sql.functions.{count, lit, min, max, col}
      if (integralWidth(df.schema(key).dataType) > 0) {
        val r = df.agg(count(lit(1)),
          min(col(key).cast(org.apache.spark.sql.types.LongType)),
          max(col(key).cast(org.apache.spark.sql.types.LongType))).head()
        KeyStats(r.getLong(0),
          if (r.isNullAt(1) || r.isNullAt(2)) None
          else Some((r.getLong(1), r.getLong(2))))
      } else KeyStats(df.agg(count(lit(1))).head().getLong(0), None)
    })
  }
}
