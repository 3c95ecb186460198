package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.graph.{GraphAnalytics, GraphBuilder, GraphSchema, GraphStore}
import graft.sources.Tables

/** Graph operator surface (SURVEY.md §2.8): construction stats, degree
  * analytics, k-hop traversals, connected components, BFS. Q33/Q34 run
  * through adaptive local/DataFrame strategies ([[graft.graph.GraphAnalytics]]); the DuckDB oracle
  * reproduces them with recursive CTEs.
  */
object GraphQueries {

  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Part vertex ids are offset into a disjoint id space so the bipartite
    * customer–part graph has globally unique vertex ids.
    */
  private val PartOffset = 1000000000L

  /** Bipartite customer–part edges via lineitem⨝orders (the derived graph of
    * SURVEY.md §2.12 Q33/Q34), deduplicated. `sampleMod` keeps the Q33
    * component-closure oracle tractable (recursive CTE) — None = full graph.
    */
  private val edgeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Option[Int]), DataFrame]()

  /** ~512k (src,dst) Long pairs ≈ 8 MB per partition — the unit used to size
    * the coalesce below so iterative GraphX jobs get a task count that
    * matches the data, not the shuffle.partitions the dedup ran with.
    */
  private val EdgeRowsPerPartition = 512L * 1000

  private def bipartiteEdges(s: SparkSession, dir: String, sampleMod: Option[Int]): DataFrame =
    // memoized + persisted per JVM: four analytics queries walk the same
    // derived graph; the dedup join is the shared ingest step, not part of
    // any one algorithm's cost (same rationale as the Cypher store cache).
    // The persisted plan pins the dedup's 32-way shuffle partitioning (cached
    // plans bypass AQE coalescing), so every distributed iteration downstream
    // would otherwise schedule dozens of near-empty tasks over a tiny graph
    // — a measured 15.7x regression on q33 in round 2. Materialize once,
    // then hand out a view coalesced to ceil(rows / 512k), so the task count
    // tracks actual edge volume at any scale (sf0.001 → 1 partition; 100 TB
    // derived graphs → hundreds, capped only by the data).
    edgeCache.computeIfAbsent((dir, sampleMod),
      _ => buildBipartite(s, dir, sampleMod).persist(StorageLevel.MEMORY_AND_DISK))

  /** Drop one memoized edge frame and release its storage (r18, verdict
    * #5): q34 is the SOLE consumer of the UNSAMPLED bipartite graph —
    * q33/q56/q57 share the mod-97 sample — and its BFS is
    * level-synchronous-eager (every level is localCheckpointed before
    * [[GraphAnalytics.bfs]] returns), so by the time q34's result frame
    * exists the 600M-pair cache (sf100) is dead weight: left pinned it
    * evicted q47's working set for the rest of the suite (measured 97 s
    * in-suite vs 66 s isolated at sf100). A later call re-warms it
    * through [[bipartiteEdges]] — the q34 phase probes do exactly that,
    * with the re-warm timed as its OWN phase so the bfs phase stays
    * warm-labeled.
    */
  private def releaseEdges(dir: String, sampleMod: Option[Int]): Unit = {
    val f = edgeCache.remove((dir, sampleMod))
    if (f != null) f.unpersist(false)
  }

  /** The uncached bipartite ingest plan — also the `ingest` phase probe of
    * q34's phase split (r17, verdict #5: the sf100 q34 headline is
    * dominated by this one-time 600M-row join + distinct, not the BFS
    * levels; probes must recompute from scratch, so they can't go through
    * [[edgeCache]]).
    */
  /** `probeShape = true` (the ingest phase probe only) injects a no-op
    * filter BETWEEN the join and the distinct, so no subtree of the
    * probe's plan is `sameResult` to the [[edgeCache]]d frame — Spark's
    * CacheManager otherwise substitutes the cached InMemoryRelation into
    * ANY matching subplan and the "from scratch" probe silently reads
    * cache blocks (measured: 0.78 s for a 600M-row ingest at sf100).
    * The filter drops nothing: keys are non-negative.
    */
  private def buildBipartite(s: SparkSession, dir: String,
      sampleMod: Option[Int], probeShape: Boolean = false): DataFrame = {
    val li = T(s, dir, "lineitem")
    // Upper bound on edge count without running anything: count() on a bare
    // parquet scan is answered from footer row-count statistics
    // (milliseconds), and |distinct pairs| ≤ |lineitem| / sampleMod.
    val bound = sampleMod.fold(li.count())(m => li.count() / m + 1)
    val target = math.max(1L, math.min(
      (bound + EdgeRowsPerPartition - 1) / EdgeRowsPerPartition,
      s.sparkContext.defaultParallelism.toLong)).toInt
    val o = sampleMod match {
      case Some(m) => T(s, dir, "orders").filter(pmod(col("o_orderkey"), lit(m)) === 0)
      case None => T(s, dir, "orders")
    }
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").cast(LongType).as("src"),
        (col("l_partkey").cast(LongType) + PartOffset).as("dst"))
    val shaped =
      if (probeShape) joined.filter(col("src") =!= lit(Long.MinValue)) else joined
    shaped.distinct().coalesce(target)
  }

  private def bipartiteEdgeSql(sampleFilter: String): String =
    s"""SELECT DISTINCT CAST(o_custkey AS BIGINT) AS src, CAST(l_partkey + 1000000000 AS BIGINT) AS dst
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey $sampleFilter""".stripMargin

  // ------------------------------------------------ Q31 degree profile (G4)
  /** A2/G4: degree histogram — the reference's contention analysis
    * (final/inject_relationship.py:154-188) as a two-level aggregate.
    */
  private def q31(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_customers"))
      .orderBy("degree")

  private val q31Sql =
    """SELECT degree, COUNT(*) AS n_customers
      |FROM (SELECT o_custkey, COUNT(*) AS degree FROM orders GROUP BY o_custkey) d
      |GROUP BY degree ORDER BY degree""".stripMargin

  // ------------------------------------------- Q31b graph construction stats
  /** G1/G2/G8: build the full declared property graph (node merge-dedup +
    * FK-validated edge construction) and report nodes-by-label /
    * edges-by-type — the reference's final count audit
    * (final/inject_relationship.py:1017-1031).
    */
  private def q31b(s: SparkSession, dir: String): DataFrame =
    // audits the same cached store the Cypher query family reads (keyed
    // identically in CypherQueries.store) — the reference's count audits
    // run against the injected database, not a rebuilt one
    // (final/inject_relationship.py:1017-1031), and a fresh uncached
    // build here re-paid every node/edge construction per call (~5 s of
    // q31b's sf1 wall was the rebuild, not the counts)
    (GraphBuilder.savedStoreRoot(dir) match {
      case Some(root) => GraphStore.cachedAsIs(dir)(
        GraphStore.load(s, root, graft.graph.GraphSchema.testdata))
      case None => GraphStore.cached(dir)(GraphBuilder.buildAll(s, dir))
    }).describe(s)

  private val q31bSql: String = {
    val g = GraphSchema.testdata
    val nodeSqls = g.nodes.map { nt =>
      s"SELECT 'node' AS kind, '${nt.name}' AS name, COUNT(DISTINCT ${nt.key}) AS cnt FROM ${nt.tables.head}"
    }
    val edgeSqls = g.edges.map { et =>
      val srcNt = g.node(et.src); val dstNt = g.node(et.dst)
      s"""SELECT 'edge' AS kind, '${et.label}' AS name, COUNT(*) AS cnt FROM (
         |  SELECT DISTINCT t.${et.keyS}, t.${et.keyT} FROM ${et.table} t
         |  JOIN ${srcNt.tables.head} s ON t.${et.keyS} = s.${srcNt.key}
         |  JOIN ${dstNt.tables.head} d ON t.${et.keyT} = d.${dstNt.key}) e""".stripMargin
    }
    (nodeSqls ++ edgeSqls).mkString("", " UNION ALL ", " ORDER BY kind, name")
  }

  // ----------------------------------------------------- Q32 2-hop traversal
  /** J4/G6: 2-hop pattern Region←Nation←Customer←Order — chained equi joins;
    * the dim chain broadcasts so the orders fact never shuffles.
    */
  private def q32(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name").agg(count(lit(1)).as("cnt"))
      .orderBy("r_name")

  private val q32Sql =
    """SELECT r_name, COUNT(*) AS cnt
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  // ----------------------------------------------------- Q32b 3-hop traversal
  /** J4/G6/G13: 3-hop chain adding Order→LineItem→Part — counts per
    * (region, part type).
    */
  private def q32b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(T(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(T(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .join(T(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("r_name", "p_type").agg(count(lit(1)).as("cnt"))
      .orderBy("r_name", "p_type")

  private val q32bSql =
    """SELECT r_name, p_type, COUNT(*) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY r_name, p_type ORDER BY r_name, p_type""".stripMargin

  // -------------------------------------------- Q33 connected components (G9)
  /** G9: min-label connected components on a sampled bipartite
    * subgraph (sampling keeps the oracle's recursive-CTE closure small; the
    * full graph is exercised in bench). Output: (component, member_count).
    */
  private def q33(s: SparkSession, dir: String): DataFrame =
    GraphAnalytics.connectedComponents(s, bipartiteEdges(s, dir, Some(97)))
      .groupBy("component").agg(count(lit(1)).as("member_count"))
      .orderBy("component")

  /** Linear-round hash-min + pointer-jump CC oracle (r15 verdict #5): the
    * old recursive min-label CTE materialized the full (node, seed) reach
    * closure — quadratic per component — and timed out in DuckDB at
    * sf1/sf10 while the engine stayed green, leaving those cells
    * unverified. This unrolls 96 rounds of
    * `comp' = min(comp[comp], min over neighbors' comp)`: each round is
    * two hash joins + a group-by over exactly n rows, so total work is
    * O(n·R) — never quadratic. Honest convergence accounting: the jump
    * term doubles progress on path-shaped id layouts but measured
    * roughly diameter-bound on the sampled bipartite graph (engine-
    * verified convergence thresholds: R=56 at sf1, ~57 at sf10, vs
    * union-find ground truth 6317 / 61552 components) — R=96 carries a
    * ~1.7x margin over the largest measured demand, and an
    * under-converged oracle fails LOUDLY (extra components → row-count
    * mismatch against the engine), never silently. The mismatch is also
    * ATTRIBUTABLE (ADVICE r15): when r95 and r96 still differ, the final
    * select appends a `(-1, -1)` sentinel row — impossible in real data
    * (orderkeys are positive) — so a scale factor whose diameter outruns
    * 96 rounds reads as "oracle under-converged", not as an engine bug;
    * the EXISTS guard costs one short-circuited probe over the last two
    * rounds. AS MATERIALIZED is
    * load-bearing: each round references its predecessor three times,
    * and an inlining planner would expand the chain exponentially.
    * Measured DuckDB-side at R=80-96: ~0.2 s sf0.01 / 4 s sf1 / 49 s
    * sf10 (was: 300 s timeout at sf1 AND sf10).
    */
  private val q33Sql = {
    val rounds = (1 to 96).map { k =>
      val p = s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
         |  SELECT u.id, MIN(u.c) AS comp FROM (
         |    SELECT a.id, LEAST(a.comp, j.comp) AS c
         |    FROM $p a JOIN $p j ON j.id = a.comp
         |    UNION ALL
         |    SELECT e.dst AS id, a.comp AS c FROM $p a JOIN adj e ON e.src = a.id
         |  ) u GROUP BY u.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (${bipartiteEdgeSql("WHERE o_orderkey % 97 = 0")}),
       |nodes AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |adj AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |r0 AS MATERIALIZED (SELECT id, id AS comp FROM nodes),
       |$rounds
       |SELECT component, member_count FROM (
       |  SELECT comp AS component, COUNT(*) AS member_count FROM r96 GROUP BY comp
       |  UNION ALL
       |  SELECT -1, -1
       |  WHERE EXISTS (SELECT 1 FROM r96 a JOIN r95 b
       |                ON a.id = b.id AND a.comp <> b.comp)
       |) ORDER BY component""".stripMargin
  }

  // ------------------------------------------------------- Q34 BFS dist (G10)
  /** G10: BFS hop distance from the first customer vertex, ≤ 4 hops,
    * on the full bipartite graph.
    */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The source vertex is part of the result even if isolated (GraphX only
    // materializes vertices that appear in some edge).
    val seed = Seq((1L, 0)).toDF("node", "dist")
    // bfs is eager on BOTH strategies (each distributed level is
    // localCheckpointed; the local kernel's result is checkpointed at the
    // strategy gate — r18: it used to return a lazy plan over the edge
    // frame, so this release made the final aggregation re-pay the whole
    // ingest uncached), so its result no longer references the edge frame
    // — release the unsampled cache here, not at suite end, so q47+ don't
    // compete with 600M dead pairs (verdict r17 #5)
    val levels = GraphAnalytics.bfs(s, bipartiteEdges(s, dir, None),
      source = 1L, maxDepth = 4)
    releaseEdges(dir, None)
    levels
      .unionByName(seed)
      .groupBy("node").agg(min(col("dist")).cast(IntegerType).as("dist"))
      .orderBy("node")
  }

  private val q34Sql =
    s"""WITH RECURSIVE
       |edges AS (${bipartiteEdgeSql("")}),
       |adj AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |bfs(id, dist) AS (
       |  SELECT CAST(1 AS BIGINT), 0
       |  UNION
       |  SELECT a.dst, b.dist + 1 FROM bfs b JOIN adj a ON a.src = b.id WHERE b.dist < 4
       |)
       |SELECT id AS node, CAST(MIN(dist) AS INTEGER) AS dist FROM bfs
       |GROUP BY id ORDER BY node""".stripMargin

  // ------------------------------------------- Q56/Q57 PageRank + triangles
  /** G11: PageRank over the sampled bipartite graph. r13 (r12 verdict
    * directive #8): TOLERANCE-oracled instead of rows-only — ranks are
    * emitted at a 1e-4 quantum (integer-scaled, so the compare is exact
    * arithmetic, not float repr) against a DuckDB oracle that unrolls the
    * same 10 power iterations and final mass normalization
    * (GraphX-staticPageRank semantics: start 1.0, r' = 0.15 + 0.85·Σ
    * inbound r/outDeg, final sum scaled to the vertex count). Float
    * summation order differs engine-vs-oracle by ~1e-12 relative after 10
    * iterations — four decimals of slack makes a boundary flip
    * vanishingly unlikely while still pinning every rank value.
    */
  private def q56(s: SparkSession, dir: String): DataFrame =
    GraphAnalytics.pageRank(s, bipartiteEdges(s, dir, Some(97)), iters = 10)
      .select(col("node").cast(LongType).as("node"),
        round(col("rank") * 10000).cast(LongType).as("rank_1e4"))
      .orderBy("node")

  private val q56Sql: String = {
    val iters = (1 to 10).map { i =>
      s"""r$i AS (
         |  SELECT v.node, 0.15 + 0.85 * COALESCE(SUM(p.r / deg.d), 0) AS r
         |  FROM v
         |  LEFT JOIN e ON e.dst = v.node
         |  LEFT JOIN r${i - 1} p ON p.node = e.src
         |  LEFT JOIN deg ON deg.src = e.src
         |  GROUP BY v.node
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  ${bipartiteEdgeSql("WHERE o_orderkey % 97 = 0")}
       |), v AS (
       |  SELECT src AS node FROM e UNION SELECT dst AS node FROM e
       |), deg AS (
       |  SELECT src, COUNT(*) AS d FROM e GROUP BY src
       |), r0 AS (
       |  SELECT node, CAST(1.0 AS DOUBLE) AS r FROM v
       |),
       |$iters
       |SELECT CAST(node AS BIGINT) AS node,
       |       CAST(ROUND(r * (SELECT COUNT(*) FROM v)
       |            / (SELECT SUM(r) FROM r10) * 10000) AS BIGINT) AS rank_1e4
       |FROM r10 ORDER BY node""".stripMargin
  }

  /** G12: triangle count. A bipartite graph has none by construction, so
    * close customer–customer triangles instead: connect customers sharing a
    * part (via the sampled bipartite edges), then count triangles.
    */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val e = bipartiteEdges(s, dir, Some(97))
    val byPart = e.select(col("dst").as("part"), col("src").as("cust"))
    val custPairs = byPart.as("a").join(byPart.as("b"), "part")
      .filter(col("a.cust") < col("b.cust"))
      .select(col("a.cust").as("src"), col("b.cust").as("dst"))
      .distinct()
    GraphAnalytics.triangleCount(s, custPairs)
      .agg(sum(col("triangles")).as("triangle_ends"),
        count(lit(1)).as("nodes"))
  }

  // ------------------------------------------------------------------ registry

  val defs: Map[String, Q] = Map(
    "q31_degree_histogram" -> q31 _,
    "q31b_graph_stats" -> q31b _,
    "q32_2hop_region" -> q32 _,
    "q32b_3hop_parttype" -> q32b _,
    "q33_connected_components" -> q33 _,
    "q34_bfs_distance" -> q34 _,
    "q56_pagerank" -> q56 _,
    "q57_triangles" -> q57 _
  )

  /** q34's ingest-vs-BFS phase split (r17, verdict #5) — same contract as
    * [[PipelineQueries.phaseProbes]]: timed by Bench OUTSIDE the headline
    * numbers, recorded under `"phases"`. `ingest` rebuilds the bipartite
    * dedup join from scratch (bypassing [[edgeCache]] — probes share no
    * state with the timed run); `bfs` runs the 4-level BFS over the
    * CACHED edges, so the phases decompose the headline: at sf100 the
    * one-time 600M-row join + distinct dominates q34's ~250 s wall while
    * the BFS levels are seconds — the accounting blur this split removes
    * (the r15 phase split did the same for the tolerance family). Since
    * r18 q34 RELEASES the unsampled cache when it finishes (verdict r17
    * #5), so the probe sequence re-warms it explicitly: `warm`
    * re-materializes the cache as its own timed phase (probes run in Seq
    * order), and `bfs` then measures the levels over genuinely warm
    * edges — no phase silently reads state another phase paid for.
    */
  val phaseProbes: Map[String, Seq[(String, Q)]] = Map(
    "q34_bfs_distance" -> Seq(
      "ingest" -> ((s, dir) => buildBipartite(s, dir, None, probeShape = true)),
      "warm" -> ((s, dir) => bipartiteEdges(s, dir, None)),
      "bfs" -> ((s, dir) =>
        GraphAnalytics.bfs(s, bipartiteEdges(s, dir, None),
          source = 1L, maxDepth = 4))))

  // q57 (round 12, r11 verdict directive #4): triangle counting is
  // integer-exact, so the enumeration oracle is a plain three-way join —
  // per-node counts sum to 3 x #triangles, nodes = distinct endpoints.
  private val q57Sql: String =
    """WITH e AS (
      |  SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cust,
      |         CAST(l_partkey AS BIGINT) AS part
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderkey % 97 = 0
      |),
      |cp AS (
      |  SELECT DISTINCT a.cust AS s, b.cust AS d
      |  FROM e a JOIN e b ON a.part = b.part AND a.cust < b.cust
      |),
      |tri AS (
      |  SELECT count(*) AS t FROM cp x
      |  JOIN cp y ON y.s = x.s AND y.d > x.d
      |  JOIN cp z ON z.s = x.d AND z.d = y.d
      |),
      |nodes AS (
      |  SELECT count(*) AS n FROM
      |    (SELECT DISTINCT c FROM (SELECT s AS c FROM cp UNION ALL SELECT d FROM cp))
      |)
      |SELECT CAST(3 * t AS BIGINT) AS triangle_ends, CAST(n AS BIGINT) AS nodes
      |FROM tri, nodes""".stripMargin

  val oracle: Map[String, String] = Map(
    "q31_degree_histogram" -> q31Sql,
    "q31b_graph_stats" -> q31bSql,
    "q32_2hop_region" -> q32Sql,
    "q32b_3hop_parttype" -> q32bSql,
    "q33_connected_components" -> q33Sql,
    "q34_bfs_distance" -> q34Sql,
    "q56_pagerank" -> q56Sql,
    "q57_triangles" -> q57Sql
  )
}
