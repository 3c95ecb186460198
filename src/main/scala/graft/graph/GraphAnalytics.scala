package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** GraphX/Pregel analytics over DataFrame-shaped edge lists (SURVEY.md §2.8
  * G9–G12; mandated by BASELINE.json `spark_approach`). The reference's only
  * graph analytics are Cypher count audits (reference:
  * final/inject_relationship.py:932-957); connected components, BFS, PageRank
  * and triangle counting are north-star extensions.
  *
  * Input edges are `(src: Long, dst: Long)` DataFrames; callers namespace
  * vertex ids (e.g. part ids offset by 10^9) before handing them in. Results
  * come back as DataFrames so the rest of the engine stays declarative.
  *
  * Scale note: every entry point takes `edgePartitions` — when set, edges
  * are re-partitioned with `EdgePartition2D` (√n×√n vertex-block grid, the
  * strategy that bounds replication at 2·√numParts per vertex) before
  * iterating; the right setting on a real cluster is ≈ the executor-core
  * count. Left `None` locally: measured twice at local[8]/local[32], the
  * re-partition pass cost more than it saved at sf0.1. At 100 TB the
  * bipartite projections built from fact tables should also be
  * pre-deduplicated (the builders do) so edge multiplicity never inflates
  * the RDD.
  */
object GraphAnalytics {

  /** Edge-row threshold under which components/BFS run inside a single task
    * (union-find / in-memory adjacency) instead of Pregel. 5M (Long, Long)
    * pairs ≈ 80 MB — comfortably one task. Same philosophy as Spark's
    * broadcast-join threshold: pick the physical strategy from the actual
    * input size. A tiny derived graph should not pay ~15 Pregel rounds of
    * job-scheduling overhead (measured ~0.25 s/round at local[32], i.e.
    * ~4 s floor regardless of data); a 100 TB derived graph exceeds the
    * threshold and takes the distributed path automatically. Callers that
    * persist their edge DataFrame (e.g. the Q33/Q34 bipartite cache) pay
    * the sizing count() against the cache.
    */
  val LocalEdgeThreshold: Long = 5L * 1000 * 1000

  /** Conf key: when set to a (fault-tolerant, e.g. HDFS) directory, every
    * [[CheckpointIntervalKey]]-th lineage cut in an iterative loop
    * (dfBfs / dfComponents / dfPageRank here, bfsFrames in the Cypher
    * compiler) uses a RELIABLE `checkpoint()` into it instead of
    * `localCheckpoint`. Local checkpoints live in executor block storage:
    * losing ONE executor kills the whole iterative job, and the pinned
    * blocks block dynamic allocation — on a preemptible 100 TB cluster
    * the reliable cut bounds recovery to the interval. Unset (the
    * local[n] default) every cut stays local — no distributed FS needed,
    * no write amplification.
    */
  val CheckpointDirKey = "graft.checkpoint.dir"

  /** Conf key: reliable-checkpoint cadence (every k-th cut; default 5).
    * Between reliable cuts the loop still localCheckpoints, so plan
    * growth stays bounded per round while the replicated writes are paid
    * only k times less often.
    */
  val CheckpointIntervalKey = "graft.checkpoint.interval"

  /** Per-loop lineage-cutter implementing the policy above. One instance
    * per iterative invocation (the round counter is loop-local).
    */
  private[graft] final class IterCheckpointer(spark: SparkSession) {
    private val dir = spark.conf.getOption(CheckpointDirKey)
    private val every = math.max(1,
      spark.conf.getOption(CheckpointIntervalKey).map(_.toInt).getOrElse(5))
    private var n = 0
    dir.foreach(spark.sparkContext.setCheckpointDir)
    /** Cut lineage and firewall the preserved statistics (see
      * [[org.apache.spark.sql.graft.StatsFirewall]]): checkpoints inherit
      * the origin plan's size estimate, and inside a loop those estimates
      * COMPOUND — join stats multiply the previous round's BigInt, so the
      * digit count grows with the round number until the optimizer spends
      * its time in BigInteger arithmetic (measured: the sf100 contraction
      * stalled at level 6; the jump profile's per-round drift). `rows`,
      * when the loop knows it, makes the rebound estimate accurate enough
      * for broadcast planning; unknown defaults to `defaultSizeInBytes`.
      */
    def cut(df: DataFrame, rows: Long = -1L): DataFrame = {
      n += 1
      val cp = if (dir.nonEmpty && n % every == 0) df.checkpoint(true)
               else df.localCheckpoint(true)
      org.apache.spark.sql.graft.StatsFirewall.rebound(cp, rows)
    }

    /** Release the block-manager storage of a SUPERSEDED cut frame. Only
      * the loop that owns a cut may call this, and only once nothing will
      * read the frame again: a localCheckpoint's blocks ARE its data (the
      * lineage is truncated), so a released frame throws on any later
      * access. The cacheManager never registered these blocks
      * (`unpersist()` on the Dataset is a no-op — the r15 ADVICE finding
      * on membership frames), so we drop them via the underlying RDD of
      * the cut's LogicalRDD plan. Without this, a long iterative job
      * accumulates one full label-frame per cut and the per-round cost
      * drifts upward with block-manager pressure — measured on the sf100
      * q33 profile: prop 2 s → 19 s and jump 0.8 s → 18.7 s by round 18.
      * No-op on frames that are not a direct cut output (projections over
      * a cut, arbitrary plans) — the matcher keeps the call safe rather
      * than clever. A reliable (dir-mode) checkpoint IS matched — its
      * LogicalRDD also caches blocks — but releasing it only drops the
      * cached copy: the frame stays readable, recomputing from the
      * checkpoint files.
      */
    def release(df: DataFrame): Unit = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Conf key: delta-iteration rounds [[dfComponents]] runs before
    * escalating to pointer-doubling ([[jumpComponents]]); default
    * [[CcEscalateRoundsDefault]]. The delta iteration is O(component
    * diameter) rounds with a SHRINKING frontier — cheapest on the
    * bounded-diameter graphs FK schemas produce (3-5 rounds). A
    * chain-shaped graph (event sequences, linked logs) would run
    * thousands of rounds; once the round count passes this bound the
    * structure is provably deep, and pointer-doubling finishes in
    * O(log n) further rounds regardless of diameter. 0 = always
    * pointer-doubling (the tests' and A/B's lever).
    */
  val CcEscalateRoundsKey = "graft.cc.escalateRounds"
  val CcEscalateRoundsDefault = 10

  /** Conf key: when `true`, the iterative loops (delta CC, pointer-jump
    * CC) log one stderr line per round — round index, changed/frontier
    * count where the loop already pays that action, and wall seconds.
    * Observability for long iterative jobs: at 100 TB a CC can run for
    * hours and an operator needs to see whether rounds are converging or
    * the per-round cost is drifting (checkpoint-block pressure, skew)
    * WITHOUT a UI. Off by default — the log line itself is free, but the
    * knob keeps bench output byte-stable.
    */
  val IterVerboseKey = "graft.iter.verbose"
  private def iterVerbose(spark: SparkSession): Boolean =
    spark.conf.getOption(IterVerboseKey).contains("true")

  /** Observability for tests/tools: (delta rounds, pointer-doubling
    * rounds) of the last [[dfComponents]] invocation in this JVM.
    */
  private[graft] val LastCcRounds =
    new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))

  /** Bytes-per-row bound used by the plan-stats prescreen in
    * [[underThreshold]]: an edge row is two Longs (~16 B data, ~48 B with
    * in-memory overheads); 64 B/row makes the byte cap a generous
    * OVER-estimate of `threshold` rows, so the prescreen only ever writes
    * a frame off as "large" when it is far past the threshold.
    */
  private val StatsBytesPerRow = 64L

  /** Strategy sizing without an unconditional `count()`: at 100 TB a full
    * scan per analytics call just to be told "use Pregel" is a real cost.
    *
    * - Cached frames (the recommended calling convention — q33/q34 persist
    *   their bipartite projection) always get the exact count: it runs
    *   against (and on first use, materializes) the cache.
    * - Uncached frames are prescreened on
    *   `optimizedPlan.stats.sizeInBytes`: over the byte cap the frame is
    *   declared large with NO job (raw-scan stats are accurate, and the
    *   wild OVERestimates Catalyst produces for un-cached join lineage
    *   only ever push toward the distributed path — the safe direction);
    *   under the cap the exact count is cheap by construction.
    */
  private[graph] def underThreshold(edges: DataFrame, threshold: Long): Boolean = {
    if (edges.storageLevel == StorageLevel.NONE) {
      val capBytes = BigInt(threshold) * StatsBytesPerRow
      if (edges.queryExecution.optimizedPlan.stats.sizeInBytes > capBytes) return false
    }
    edges.count() <= threshold
  }

  private[graph] def toGraph(edges: DataFrame, undirected: Boolean,
      edgePartitions: Option[Int] = None): Graph[Int, Int] = {
    val edgeRDD = edges.select("src", "dst").rdd.flatMap { r =>
      val e = Edge(r.getLong(0), r.getLong(1), 1)
      if (undirected) Iterator(e, Edge(r.getLong(1), r.getLong(0), 1)) else Iterator(e)
    }
    val g = Graph.fromEdges(edgeRDD, 0, StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    edgePartitions.fold(g)(n => g.partitionBy(PartitionStrategy.EdgePartition2D, n))
  }

  /** Connected components. Output: (node: Long, component: Long) where
    * component = min vertex id in the component — deterministic. Adaptive
    * physical strategy: below `localThreshold` edge rows the whole graph
    * fits one task and runs union-find there; above, Pregel min-label
    * propagation (both produce identical min-id labels).
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      edgePartitions: Option[Int] = None,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    if (underThreshold(edges, localThreshold)) return localComponents(spark, edges)
    spark.conf.getOption(CcStrategyKey).getOrElse("contract") match {
      case "delta" => dfComponents(spark, edges)
      case _ => contractComponents(spark, edges, localThreshold)
    }
  }

  /** Conf key: distributed CC strategy. `contract` (default) physically
    * shrinks the graph each round and finishes locally;
    * `delta` is the r9-r15 min-label propagation (escalating to
    * pointer-doubling), kept for the A/B and as the escalation target.
    * The local path under `localThreshold` is taken regardless.
    */
  val CcStrategyKey = "graft.cc.strategy"

  /** Contraction cap before handing the (already much smaller) graph to
    * [[dfComponents]]: hook+shortcut at least halves a path per level and
    * collapses stars outright, so 40 levels covers any 2^40-node chain;
    * real FK-derived graphs measure 1-3 levels. A belt-and-braces bound,
    * not a tuning knob.
    */
  private val MaxContractionLevels = 40

  /** Contraction connected components — the distributed default since
    * r16. The r15-era label propagation kept the FULL label and edge
    * frames in play every round: the sf100 probe measured q33's sampled
    * bipartite graph (6.2M edges, first time over [[LocalEdgeThreshold]])
    * at 1153 s — ~50+ rounds of full-size joins whose per-round cost also
    * drifted 2 s → 19 s on accumulated checkpoint blocks. Contraction
    * attacks the ROUND COUNT and the PER-ROUND SIZE at once:
    *
    * Each level (a) hooks every node with a smaller neighbor onto its
    * minimum neighbor (one groupBy over the edge frame), (b) pointer-jumps
    * the hook map to its roots (self-joins of the ABSORBED-nodes map only
    * — a path's chain resolves in log₂ passes of a frame that is tiny
    * relative to the graph), then (c) rewrites both edge endpoints
    * through the rooted map, drops self-loops, and dedups — the graph
    * that enters level k+1 physically lost every absorbed node and every
    * intra-cluster edge. FK-derived graphs collapse brutally fast: the
    * q33 bipartite graph absorbs ALL part-side nodes into customers at
    * level 1 (every part has a smaller customer neighbor), leaving a
    * customer-customer graph under the local threshold — one distributed
    * level, then single-task union-find. Generally: a path halves per
    * level, a star collapses in ≤2, so levels = O(log n) with each level
    * cheaper than the last — vs O(diameter · full-size) for propagation.
    *
    * Labels compose back down the levels: component(absorbed) =
    * component(root it hooked to), one join per level (plus (root, root)
    * rows for components that contracted away entirely). Superseded
    * frames are released as soon as the next cut materializes, so block
    * storage stays O(current graph + maps), not O(rounds). Output
    * matches [[localComponents]] / [[dfComponents]] / GraphX exactly:
    * (node, component = min id in the component) for every node with at
    * least one edge, self-loop-only nodes included.
    */
  private[graph] def contractComponents(spark: SparkSession, edges: DataFrame,
      localThreshold: Long): DataFrame = {
    import spark.implicits._
    val ck = new IterCheckpointer(spark)
    val verbose = iterVerbose(spark)
    val t00 = System.nanoTime()
    // canonical undirected edge set: (min, max), no self-loops, deduped
    var g = ck.cut(edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct())
    var gEdges = g.count()
    var maps = List.empty[DataFrame]
    var level = 0
    val floor = math.max(localThreshold, 1L)
    while (gEdges > floor && level < MaxContractionLevels) {
      level += 1
      val t0 = System.nanoTime()
      val und = g.unionByName(g.select(col("dst").as("src"), col("src").as("dst")))
      // hook: absorbed nodes only — (node, parent = min neighbor < node)
      var mCut = ck.cut(und.groupBy(col("src")).agg(min(col("dst")).as("__mn"))
        .filter(col("__mn") < col("src"))
        .select(col("src").as("node"), col("__mn").as("parent")))
      // shortcut the hook map to its roots: a parent that is itself
      // absorbed this level gets replaced by ITS parent, doubling chain
      // compression per pass — so the stored map points straight at
      // level survivors and back-resolution is one join per level
      var jumping = true
      var jumps = 0
      while (jumping) {
        jumps += 1
        val j = mCut.select(col("node").as("__jn"), col("parent").as("__jp"))
        val m2 = ck.cut(mCut.join(j, col("parent") === col("__jn"), "left")
          .select(col("node"), coalesce(col("__jp"), col("parent")).as("parent"),
            (col("__jp") < col("parent")).as("__moved")))
        jumping = m2.filter(col("__moved")).limit(1).count() > 0
        ck.release(mCut)
        mCut = m2
      }
      val m = mCut.drop("__moved")
      val l1 = m.select(col("node").as("__n1"), col("parent").as("__p1"))
      val l2 = m.select(col("node").as("__n2"), col("parent").as("__p2"))
      val g2 = ck.cut(g
        .join(l1, col("src") === col("__n1"), "left")
        .join(l2, col("dst") === col("__n2"), "left")
        .select(coalesce(col("__p1"), col("src")).as("s"),
          coalesce(col("__p2"), col("dst")).as("d"))
        .select(least(col("s"), col("d")).as("src"),
          greatest(col("s"), col("d")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
      ck.release(g)
      maps ::= m // head = deepest level; mCut stays alive behind the projection
      g = g2
      val prev = gEdges
      gEdges = g.count()
      if (verbose) System.err.println(
        f"[graft.cc] contract level $level%2d edges $prev%9d -> $gEdges%9d " +
        f"(jump passes $jumps) ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    // finish: union-find in one task under the threshold; if contraction
    // ever stalls against MaxContractionLevels the graph is still far
    // smaller than the input — hand it to the propagation path
    var comp =
      if (gEdges == 0) Seq.empty[(Long, Long)].toDF("node", "component")
      else if (gEdges > floor) dfComponents(spark, g)
      else localComponents(spark, g)
    // an escalated finish ran dfComponents, whose (delta, jump) counts
    // just landed in LastCcRounds — fold them into this run's report
    // instead of clobbering them with zeros
    val (finishDelta, finishJump) =
      if (gEdges > floor) LastCcRounds.get() else (0, 0)
    // compose labels back down: deepest level first, so every parent is
    // either already labeled or the (fully contracted away) root itself
    maps.foreach { m =>
      val byParent = comp.select(col("node").as("__cn"), col("component").as("__cc"))
      val resolved = m.join(byParent, col("parent") === col("__cn"), "left")
        .select(col("node"),
          coalesce(col("__cc"), col("parent")).as("component"))
      val roots = m.select(col("parent").as("node")).distinct()
        .join(comp, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("component"))
      val prev = comp
      comp = ck.cut(comp.unionByName(resolved).unionByName(roots))
      ck.release(prev)
    }
    // nodes whose only edges were self-loops exist in the propagation and
    // local strategies' output (labeled by themselves) — match them
    val selfOnly = edges.filter(col("src") === col("dst"))
      .select(col("src").as("node")).distinct()
      .join(comp, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    val out = comp.unionByName(selfOnly)
    LastCcRounds.set((level + finishDelta, finishJump))
    if (verbose) System.err.println(
      f"[graft.cc] contract done: $level levels, " +
      f"${(System.nanoTime() - t00) / 1e9}%6.2f s")
    out
  }

  /** Min-label propagation CC as DataFrame joins — the same algorithm
    * GraphX's `connectedComponents()` runs (so identical round counts:
    * O(component diameter)), with the per-round frontier discipline of
    * [[dfBfs]]: labels are localCheckpointed each round so round n+1's
    * plan starts from materialized labels, and execution stays in
    * Tungsten memory (no VertexPartition caching / RDD GC churn — the
    * same stability argument that made the DataFrame BFS the distributed
    * default; tools/ProfileBfs measured Pregel's 6-10x first-run spread
    * in a loaded JVM). Labels converge to the min vertex id per
    * component, matching [[localComponents]] and GraphX exactly.
    */
  private[graph] def dfComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    val ck = new IterCheckpointer(spark)
    val escalateAfter = spark.conf.getOption(CcEscalateRoundsKey)
      .map(_.toInt).getOrElse(CcEscalateRoundsDefault)
    val e = edges.select(col("src"), col("dst"))
    val adj = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    var labels = ck.cut(adj.select(col("src").as("node")).distinct()
      .withColumn("component", col("node")))
    // Delta iteration: a node's label can only drop via a neighbor whose
    // label dropped last round, so only CHANGED labels re-propagate.
    // Every value a node ever holds is broadcast to its neighbors the
    // round after it is adopted (all nodes are active in round 1), so the
    // fixpoint equals full re-propagation — but late rounds join a
    // shrinking frontier against the edge frame instead of every label
    // (the same frontier economics as [[dfBfs]]; GraphX's Pregel skips
    // non-messaged vertices the same way). The round count is O(component
    // diameter); past `escalateAfter` rounds the structure is provably
    // deep and the loop hands its labels to [[jumpComponents]], which
    // finishes in O(log n) rounds on any diameter.
    var prevCut = labels
    var active = labels
    var rounds = 0
    val verbose = iterVerbose(spark)
    while ({ val t0 = System.nanoTime()
             val empty = active.isEmpty
             if (verbose) System.err.println(
               f"[graft.cc] delta round $rounds%3d emptiness probe " +
               f"${(System.nanoTime() - t0) / 1e9}%7.2f s (empty=$empty)")
             !empty }) {
      if (rounds >= escalateAfter) {
        LastCcRounds.set((rounds, 0))
        return jumpComponents(adj, labels, ck, verbose)
      }
      rounds += 1
      val t0 = System.nanoTime()
      val cand = adj.join(active, col("src") === col("node"))
        .groupBy(col("dst").as("__n")).agg(min(col("component")).as("__cand"))
      val next = ck.cut(labels.join(cand, col("node") === col("__n"), "left")
        .select(col("node"), col("component").as("__old"),
          least(col("component"), coalesce(col("__cand"), col("component")))
            .as("component")))
      active = next.filter(col("component") < col("__old")).drop("__old")
      labels = next.drop("__old")
      // `next` is materialized; nothing references the previous round's
      // cut any more — drop its blocks so round cost stays flat
      ck.release(prevCut); prevCut = next
      if (verbose) System.err.println(
        f"[graft.cc] delta round $rounds%3d propagate+cut   " +
        f"${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    LastCcRounds.set((rounds, 0))
    labels
  }

  /** Pointer-doubling (label-shortcutting) connected components: each
    * round runs one neighbor-min propagation and one pointer JUMP
    * (`l ← l(l)`, a self-join of the label frame on the label column).
    * The jump halves label-chain depth, so convergence is O(log n) rounds
    * on ANY diameter — the Shiloach-Vishkin discipline, vs min-label
    * propagation's O(diameter). Each round joins the FULL label set twice
    * (no shrinking frontier), which is why this is the escalation path
    * rather than the default: FK-derived graphs converge in 3-5 delta
    * rounds, and only chain-shaped data (event sequences, linked logs)
    * ever reaches it. Invariant: every label is a node id inside its own
    * component and only decreases, so the fixpoint (labels constant
    * across every edge and stable under the jump) is the component-min
    * id — identical output to the delta iteration, union-find, and
    * GraphX.
    */
  private[graph] def jumpComponents(adj: DataFrame, labels0: DataFrame,
      ck: IterCheckpointer, verbose: Boolean = false): DataFrame = {
    var labels = labels0
    var prevCut = labels0
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      val t0 = System.nanoTime()
      val nbr = adj.join(labels, col("src") === col("node"))
        .groupBy(col("dst").as("__n")).agg(min(col("component")).as("__c"))
      val l1 = ck.cut(labels.join(nbr, col("node") === col("__n"), "left")
        .select(col("node"), col("component").as("__old"),
          least(col("component"), coalesce(col("__c"), col("component")))
            .as("component")))
      ck.release(prevCut) // l1 is materialized; the previous labels are dead
      val t1 = System.nanoTime()
      val jump = l1.select(col("node").as("__jn"), col("component").as("__jc"))
      val l2 = ck.cut(l1.join(jump, col("component") === col("__jn"), "left")
        .select(col("node"), col("__old"),
          least(col("component"), coalesce(col("__jc"), col("component")))
            .as("component")))
      ck.release(l1) // l2 is materialized; the half-round frame is dead
      prevCut = l2
      val t2 = System.nanoTime()
      changed = l2.filter(col("component") < col("__old")).count()
      labels = l2.drop("__old")
      if (verbose) System.err.println(
        f"[graft.cc] jump round $rounds%3d changed=$changed%9d  " +
        f"prop ${(t1 - t0) / 1e9}%6.2f s  jump ${(t2 - t1) / 1e9}%6.2f s  " +
        f"count ${(System.nanoTime() - t2) / 1e9}%6.2f s")
    }
    LastCcRounds.set((LastCcRounds.get()._1, rounds))
    labels
  }

  /** The GraphX CC the DataFrame path replaced as the distributed default
    * — kept for the strategy A/B and as a reference implementation.
    */
  def pregelComponents(spark: SparkSession, edges: DataFrame,
      edgePartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    toGraph(edges, undirected = true, edgePartitions)
      .connectedComponents()
      .vertices
      .map { case (id, comp) => (id, comp) }
      .toDF("node", "component")
  }

  /** Single-task union-find CC (path compression + union by size), labeling
    * each node with the min id in its component. Only invoked when the edge
    * list is under [[LocalEdgeThreshold]].
    */
  private def localComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    edges.select("src", "dst").as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x // path compression
          while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
          r
        }
        it.foreach { case (s, d) =>
          if (!parent.containsKey(s)) parent.put(s, s)
          if (!parent.containsKey(d)) parent.put(d, d)
          val (rs, rd) = (find(s), find(d))
          // union toward the smaller root so the final root IS the min id
          if (rs < rd) parent.put(rd, rs) else if (rd < rs) parent.put(rs, rd)
        }
        val out = Iterator.newBuilder[(Long, Long)]
        parent.keySet().forEach(n => out += ((n, find(n))))
        out.result()
      }
      .toDF("node", "component")
  }

  /** BFS hop distance from `source`, bounded at `maxDepth` hops. Output:
    * (node: Long, dist: Int) for reached nodes only. Adaptive like
    * [[connectedComponents]]: single-task adjacency BFS under the local
    * threshold, level-synchronous DataFrame BFS ([[dfBfs]]) above it.
    * The Pregel variant remains available ([[pregelBfs]]) for the A/B
    * (tools/ProfileBfs) and as a fallback, but the DataFrame path is the
    * distributed default: it stays in Tungsten memory end-to-end (no
    * VertexPartition caching, no RDD GC churn — the source of q34's
    * 10-75 s first-run spread at sf1), and per-level scans of the pruned
    * edge frame are the normal distributed BFS shape at cluster scale.
    */
  def bfs(spark: SparkSession, edges: DataFrame, source: Long, maxDepth: Int,
      edgePartitions: Option[Int] = None,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    if (underThreshold(edges, localThreshold))
      // eager, like every dfBfs level: the local kernel's plan references
      // the INPUT edge frame (a lazy mapPartitions), so a caller that
      // releases its edge cache after bfs() returns — q34 does, r18
      // verdict #5 — would silently re-pay the whole ingest on the first
      // result action (measured at sf0.1: q34 headline 3.13 s vs its
      // ingest+bfs phases 1.67 s; the gap was this uncached re-derive).
      // Bounded: the local path only admits <= localThreshold edge rows,
      // so the checkpointed result is at most ~2x that many (node, dist)
      // pairs — tens of MB.
      return localBfs(spark, edges, source, maxDepth).localCheckpoint(true)
    dfBfs(spark, edges, source, maxDepth)
  }

  /** Level-synchronous single-source BFS as DataFrame joins: per level,
    * join the frontier into the (undirected) edge frame, anti-join the
    * already-reached set, checkpoint the new frontier. The same frontier
    * discipline as the Cypher compiler's bfsFrames (Compiler.scala) —
    * each frontier is localCheckpointed so level n+1's plan starts from
    * the materialized frontier instead of re-deriving the whole lineage
    * (Catalyst cannot see how small a frontier is; an unchecked plan
    * sort-merge-joins the full edge frame per level).
    */
  private[graph] def dfBfs(spark: SparkSession, edges: DataFrame, source: Long,
      maxDepth: Int): DataFrame = {
    import spark.implicits._
    val ck = new IterCheckpointer(spark)
    val adj = {
      val e = edges.select(col("src"), col("dst"))
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    }
    val seed = Seq(source).toDF("node")
    if (maxDepth < 1) // degenerate bound: source at dist 0 iff it has an edge
      return seed.join(adj, col("node") === col("src"), "left_semi")
        .withColumn("dist", lit(0))
    // level 1 straight off the edge frame; source emitted at dist 0 iff it
    // appears in some edge (matching Pregel/localBfs, which only
    // materialize vertices present in the edge set)
    var frontier = ck.cut(adj.filter(col("src") === source)
      .select(col("dst").as("node")).distinct())
    val levels = collection.mutable.ArrayBuffer[DataFrame]()
    if (frontier.isEmpty) return spark.emptyDataset[(Long, Int)].toDF("node", "dist")
    levels += seed.withColumn("dist", lit(0))
    levels += frontier.withColumn("dist", lit(1))
    var reached = ck.cut(frontier.unionByName(seed))
    var depth = 1
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = ck.cut(frontier
        .join(adj, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(reached, Seq("node"), "left_anti"))
      if (!frontier.isEmpty) {
        levels += frontier.withColumn("dist", lit(depth))
        val prev = reached
        reached = ck.cut(reached.unionByName(frontier))
        // frontier cuts stay alive (every level frame is unioned into the
        // result); only the superseded reached-set accumulator is dead
        ck.release(prev)
      }
    }
    levels.reduce(_.unionByName(_))
      .select(col("node"), col("dist").cast(org.apache.spark.sql.types.IntegerType))
  }

  /** The GraphX Pregel BFS the DataFrame path replaced as the distributed
    * default — kept for the strategy A/B (tools/ProfileBfs; BfsSpec pins
    * the two agree) and as a reference implementation.
    */
  def pregelBfs(spark: SparkSession, edges: DataFrame, source: Long,
      maxDepth: Int, edgePartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val g = toGraph(edges, undirected = true, edgePartitions)
      .mapVertices((id, _) => if (id == source) 0 else Int.MaxValue)
    val res = g.pregel(Int.MaxValue, maxIterations = maxDepth)(
      (_, d, nd) => math.min(d, nd),
      t =>
        if (t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr)
          Iterator((t.dstId, t.srcAttr + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices
      .filter { case (_, d) => d <= maxDepth }
      .map { case (id, d) => (id, d) }
      .toDF("node", "dist")
  }

  /** Single-task level-synchronous BFS over an in-memory adjacency map.
    * Undirected; emits only nodes reached within `maxDepth` (the source is
    * emitted at dist 0 iff it appears in some edge, matching Pregel which
    * only materializes vertices present in the edge set).
    */
  private def localBfs(spark: SparkSession, edges: DataFrame, source: Long,
      maxDepth: Int): DataFrame = {
    import spark.implicits._
    edges.select("src", "dst").as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val adj = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Long]]()
        def add(a: Long, b: Long): Unit =
          adj.computeIfAbsent(a, _ => scala.collection.mutable.ArrayBuffer.empty) += b
        it.foreach { case (s, d) => add(s, d); add(d, s) }
        val dist = new java.util.HashMap[Long, Int]()
        if (adj.containsKey(source)) {
          dist.put(source, 0)
          var frontier = List(source)
          var depth = 0
          while (frontier.nonEmpty && depth < maxDepth) {
            depth += 1
            val next = List.newBuilder[Long]
            frontier.foreach { u =>
              val ns = adj.get(u)
              if (ns != null) ns.foreach { v =>
                if (!dist.containsKey(v)) { dist.put(v, depth); next += v }
              }
            }
            frontier = next.result()
          }
        }
        val out = Iterator.newBuilder[(Long, Int)]
        dist.forEach((n, d) => out += ((n, d)))
        out.result()
      }
      .toDF("node", "dist")
  }

  /** PageRank (bench-only — float-iterative, not oracle-hashable). Adaptive:
    * single-task power iteration below the local threshold (same update rule
    * as GraphX `staticPageRank`: ranks start at 1.0, each round every vertex
    * becomes 0.15 + 0.85 · Σ inbound rank/outDegree), Pregel above it.
    */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int = 10,
      edgePartitions: Option[Int] = None,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    import spark.implicits._
    if (underThreshold(edges, localThreshold))
      return localPageRank(spark, edges, iters)
    // PageRank deliberately STAYS on GraphX where BFS/CC moved to
    // DataFrame iterations (round 8): it is a dense every-vertex-every-
    // round algorithm run for a fixed 10+ iterations, so GraphX's
    // one-time partitioned graph build amortizes and its per-round cost
    // beats a per-round DataFrame join — measured 2x at sf1
    // (tools/ProfileBfs: df 15.8-17.8 s vs GraphX 6.9-8.8 s for 10
    // iterations on the 6M-edge graph). The frontier algorithms moved
    // because their per-round work SHRINKS (sparse frontiers, delta
    // iteration); PageRank's never does. [[dfPageRank]] remains for the
    // A/B, pinned equal within float tolerance by the spec.
    toGraph(edges, undirected = false, edgePartitions)
      .staticPageRank(iters)
      .vertices
      .map { case (id, pr) => (id, pr) }
      .toDF("node", "rank")
  }

  /** Static power iteration as DataFrame joins — the A/B counterpart that
    * measured SLOWER than GraphX for the dense fixed-iteration workload
    * (see [[pageRank]]'s strategy note): per round, ranks join the
    * directed edge frame, contributions hash-aggregate per destination,
    * and the new ranks are localCheckpointed. Same update rule and final
    * mass normalization as GraphX `staticPageRank` (ranks start at 1.0,
    * r' = 0.15 + 0.85·Σ inbound r/outDeg, final mass scaled to the vertex
    * count per SPARK-18847), which [[localPageRank]] mirrors — the spec
    * pins all three within float tolerance.
    */
  def dfPageRank(spark: SparkSession, edges: DataFrame,
      iters: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val vertices = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // (src, dst, __deg) — the loop's constant; persist so 10 rounds don't
    // re-derive the join (frame width: 2 keys + 1 long)
    val contribEdges = e.join(outDeg, "src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val ck = new IterCheckpointer(spark)
    var ranks = ck.cut(vertices.withColumn("rank", lit(1.0)))
    for (_ <- 1 to iters) {
      val msgs = contribEdges.join(ranks, col("src") === col("node"))
        .groupBy(col("dst").as("__n"))
        .agg(sum(col("rank") / col("__deg")).as("__m"))
      val prev = ranks
      ranks = ck.cut(ranks.join(msgs, col("node") === col("__n"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("__m"), lit(0.0))).as("rank")))
      ck.release(prev) // new ranks materialized; last round's frame is dead
    }
    contribEdges.unpersist(false)
    // normalize final mass to the vertex count (GraphX SPARK-18847);
    // coalesce guards the empty-graph degenerate (sum over zero rows is
    // null, which would MatchError the Row extractor)
    val Row(total: Double, n: Long) =
      ranks.agg(coalesce(sum(col("rank")), lit(0.0)), count(lit(1))).head()
    val scale = if (total == 0.0) 1.0 else n / total
    ranks.select(col("node"), (col("rank") * scale).as("rank"))
  }


  private def localPageRank(spark: SparkSession, edges: DataFrame,
      iters: Int): DataFrame = {
    import spark.implicits._
    edges.select("src", "dst").as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val outDeg = new java.util.HashMap[Long, Int]()
        val ranks = new java.util.HashMap[Long, Double]()
        es.foreach { case (s, d) =>
          outDeg.merge(s, 1, (a: Int, b: Int) => a + b)
          ranks.put(s, 1.0); ranks.put(d, 1.0)
        }
        for (_ <- 1 to iters) {
          val msg = new java.util.HashMap[Long, Double]()
          es.foreach { case (s, d) =>
            msg.merge(d, ranks.get(s) / outDeg.get(s), (a: Double, b: Double) => a + b)
          }
          ranks.keySet().forEach { v =>
            ranks.put(v, 0.15 + 0.85 * msg.getOrDefault(v, 0.0))
          }
        }
        // GraphX staticPageRank normalizes the final rank mass to the vertex
        // count (SPARK-18847: sinks leak mass otherwise); mirror that.
        var sum = 0.0
        ranks.values().forEach(r => sum += r)
        val scale = if (sum == 0.0) 1.0 else ranks.size() / sum
        val out = Iterator.newBuilder[(Long, Double)]
        ranks.forEach((n, r) => out += ((n, r * scale)))
        out.result()
      }
      .toDF("node", "rank")
  }

  /** Single-task triangle count over canonical deduped edges: per edge
    * (u,v), each common neighbor w closes one triangle; incrementing u, v
    * and w across all three edges of a triangle counts each member 3×, so
    * divide by 3 (matches GraphX per-vertex semantics, incl. emitting
    * 0-triangle vertices).
    */
  private def localTriangles(spark: SparkSession, canon: DataFrame): DataFrame = {
    import spark.implicits._
    canon.select("src", "dst").as[(Long, Long)].coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val adj = new java.util.HashMap[Long, java.util.HashSet[java.lang.Long]]()
        def add(a: Long, b: Long): Unit =
          adj.computeIfAbsent(a, _ => new java.util.HashSet[java.lang.Long]()).add(b)
        es.foreach { case (s, d) => add(s, d); add(d, s) }
        val cnt = new java.util.HashMap[Long, Long]()
        adj.keySet().forEach(v => cnt.put(v, 0L))
        es.foreach { case (u, v) =>
          val (small, large) =
            if (adj.get(u).size <= adj.get(v).size) (adj.get(u), adj.get(v))
            else (adj.get(v), adj.get(u))
          small.forEach { w =>
            if (w != u && w != v && large.contains(w)) {
              cnt.merge(u, 1L, (a: Long, b: Long) => a + b)
              cnt.merge(v, 1L, (a: Long, b: Long) => a + b)
              cnt.merge(w.longValue(), 1L, (a: Long, b: Long) => a + b)
            }
          }
        }
        val out = Iterator.newBuilder[(Long, Int)]
        cnt.forEach((n, c) => out += ((n, (c / 3).toInt)))
        out.result()
      }
      .toDF("node", "triangles")
  }

  /** Triangle count per vertex (bench-only). GraphX requires canonical
    * direction (src < dst) and deduplicated edges. Adaptive: single-task
    * set-intersection counting below the local threshold.
    */
  def triangleCount(spark: SparkSession, edges: DataFrame,
      localThreshold: Long = LocalEdgeThreshold): DataFrame = {
    import spark.implicits._
    val canon = edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // sized on the CALLER's frame (usually cached), not the derived canon:
    // |canon| <= |edges|, so edges under threshold implies canon is too;
    // edges past the prescreen would make counting canon a full distinct
    // pass just to choose a strategy
    if (underThreshold(edges, localThreshold))
      return localTriangles(spark, canon)
    val edgeRDD = canon.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    Graph.fromEdges(edgeRDD, 0)
      .triangleCount()
      .vertices
      .map { case (id, n) => (id, n) }
      .toDF("node", "triangles")
  }

  /** In/out/total degrees (G4). */
  def degrees(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    toGraph(edges, undirected = false)
      .degrees
      .map { case (id, d) => (id, d) }
      .toDF("node", "degree")
  }
}
