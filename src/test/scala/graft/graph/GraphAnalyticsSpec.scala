package graft.graph

import graft.SparkSpec

class GraphAnalyticsSpec extends SparkSpec {

  import spark.implicits._

  // two components: {1,2,3,4} chained, {10,11} pair
  private lazy val edges =
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")

  test("EdgePartition2D flag changes partitioning, not results") {
    val g = GraphAnalytics.toGraph(edges, undirected = true, edgePartitions = Some(4))
    assert(g.edges.getNumPartitions == 4)

    val plain = GraphAnalytics.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val partitioned = GraphAnalytics.connectedComponents(spark, edges, Some(4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partitioned == plain)
    assert(plain(4L) == 1L && plain(11L) == 10L)

    val bfsPlain = GraphAnalytics.bfs(spark, edges, source = 1L, maxDepth = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bfsPart = GraphAnalytics.bfs(spark, edges, source = 1L, maxDepth = 2, Some(4))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bfsPart == bfsPlain)
    assert(bfsPlain == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("adaptive local path agrees with the Pregel path") {
    // localThreshold = 0 forces the distributed Pregel implementation;
    // the default routes this 4-edge graph through single-task union-find.
    val ccDf = GraphAnalytics.connectedComponents(spark, edges, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccPregel = GraphAnalytics.pregelComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccLocal = GraphAnalytics.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccLocal == ccDf)
    assert(ccLocal == ccPregel)
    assert(ccLocal(4L) == 1L && ccLocal(11L) == 10L)

    // localThreshold = 0 forces the distributed DataFrame BFS; pregelBfs
    // is exercised directly (no longer the default distributed strategy)
    val bfsDf = GraphAnalytics.bfs(spark, edges, source = 2L, maxDepth = 3,
        localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bfsPregel = GraphAnalytics.pregelBfs(spark, edges, source = 2L, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bfsLocal = GraphAnalytics.bfs(spark, edges, source = 2L, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(bfsLocal == bfsDf)
    assert(bfsLocal == bfsPregel)
    assert(bfsLocal == Map(2L -> 0, 1L -> 1, 3L -> 1, 4L -> 2))
  }

  test("the three BFS strategies agree on random graphs") {
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val n = 30
      val es = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = es.toDF("src", "dst")
      val depth = 1 + rnd.nextInt(4)
      val src = es.head._1
      val local = GraphAnalytics.bfs(spark, df, src, depth)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val dist = GraphAnalytics.bfs(spark, df, src, depth, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val pregel = GraphAnalytics.pregelBfs(spark, df, src, depth)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(local == dist)
      assert(local == pregel)
    }
  }

  test("the three CC strategies agree on random graphs (sparse: long chains)") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      // sparse (n edges over 2n vertices) so components include chains —
      // multi-round label propagation, not one-hop stars
      val n = 40
      val es = Seq.fill(n)((rnd.nextInt(2 * n).toLong, rnd.nextInt(2 * n).toLong))
        .filter { case (a, b) => a != b }
      val df = es.toDF("src", "dst")
      val local = GraphAnalytics.connectedComponents(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = GraphAnalytics.connectedComponents(spark, df, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val pregel = GraphAnalytics.pregelComponents(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(local == dist)
      assert(local == pregel)
      // the pointer-doubling escalation path (escalateRounds=0 forces it
      // from round 1) must agree with all three
      spark.conf.set(GraphAnalytics.CcEscalateRoundsKey, "0")
      try {
        val jump = GraphAnalytics.connectedComponents(spark, df, localThreshold = 0)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(local == jump)
      } finally spark.conf.unset(GraphAnalytics.CcEscalateRoundsKey)
    }
  }

  test("reliable-checkpoint mode agrees with the localCheckpoint default") {
    // graft.checkpoint.dir routes every k-th lineage cut through a
    // reliable checkpoint() (fault tolerance on preemptible clusters);
    // results must be bit-identical to the local default in every loop
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val chain = (1L until 25L).map(i => (i, i + 1)).toDF("src", "dst")
    val bfsBefore = GraphAnalytics.bfs(spark, chain, 1L, 30, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ccBefore = GraphAnalytics.dfComponents(spark, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prBefore = GraphAnalytics.dfPageRank(spark, chain, 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    spark.conf.set(GraphAnalytics.CheckpointDirKey, dir)
    spark.conf.set(GraphAnalytics.CheckpointIntervalKey, "2")
    try {
      val bfsAfter = GraphAnalytics.bfs(spark, chain, 1L, 30, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val ccAfter = GraphAnalytics.dfComponents(spark, chain)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prAfter = GraphAnalytics.dfPageRank(spark, chain, 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(bfsAfter == bfsBefore)
      assert(ccAfter == ccBefore)
      assert(prAfter.keySet == prBefore.keySet &&
        prAfter.forall { case (k, v) => math.abs(v - prBefore(k)) < 1e-9 })
      // the reliable cut actually wrote into the directory
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "expected reliable checkpoint files under the conf'd dir")
    } finally {
      spark.conf.unset(GraphAnalytics.CheckpointDirKey)
      spark.conf.unset(GraphAnalytics.CheckpointIntervalKey)
    }
  }

  test("DataFrame CC converges on a worst-case-diameter path graph") {
    // a 60-node path: min-label propagation would need ~n rounds to flood
    // the min id end-to-end — past the escalation bound the delta
    // iteration hands off to pointer-doubling, which finishes in O(log n)
    // rounds; the result is still the component-min label for every node
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    val cc = GraphAnalytics.dfComponents(spark, chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 60 && cc.values.forall(_ == 1L))
    // the round accounting proves the escalation fired and the doubling
    // loop beat O(diameter): ~59 propagation rounds collapse into the
    // 10-round delta budget plus O(log 60) jump rounds
    val (delta, jump) = GraphAnalytics.LastCcRounds.get()
    assert(delta == GraphAnalytics.CcEscalateRoundsDefault, s"delta=$delta")
    assert(jump > 0 && jump <= 12, s"jump=$jump")
  }

  test("contraction CC matches union-find on adversarial shapes") {
    // each shape targets a contraction failure mode: a path (hook chains
    // the whole component through same-level parents — the in-level
    // pointer jump must root them), a star whose CENTER is the max id
    // (the center hooks to the min leaf, stranding the other leaves for
    // one extra level), a bipartite fan (the q33 shape: every dst
    // absorbs level 1), an imploding clique (the root loses all edges
    // and must be re-emitted by the compose step), and self-loops (kept
    // in the output, labeled by themselves)
    val shapes = Seq(
      "path" -> (1L to 50L).sliding(2).map(p => (p(0), p(1))).toSeq,
      "max-center star" -> (1L to 9L).map(i => (100L, i)),
      "bipartite fan" -> (1L to 6L).flatMap(c => Seq((c, 1000L + c), (c, 1000L + c + 1))),
      "imploding clique" -> (for { a <- 1L to 5L; b <- (a + 1) to 5L } yield (a, b)),
      "self-loops" -> Seq((7L, 7L), (1L, 2L), (3L, 3L), (2L, 3L)))
    shapes.foreach { case (name, es) =>
      val df = es.toDF("src", "dst")
      val local = GraphAnalytics.connectedComponents(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val contract = GraphAnalytics.contractComponents(spark, df, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(contract == local, s"shape '$name': $contract vs $local")
    }
  }

  test("CC strategy conf key routes between contract and delta") {
    val df = Seq((1L, 2L), (2L, 3L), (9L, 8L)).toDF("src", "dst")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L)
    try {
      spark.conf.set(GraphAnalytics.CcStrategyKey, "delta")
      val delta = GraphAnalytics.connectedComponents(spark, df, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      spark.conf.set(GraphAnalytics.CcStrategyKey, "contract")
      val contract = GraphAnalytics.connectedComponents(spark, df, localThreshold = 0)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(delta == expected && contract == expected)
    } finally spark.conf.unset(GraphAnalytics.CcStrategyKey)
  }

  test("contraction CC on random graphs, including released-block reuse") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 60
      val es = Seq.fill(n)((rnd.nextInt(2 * n).toLong, rnd.nextInt(2 * n).toLong))
      val df = es.toDF("src", "dst")
      val local = GraphAnalytics.connectedComponents(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val contract = GraphAnalytics.contractComponents(spark, df, localThreshold = 0)
      // the result frame must stay readable TWICE (released frames are
      // only ever the superseded intermediates, never the output)
      assert(contract.count() == local.size)
      val m = contract.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(m == local)
    }
  }

  test("checkpoint stats firewall keeps loop estimates O(1) digits") {
    // checkpoints preserve origin-plan statistics; inside a loop the
    // join estimates MULTIPLY the previous round's BigInt, so after k
    // rounds the size estimate has O(k) (propagation) or O(3^k)
    // (contraction) digits and the optimizer drowns in BigInteger
    // arithmetic — the sf100 q33 stall. The firewall rebinds every cut
    // to a bounded estimate; 25 self-join rounds must stay at a sane
    // digit count AND stay correct.
    import org.apache.spark.sql.functions.col
    val ck = new GraphAnalytics.IterCheckpointer(spark)
    var df = ck.cut(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    (1 to 25).foreach { _ =>
      val r = df.select(col("src").as("s2"), col("dst").as("d2"))
      df = ck.cut(df.join(r, col("dst") === col("s2"))
        .select(col("src"), col("d2").as("dst")))
    }
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes < BigInt(10).pow(25), s"stats compounded: ${bytes.toString.length} digits")
    // rows known → accurate rebound stats, visible to the planner
    val sized = ck.cut(Seq((9L, 9L)).toDF("src", "dst"), rows = 1L)
    val st = sized.queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(1)) && st.sizeInBytes == BigInt(64))
  }

  test("the three PageRank strategies agree on random graphs (float tolerance)") {
    val rnd = new scala.util.Random(13)
    val n = 25
    val es = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val df = es.toDF("src", "dst")
    def toMap(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val local = toMap(GraphAnalytics.pageRank(spark, df, iters = 10))
    // localThreshold = 0 forces the distributed default (GraphX — see
    // pageRank's strategy note); dfPageRank is the measured-slower A/B
    val graphx = toMap(GraphAnalytics.pageRank(spark, df, iters = 10, localThreshold = 0))
    val dfIter = toMap(GraphAnalytics.dfPageRank(spark, df, iters = 10))
    assert(local.keySet == graphx.keySet && local.keySet == dfIter.keySet)
    local.foreach { case (k, v) =>
      assert(math.abs(v - graphx(k)) < 1e-6, s"graphx mismatch at $k")
      assert(math.abs(v - dfIter(k)) < 1e-6, s"df mismatch at $k")
    }
  }

  test("DataFrame BFS: source absent from the edge set returns empty") {
    assert(GraphAnalytics.bfs(spark, edges, source = 99L, maxDepth = 3,
      localThreshold = 0).count() == 0)
  }

  test("degenerate bounds: maxDepth 0 and empty graphs") {
    // maxDepth = 0: source at dist 0 iff present in some edge — all three
    // BFS strategies agree
    val d0 = GraphAnalytics.bfs(spark, edges, source = 2L, maxDepth = 0,
        localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d0 == Map(2L -> 0))
    assert(GraphAnalytics.bfs(spark, edges, source = 2L, maxDepth = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap == d0)
    assert(GraphAnalytics.bfs(spark, edges, source = 99L, maxDepth = 0,
      localThreshold = 0).count() == 0)
    // empty edge frame: PageRank must not throw on the null mass sum
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(GraphAnalytics.dfPageRank(spark, empty, iters = 3).count() == 0)
    assert(GraphAnalytics.dfComponents(spark, empty).count() == 0)
  }

  test("local pagerank/triangles agree with GraphX") {
    import spark.implicits._
    // triangle {1,2,3} plus a pendant 4 and a disconnected pair
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (10L, 11L))
      .toDF("src", "dst")

    val prGx = GraphAnalytics.pageRank(spark, tri, iters = 10, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val prLocal = GraphAnalytics.pageRank(spark, tri, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(prLocal.keySet == prGx.keySet)
    prGx.foreach { case (n, r) => assert(math.abs(prLocal(n) - r) < 1e-9) }

    val tGx = GraphAnalytics.triangleCount(spark, tri, localThreshold = 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val tLocal = GraphAnalytics.triangleCount(spark, tri)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tLocal == tGx)
    assert(tLocal == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 0, 10L -> 0, 11L -> 0))
  }

  test("stats prescreen writes off a large uncached frame with NO Spark job") {
    import spark.implicits._
    // ~16 TB by plan statistics; actually counting it would hang the suite,
    // so the test passing quickly is itself evidence the count was skipped.
    val huge = spark.range(2L * 1000 * 1000 * 1000 * 1000)
      .select(org.apache.spark.sql.functions.col("id").as("src"),
        org.apache.spark.sql.functions.col("id").as("dst"))
    val tracker = spark.sparkContext.statusTracker
    val before = tracker.getJobIdsForGroup(null).toSet
    assert(!GraphAnalytics.underThreshold(huge, GraphAnalytics.LocalEdgeThreshold))
    val after = tracker.getJobIdsForGroup(null).toSet
    assert(after == before, "sizing a large-stats frame must not run a count job")

    // a CACHED frame still gets the exact count (runs against the cache)
    val small = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst").persist()
    try assert(GraphAnalytics.underThreshold(small, 10))
    finally small.unpersist()
  }
}
