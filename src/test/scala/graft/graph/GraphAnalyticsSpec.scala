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
}
