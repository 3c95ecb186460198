package graft.graph

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private[graph] def toGraph(edges: DataFrame, undirected: Boolean,
      edgePartitions: Option[Int] = None): Graph[Int, Int] = {
    val edgeRDD = edges.select("src", "dst").rdd.flatMap { r =>
      val e = Edge(r.getLong(0), r.getLong(1), 1)
      if (undirected) Iterator(e, Edge(r.getLong(1), r.getLong(0), 1)) else Iterator(e)
    }
    val g = Graph.fromEdges(edgeRDD, 0, StorageLevel.MEMORY_AND_DISK, StorageLevel.MEMORY_AND_DISK)
    edgePartitions.fold(g)(n => g.partitionBy(PartitionStrategy.EdgePartition2D, n))
  }

  /** Connected components (Pregel min-label propagation). Output:
    * (node: Long, component: Long) where component = min vertex id in the
    * component — deterministic.
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      edgePartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    toGraph(edges, undirected = true, edgePartitions)
      .connectedComponents()
      .vertices
      .map { case (id, comp) => (id, comp) }
      .toDF("node", "component")
  }

  /** BFS hop distance from `source`, bounded at `maxDepth` hops (Pregel).
    * Output: (node: Long, dist: Int) for reached nodes only.
    */
  def bfs(spark: SparkSession, edges: DataFrame, source: Long, maxDepth: Int,
      edgePartitions: Option[Int] = None): DataFrame = {
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

  /** PageRank (bench-only — float-iterative, not oracle-hashable). */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int = 10,
      edgePartitions: Option[Int] = None): DataFrame = {
    import spark.implicits._
    toGraph(edges, undirected = false, edgePartitions)
      .staticPageRank(iters)
      .vertices
      .map { case (id, pr) => (id, pr) }
      .toDF("node", "rank")
  }

  /** Triangle count per vertex (bench-only). GraphX requires canonical
    * direction (src < dst) and deduplicated edges.
    */
  def triangleCount(spark: SparkSession, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val canon = edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
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
