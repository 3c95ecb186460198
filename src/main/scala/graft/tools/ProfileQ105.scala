package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage decomposition of q105's COLD cost (r18 optimization round): with
  * the store warm, time each piece the first q105 pays — the tagged
  * hetero union build+persist, the BFS, and the render — by running the
  * query once per stage boundary with caches selectively reset. Relies
  * on the per-JVM union cache: run #1 pays union+BFS+render, run #2 pays
  * BFS+render (bfsMemo is per-compilation, union cached), so deltas
  * attribute the cost.
  */
object ProfileQ105 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // store warm-up (the suite pays this at q100)
    t("store-warm (q102)")(graft.SparkEntry.queries("q102_cypher_truncate")(spark, dir).count())
    // seed-side pipeline alone: MATCH (o:Order {o_orderkey: 1})
    val store = t("store ref")(graft.graph.GraphStore.cached(dir)(
      graft.graph.GraphBuilder.buildAll(spark, dir)))
    val eng = graft.cypher.CypherEngine(store)
    t("order seed probe")(
      eng.run("MATCH (o:Order {o_orderkey: 1}) RETURN o.o_orderkey").count())
    // the two member edge frames' counts (memoized after first call)
    t("edgeCount CONTAINS")(println("  contains=" + store.edgeCount("CONTAINS")))
    t("edgeCount PLACED_BY")(println("  placed_by=" + store.edgeCount("PLACED_BY")))
    // replicate the tagged-union build shape and time persist+materialize
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.storage.StorageLevel
      def tag(l: String, c: org.apache.spark.sql.Column) =
        struct(lit(l).as("__l"), c.as("__k"))
      val u = Seq(("CONTAINS", "Order", "Part", "l_orderkey", "l_partkey"),
        ("PLACED_BY", "Order", "Customer", "o_orderkey", "o_custkey"))
        .map { case (lbl, sl, dl, ks, kt) =>
          val raw = store.edges(lbl)
          raw.select(tag(sl, col(ks)).as("__ds"), tag(dl, col(kt)).as("__dd"))
            .withColumn("__rt", lit(lbl))
            .unionByName(raw.select(tag(dl, col(kt)).as("__ds"),
              tag(sl, col(ks)).as("__dd")).withColumn("__rt", lit(lbl)))
        }.reduce(_.unionByName(_))
      val p = u.persist(StorageLevel.MEMORY_AND_DISK)
      t("manual union count#1")(p.count())
      t("manual union count#2")(p.count())
      val one = p.coalesce(1)
      t("union 1-task scan")(one.count())
      p.unpersist(true)
      val unp = t("unpersisted union count")(u.count())
      println("  union rows=" + unp)
    }
    // full q105, three times: #1 = union build + BFS + render,
    // #2/#3 = BFS + render (union cached per JVM)
    (1 to 3).foreach { i =>
      t(s"q105 #$i")(graft.SparkEntry.queries("q105_cypher_path_rels")(spark, dir).count())
    }
    // q85 (same union, no rels accumulation) for contrast
    (1 to 2).foreach { i =>
      t(s"q85 #$i")(graft.SparkEntry.queries("q85_cypher_hetero_shortest")(spark, dir).count())
    }
    spark.stop()
  }
}
