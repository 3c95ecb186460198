package graft.tools

import org.apache.spark.sql.SparkSession

import graft.graph.{GraphBuilder, GraphStore}

/** One-time graph-store ingest: build the declared property graph from a
  * scale-factor directory and [[graft.graph.GraphStore.save]] it under
  * `<storeRoot>/<sfBasename>`. Query sessions launched with
  * `SPARK_GRAFT_STORE_ROOT=<storeRoot>` then LOAD the saved store instead
  * of rebuilding ([[GraphBuilder.openOrBuild]]) — the reference's
  * once-per-upload injection flow (final/app.py upload→inject→query), and
  * the accounting split r17's sf100 BFS measurements needed: the ~150 s
  * relational→graph build is paid HERE, reported separately, and the BFS
  * family's first-run numbers then carry only store-LOAD + query.
  *
  * The write is STAGED to bound the single-action disk footprint (first
  * attempt at sf100 died: the CONTAINS dedup shuffle + two FK semi-join
  * shuffles + the save-time sort spill were all live inside one action,
  * >53 GB on 600M fat rows):
  *   1. materialize each built frame UNSORTED to `<out>.staging` — the
  *      build's shuffle files die with each frame's action (periodic GC);
  *   2. reload the staged parquet and run the standard sorted
  *      [[GraphStore.save]] — only the per-partition sort spill is live,
  *      its input a compressed columnar scan;
  *   3. delete the staging dir.
  * On a cluster the same two phases are the normal ingest/compact split.
  *
  * Usage: runMain graft.tools.SaveStore <sfDir> <storeRoot>
  * Prints one JSON line:
  * {"sf":…,"store":…,"build_stage_sec":…,"sort_save_sec":…,"build_save_sec":…}.
  */
object SaveStore {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: SaveStore <sfDir> <storeRoot>")
    val (sfDir, storeRoot) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val out = s"$storeRoot/$sfName"
    val stage = s"$out.staging"

    val t0 = System.nanoTime()
    val built = GraphBuilder.buildAll(spark, sfDir)
    built.nodes.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$stage/nodes/$n")
    }
    built.edges.foreach { case (e, df) =>
      df.write.mode("overwrite").parquet(s"$stage/edges/$e")
    }
    val t1 = System.nanoTime()

    val staged = built.copy(
      nodes = built.nodes.keys.map(n =>
        n -> spark.read.parquet(s"$stage/nodes/$n")).toMap,
      edges = built.edges.keys.map(e =>
        e -> spark.read.parquet(s"$stage/edges/$e")).toMap)
    staged.save(out)
    val t2 = System.nanoTime()

    // staging cleanup through the same FS API save() writes with
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    stagePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(stagePath, true)

    val (bs, ss) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    println(s"""{"sf":"$sfDir","store":"$out","build_stage_sec":$bs,""" +
      s""""sort_save_sec":$ss,"build_save_sec":${bs + ss}}""")
    spark.stop()
  }
}
