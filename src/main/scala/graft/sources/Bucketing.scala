package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed parquet tables — the at-rest layout that makes repeated joins
  * on one key co-located, so they run WITHOUT a shuffle on either side.
  *
  * Scale rationale (SCALING.md "Sources & layout"): at 100 TB the dominant
  * join (orders⋈lineitem on the order key, a node store⋈edge store on the
  * node key) shuffles both sides every query. Writing both tables bucketed
  * by that key moves the shuffle to WRITE time, once: Spark records the
  * bucket spec in the catalog, every subsequent equi-join on the bucket key
  * matches the two sides bucket-by-bucket (`SortMergeJoin` over pre-sorted
  * bucket files, no `Exchange` in the plan — pinned by BucketingSpec), and
  * bucket pruning skips files for selective key predicates. The reference
  * has no analogous layout concept (it re-reads whole CSVs per query,
  * final/sqlite_to_csv.py:25-38); this is Spark-native physical design.
  */
object Bucketing {

  /** Write `df` as an external bucketed parquet table: `buckets` buckets by
    * `keys`, each bucket file sorted by `keys` (sorted buckets let the
    * merge join skip its sort too). The table registers in the session
    * catalog under `table` with data at `path`; re-registering drops the
    * old entry first, so callers can re-run idempotently.
    *
    * Pick `buckets` so one bucket of the LARGEST co-bucketed table fits an
    * executor's task comfortably (bucket count must match across join
    * sides; it is the unit of join parallelism, so on a cluster use a
    * multiple of the executor-core count, not 8).
    */
  def saveBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, keys: Seq[String]): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key column")
    require(buckets > 0, s"bucket count must be positive (got $buckets)")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
