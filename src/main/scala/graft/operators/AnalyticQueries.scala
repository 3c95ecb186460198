package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Window functions, set operations, and scalar suites (SURVEY.md §2.2,
  * §2.5–§2.7). The reference reaches these semantics through pandas idioms
  * (value_counts().head, quantile thresholds — final/inject_relationship.py:154-188,
  * 269-270) and serial RCA queries (experimenting_new/rca.ipynb:345-354); here
  * they are single declarative plans.
  */
object AnalyticQueries {

  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)


  /** Per-customer order counts — shared input of Q16/Q20. */
  private def perCustCounts(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("cnt"))

  /** Row cap for single-task global ranking in Q20 (same adaptive-strategy
    * pattern as [[graft.graph.GraphAnalytics.LocalEdgeThreshold]]): at or
    * under it the unpartitioned window runs — one exchange into one small
    * task; above it the distributed range-sort + zipWithIndex path
    * computes identical ranks in parallel. 5M (o_custkey, cnt) rows ≈
    * 80 MB in one task, comfortably under task memory.
    */
  private val GlobalRankLocalRows = 5L * 1000 * 1000

  /** Monthly order counts — shared input of Q18/Q19. */
  private def monthlyCounts(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("cnt"))

  // ------------------------------------------------- Q16 descriptive stats
  /** A8/A9: the reference's degree-distribution stats
    * (final/inject_relationship.py:162-176) over per-customer order counts.
    * Integer inputs keep exact percentile interpolation bit-stable.
    */
  private def q16(s: SparkSession, dir: String): DataFrame =
    perCustCounts(s, dir).agg(
      min(col("cnt")).as("mn"),
      max(col("cnt")).as("mx"),
      avg(col("cnt")).as("avg_cnt"),
      expr("percentile(cnt, 0.90)").as("p90"),
      expr("percentile(cnt, 0.95)").as("p95"))

  private val q16Sql =
    """SELECT MIN(cnt) AS mn, MAX(cnt) AS mx, AVG(cnt) AS avg_cnt,
      |       quantile_cont(cnt, 0.90) AS p90, quantile_cont(cnt, 0.95) AS p95
      |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) pc""".stripMargin

  // ------------------------------------------------------ Q17 row_number topk
  /** W1: top-3 orders per customer (partitioned ranking). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    T(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_totalprice").as("price"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  private val q17Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice AS price, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  // --------------------------------------------------------------- Q18 lag
  /** W2: month-over-month deltas — the YoY comparisons the RCA agent issues
    * serially (experimenting_new/rca.ipynb:345-354) as one window pass.
    */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("month")
    monthlyCounts(s, dir)
      .withColumn("delta", col("cnt") - lag(col("cnt"), 1).over(w))
      .orderBy("month")
  }

  private val q18Sql =
    """SELECT month, cnt, cnt - LAG(cnt) OVER (ORDER BY month) AS delta
      |FROM (SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS cnt FROM orders GROUP BY 1) m
      |ORDER BY month""".stripMargin

  // ------------------------------------------------ Q19 running/moving frames
  /** W3/W5: running total + 3-month moving sum (the reference's last-15-batch
    * moving window, final/inject_relationship.py:113, generalized).
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("month")
    monthlyCounts(s, dir)
      .withColumn("run_cnt", sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("mov3", sum(col("cnt")).over(w.rowsBetween(-2, 0)))
      .orderBy("month")
  }

  private val q19Sql =
    """SELECT month, cnt,
      |  CAST(SUM(cnt) OVER (ORDER BY month ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cnt,
      |  CAST(SUM(cnt) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov3
      |FROM (SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS cnt FROM orders GROUP BY 1) m
      |ORDER BY month""".stripMargin

  // ------------------------------------------------------- Q20 ntile buckets
  /** W4: quantile-threshold classification (p90/p95 buckets of
    * final/inject_relationship.py:166-179) via ntile + percent_rank.
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    // Adaptive global ranking (r18 optimization round): `Window.orderBy`
    // with no partition key moves every per-customer row into ONE task
    // (Spark's own WindowExec warning) — a scale ceiling at O(customers).
    // Below [[GlobalRankLocalRows]] the single-task window is cheapest
    // (one exchange, no row-encode detour — measured 0.4 vs 0.8 s at
    // sf0.1) and the one task is small by the gate; above it, a
    // distributed range sort + zipWithIndex assigns each row its exact
    // global 0-based rank in parallel, and ntile/percent_rank are pure
    // functions of (rank, n): the order (cnt DESC, o_custkey) is total
    // (custkey is unique), so RANK == ROW_NUMBER and percent_rank =
    // rank/(n-1); ntile(k) gives the first n%k buckets ceil(n/k) rows
    // and the rest floor(n/k). Bit-identical on both strategies
    // (oracle-gated; the count that picks the strategy is the same
    // aggregate either path needs).
    val pc = perCustCounts(s, dir)
    // strategy pick without an extra aggregate pass where possible:
    // |customers| <= |orders|, and a bare-scan count() is answered from
    // parquet footer statistics in milliseconds
    val underCap = T(s, dir, "orders").count() <= GlobalRankLocalRows
    quartileRank(pc, GlobalRankLocalRows, knownUnderCap = underCap)
      .orderBy("o_custkey")
  }

  /** ntile(4)+percent_rank over (cnt DESC, o_custkey) with the adaptive
    * strategy described at [[GlobalRankLocalRows]]; `localRowCap` is a
    * parameter so AnalyticsSpec can force both paths and pin them
    * row-identical (package-private for exactly that spec).
    * `knownUnderCap` skips the exact count when the caller already holds
    * a cheap row-count upper bound at or under the cap.
    */
  private[operators] def quartileRank(pc: DataFrame, localRowCap: Long,
      knownUnderCap: Boolean = false): DataFrame = {
    val s = pc.sparkSession
    val n = if (knownUnderCap) 0L else pc.count()
    if (knownUnderCap || n <= localRowCap) {
      val w = Window.orderBy(col("cnt").desc, col("o_custkey"))
      return pc
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
    }
    val k = 4L
    val q = n / k
    val r = n % k
    val schema = org.apache.spark.sql.types.StructType(
      pc.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("quartile",
          org.apache.spark.sql.types.IntegerType, nullable = true),
        org.apache.spark.sql.types.StructField("pr", DoubleType, nullable = true)))
    val ranked = pc.orderBy(col("cnt").desc, col("o_custkey"))
      .rdd.zipWithIndex.map { case (row, rank0) =>
        val quartile =
          if (q == 0L) rank0 + 1L
          else if (rank0 < r * (q + 1L)) rank0 / (q + 1L) + 1L
          else r + (rank0 - r * (q + 1L)) / q + 1L
        val pr = if (n <= 1L) 0.0 else rank0.toDouble / (n - 1L).toDouble
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq ++ Seq[Any](quartile.toInt, pr))
      }
    s.createDataFrame(ranked, schema)
  }

  private val q20Sql =
    """SELECT o_custkey, cnt,
      |  NTILE(4) OVER (ORDER BY cnt DESC, o_custkey) AS quartile,
      |  PERCENT_RANK() OVER (ORDER BY cnt DESC, o_custkey) AS pr
      |FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) pc
      |ORDER BY o_custkey""".stripMargin

  // ------------------------------------------------------------ Q21 top-k
  /** O4/A12: top-5 parts by lineitem count — TakeOrderedAndProject, no global
    * sort of the full aggregate.
    */
  private def q21(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_partkey"))
      .limit(5)

  private val q21Sql =
    """SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
      |ORDER BY cnt DESC, l_partkey LIMIT 5""".stripMargin

  // ----------------------------------------------------------- Q22 union
  /** U1/U2: union-distinct of customer and supplier nation keys. */
  private def q22(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .union(T(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy("nk")

  private val q22Sql =
    """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin

  /** U1: union-all row accounting. */
  private def q22a(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .unionAll(T(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .agg(count(lit(1)).as("cnt"))

  private val q22aSql =
    "SELECT COUNT(*) AS cnt FROM (SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier) u"

  // ------------------------------------------------------- Q22b collect_set
  /** A17: collect_set with deterministic rendering (sorted + joined). */
  private def q22b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"))
      .orderBy("o_custkey")

  private val q22bSql =
    """SELECT o_custkey, string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------- Q23 intersect
  /** U3: nations having both customers and suppliers. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .intersect(T(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  private val q23Sql =
    "SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY nk"

  // ------------------------------------------------------------- Q24 except
  /** U4: nations with customers but no suppliers. */
  private def q24(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "customer").select(col("c_nationkey").as("nk"))
      .except(T(s, dir, "supplier").select(col("s_nationkey").as("nk")))
      .orderBy("nk")

  private val q24Sql =
    "SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier ORDER BY nk"

  // ------------------------------------------------------- Q25 string suite
  /** P9: scalar string functions (reference uses toLower for value probes,
    * final/langraph_neo4j3.py:360).
    */
  private def q25(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part").select(
      col("p_partkey"),
      lower(col("p_name")).as("lo"),
      upper(col("p_brand")).as("up"),
      substring(col("p_type"), 1, 5).as("sub"),
      trim(concat(lit(" "), col("p_name"), lit(" "))).as("tr"),
      regexp_replace(col("p_name"), "a", "#").as("rep"),
      length(col("p_name")).cast(LongType).as("len"),
      col("p_brand").like("Brand%").as("lk"))
      .orderBy("p_partkey")

  private val q25Sql =
    """SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up, substr(p_type, 1, 5) AS sub,
      |  trim(concat(' ', p_name, ' ')) AS tr, replace(p_name, 'a', '#') AS rep,
      |  CAST(length(p_name) AS BIGINT) AS len, (p_brand LIKE 'Brand%') AS lk
      |FROM part ORDER BY p_partkey""".stripMargin

  /** A13: mean string length (complexity signal, final/inject_node.py:122). */
  private def q25b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "part").agg(avg(length(col("p_name"))).as("avg_len"))

  private val q25bSql = "SELECT AVG(length(p_name)) AS avg_len FROM part"

  // ------------------------------------------- Q26 timestamp decomposition
  /** P7/P10: the reference's six-component timestamp expansion
    * (final/sqlite_to_csv.py:61-81) as extraction functions.
    */
  private def q26(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .filter(col("event_id") < 100)
      .select(
        col("event_id"),
        year(col("ts")).as("ts_year"),
        month(col("ts")).as("ts_month"),
        dayofmonth(col("ts")).as("ts_day"),
        hour(col("ts")).as("ts_hour"),
        minute(col("ts")).as("ts_minute"),
        second(col("ts")).as("ts_second"))
      .orderBy("event_id")

  private val q26Sql =
    """SELECT event_id,
      |  CAST(date_part('year', ts) AS INTEGER) AS ts_year,
      |  CAST(date_part('month', ts) AS INTEGER) AS ts_month,
      |  CAST(date_part('day', ts) AS INTEGER) AS ts_day,
      |  CAST(date_part('hour', ts) AS INTEGER) AS ts_hour,
      |  CAST(date_part('minute', ts) AS INTEGER) AS ts_minute,
      |  CAST(date_part('second', ts) AS INTEGER) AS ts_second
      |FROM events WHERE event_id < 100 ORDER BY event_id""".stripMargin

  /** P10/A2: orders-per-year histogram (grouping on an extracted field). */
  private def q26b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y")).agg(count(lit(1)).as("cnt"))
      .orderBy("y")

  private val q26bSql =
    """SELECT CAST(date_part('year', o_orderdate) AS INTEGER) AS y, COUNT(*) AS cnt
      |FROM orders GROUP BY 1 ORDER BY y""".stripMargin

  // ---------------------------------------------------------- Q27 math suite
  /** P13: scalar math on exact integer-derived values. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_orderkey") - 1000).as("a"),
        round(col("l_quantity")).as("r"),
        floor(col("l_quantity") / 7).cast(LongType).as("f"),
        ceil(col("l_quantity") / 7).cast(LongType).as("c"),
        pmod(col("l_orderkey"), lit(7)).as("m"),
        pow(col("l_linenumber"), 2).as("p"),
        sqrt(col("l_orderkey").cast(DoubleType)).as("sq"))
      .orderBy("l_orderkey", "l_linenumber")

  private val q27Sql =
    """SELECT l_orderkey, l_linenumber, ABS(l_orderkey - 1000) AS a, ROUND(l_quantity) AS r,
      |  CAST(FLOOR(l_quantity / 7) AS BIGINT) AS f, CAST(CEIL(l_quantity / 7) AS BIGINT) AS c,
      |  MOD(l_orderkey, 7) AS m, POWER(l_linenumber, 2) AS p, SQRT(CAST(l_orderkey AS DOUBLE)) AS sq
      |FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** P11: distribution hash (reference: final/inject_relationship.py:225) —
    * engine-side xxhash64, verified by self-consistency (bucket counts sum to
    * total; no DuckDB equivalent, rows-only check).
    */
  private def q27b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "lineitem")
      .select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(32)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  // ------------------------------------------------------ Q28 null profiling
  /** P12/A7: per-column null counts (reference: final/inject_node.py:94-95). */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    val e = T(s, dir, "events")
    e.agg(
      sum(when(col("props").isNull, 1).otherwise(0)).cast(LongType).as("null_props"),
      sum(when(col("value").isNull, 1).otherwise(0)).cast(LongType).as("null_value"),
      sum(when(col("user_id").isNull, 1).otherwise(0)).cast(LongType).as("null_user"))
  }

  private val q28Sql =
    """SELECT CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_props,
      |       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
      |       CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user
      |FROM events""".stripMargin

  /** P12: CASE WHEN bucketing. */
  private def q28b(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(when(col("value") < 50, "low")
        .when(col("value") < 150, "mid")
        .otherwise("high").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  private val q28bSql =
    """SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 150 THEN 'mid' ELSE 'high' END AS bucket,
      |       COUNT(*) AS cnt
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  // -------------------------------------------------------- Q29 array columns
  /** P15: array-typed (embedding) columns — cardinality accounting. */
  private def q29(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "embeddings")
      .groupBy("label")
      .agg(count(lit(1)).as("cnt"),
        sum(size(col("embedding")).cast(LongType)).cast(LongType).as("dims"))
      .orderBy("label")

  private val q29Sql =
    """SELECT label, COUNT(*) AS cnt, CAST(SUM(len(embedding)) AS BIGINT) AS dims
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  // ------------------------------------------------------ Q30 JSON extraction
  /** P14: JSON field extraction from `events.props`. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  private val q30Sql =
    """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS cnt
      |FROM events GROUP BY k ORDER BY k""".stripMargin

  // --------------------------------------------------- Q55 approx distinct
  /** A6: HLL++ approximate distinct — the 100 TB substitute for exact
    * COUNT(DISTINCT) (SURVEY.md §2.4 A6). r13 (r12 verdict directive #8):
    * TOLERANCE-oracled instead of rows-only — the sketch estimates land
    * as ok/off flags against exact counts computed in the same
    * aggregation (rsd 0.01, asserted within ±2.3%), and the DuckDB oracle
    * cross-checks the exact counts plus the flags' expected 'ok'. The
    * sketch value itself stays pinned by AnalyticSpec's relative-error
    * vector; only the deterministic projection is hash-compared.
    */
  private def q55(s: SparkSession, dir: String): DataFrame = {
    val li = T(s, dir, "lineitem")
    // sketches and exact distincts in SEPARATE aggregations (all 1-row
    // frames, cross-joined): mixing countDistinct with HLL in one agg
    // makes the single-distinct rewrite key its partial phase by the
    // distinct column — an HLL buffer PER DISTINCT KEY (15M at sf10),
    // which OOMs a 16g local JVM; two distinct columns in one agg would
    // Expand (double) the fact scan instead. Separated, the exact counts
    // run the classic two-phase dedup and the HLL agg holds exactly two
    // buffers.
    val o = li.agg(countDistinct(col("l_orderkey")).as("exact_orders"))
    val p = li.agg(countDistinct(col("l_partkey")).as("exact_parts"))
    val a = li.agg(
      approx_count_distinct(col("l_orderkey"), 0.01).as("__ao"),
      approx_count_distinct(col("l_partkey"), 0.01).as("__ap"))
    o.crossJoin(p).crossJoin(a).select(
      col("exact_orders"),
      col("exact_parts"),
      when(abs(col("__ao") - col("exact_orders")) <=
        col("exact_orders") * 0.023, "ok").otherwise("off").as("orders_est"),
      when(abs(col("__ap") - col("exact_parts")) <=
        col("exact_parts") * 0.023, "ok").otherwise("off").as("parts_est"))
  }

  // ------------------------------------------------------------------ registry

  val defs: Map[String, Q] = Map(
    "q55_approx_distinct" -> q55 _,
    "q16_degree_stats" -> q16 _,
    "q17_rownumber_topk" -> q17 _,
    "q18_lag_delta" -> q18 _,
    "q19_running_moving" -> q19 _,
    "q20_ntile_quartiles" -> q20 _,
    "q21_topk_counts" -> q21 _,
    "q22_union_distinct" -> q22 _,
    "q22a_union_all" -> q22a _,
    "q22b_collect_set" -> q22b _,
    "q23_intersect" -> q23 _,
    "q24_except" -> q24 _,
    "q25_string_suite" -> q25 _,
    "q25b_avg_strlen" -> q25b _,
    "q26_ts_decompose" -> q26 _,
    "q26b_year_histogram" -> q26b _,
    "q27_math_suite" -> q27 _,
    "q27b_hash_distribution" -> q27b _,
    "q28_null_profile" -> q28 _,
    "q28b_case_buckets" -> q28b _,
    "q29_array_cardinality" -> q29 _,
    "q30_json_extract" -> q30 _
  )

  val oracle: Map[String, String] = Map(
    // q55 (r13): exact counts hash-compared; the sketch estimates are
    // engine-side tolerance flags whose expected value is 'ok'
    "q55_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
         count(DISTINCT l_partkey) AS exact_parts,
         'ok' AS orders_est, 'ok' AS parts_est
         FROM lineitem""",
    "q16_degree_stats" -> q16Sql,
    "q17_rownumber_topk" -> q17Sql,
    "q18_lag_delta" -> q18Sql,
    "q19_running_moving" -> q19Sql,
    "q20_ntile_quartiles" -> q20Sql,
    "q21_topk_counts" -> q21Sql,
    "q22_union_distinct" -> q22Sql,
    "q22a_union_all" -> q22aSql,
    "q22b_collect_set" -> q22bSql,
    "q23_intersect" -> q23Sql,
    "q24_except" -> q24Sql,
    "q25_string_suite" -> q25Sql,
    "q25b_avg_strlen" -> q25bSql,
    "q26_ts_decompose" -> q26Sql,
    "q26b_year_histogram" -> q26bSql,
    "q27_math_suite" -> q27Sql,
    "q28_null_profile" -> q28Sql,
    "q28b_case_buckets" -> q28bSql,
    "q29_array_cardinality" -> q29Sql,
    "q30_json_extract" -> q30Sql
    // q27b_hash_distribution: engine-side xxhash64 — no DuckDB equivalent,
    // rows-only check by design (SURVEY.md §2.12 Q27 note).
  )
}
