package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 testdata generator — same schema, value domains, and
  * join fan-outs as the driver-generated `/root/testdata/sf0.1` tables
  * (measured there: table list/column types, value sets, ~4 lineitems per
  * order, planted near-duplicate documents, L2-normalized clustered
  * embeddings), at 10× the fact-table row counts. Exists ONLY to extend
  * the bench's scale evidence to a third point (sf0.01/sf0.1/sf1);
  * correctness oracles keep running against the driver's own data. All
  * randomness is xxhash64 of (salt, id) — rerunning reproduces the same
  * bytes, no RNG state anywhere.
  *
  * Usage: `runMain graft.tools.GenData <outDir> [multiplier]` (multiplier
  * scales the sf0.1 row counts; default 10 = sf1).
  */
object GenData {
  private def h(salt: String, c: Column): Column = abs(xxhash64(lit(salt), c))
  /** uniform long in [0, n) */
  private def u(salt: String, c: Column, n: Long): Column = pmod(h(salt, c), lit(n))
  /** uniform double in [0, 1) */
  private def ud(salt: String, c: Column): Column =
    pmod(h(salt, c), lit(1000000L)) / 1000000.0
  private def pick(salt: String, c: Column, vs: Seq[String]): Column =
    element_at(array(vs.map(lit): _*), (u(salt, c, vs.size.toLong) + 1).cast("int"))

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val mult = if (args.length > 1) args(1).toDouble else 10.0
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def n0(base: Long): Long = math.max(1L, (base * mult).toLong)
    val nCust = n0(15000); val nSupp = n0(1000); val nPart = n0(20000)
    val nOrd = n0(150000); val nEv = n0(100000)
    val nDoc = n0(5000); val nEmb = n0(2000) / 5 * 2 // 2000 at sf0.1 scales 4x per decade

    def write(df: DataFrame, name: String, parts: Int): Unit =
      df.repartition(parts).write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name"), "region", 1)
    write((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "nation", 1)

    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      u("cn", col("id"), 25).cast("int").as("c_nationkey"),
      round(ud("cb", col("id")) * 11000 - 1000, 2).as("c_acctbal"),
      pick("cm", col("id"),
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).as("c_mktsegment")),
      "customer", 4)

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      u("sn", col("id"), 25).cast("int").as("s_nationkey"),
      round(ud("sb", col("id")) * 11000 - 1000, 2).as("s_acctbal")),
      "supplier", 1)

    val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat_ws(" ", pick("pa", col("id"), adjs), pick("pn", col("id"), nouns)).as("p_name"),
      format_string("Brand#%d", u("pb", col("id"), 25)).as("p_brand"),
      pick("pt", col("id"),
        Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")).as("p_type"),
      (u("ps", col("id"), 50) + 1).cast("int").as("p_size"),
      round(lit(900.0) + u("pr", col("id"), 1000) / 10.0, 1).as("p_retailprice")),
      "part", 4)

    val orders = spark.range(nOrd).select(
      col("id").as("o_orderkey"),
      u("oc", col("id"), nCust).as("o_custkey"),
      pick("os", col("id"), Seq("F", "O", "P")).as("o_orderstatus"),
      round(lit(1000.0) + ud("op", col("id")) * 499000.0, 2).as("o_totalprice"),
      to_timestamp(date_add(to_date(lit("1995-01-01")),
        u("od", col("id"), 2405).cast("int"))).as("o_orderdate"),
      pick("opr", col("id"),
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))
    write(orders, "orders", 16)

    // ~4 lines per order (uniform 1..7), keys salted per (order, line)
    val li0 = orders.select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1), (u("nl", col("o_orderkey"), 7) + 1).cast("int"))).as("l_linenumber"))
      .withColumn("__lk", col("o_orderkey") * 10 + col("l_linenumber"))
    write(li0.select(
      col("o_orderkey").as("l_orderkey"),
      u("lp", col("__lk"), nPart).as("l_partkey"),
      u("ls", col("__lk"), nSupp).as("l_suppkey"),
      col("l_linenumber"),
      (u("lq", col("__lk"), 50) + 1).cast("double").as("l_quantity"),
      round((u("lq", col("__lk"), 50) + 1) *
        (lit(900.0) + u("lu", col("__lk"), 1200) + ud("luc", col("__lk"))), 2).as("l_extendedprice"),
      round(u("ld", col("__lk"), 11) / 100.0, 2).as("l_discount"),
      round(u("lt", col("__lk"), 9) / 100.0, 2).as("l_tax"),
      pick("lr", col("__lk"), Seq("A", "N", "R")).as("l_returnflag"),
      pick("lls", col("__lk"), Seq("F", "O")).as("l_linestatus"),
      to_timestamp(date_add(to_date(col("o_orderdate")),
        (u("lsd", col("__lk"), 95) + 1).cast("int"))).as("l_shipdate")),
      "lineitem", 32)

    // monotone-ish event time: fixed stride over 30 days plus jitter
    val strideUs = 30L * 86400 * 1000000 / nEv
    write(spark.range(nEv).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1704067200000000L) + col("id") * strideUs +
        u("ej", col("id"), strideUs)).as("ts"),
      u("eu", col("id"), nCust / 10).as("user_id"),
      pick("et", col("id"), Seq("click", "error", "purchase", "signup", "view")).as("event_type"),
      round(ud("ev", col("id")) * 600.0, 2).as("value"),
      format_string("{\"k\": %d}", u("ek", col("id"), 100)).as("props")),
      "events", 8)

    // documents: 10..100 words from the sf0.1 31-word vocabulary; ~4% are
    // near-duplicates of doc (id-100) — same word sequence, last two words
    // perturbed — and a sliver of those stay EXACT duplicates, matching
    // the measured dup structure the dedup operators are benched on
    val vocab = Seq("a", "agg", "batch", "big", "column", "customer", "data", "fast",
      "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
      "query", "row", "scan", "slow", "small", "sort", "spark", "stream", "table",
      "the", "value", "vector", "window", "write")
    val voc = array(vocab.map(lit): _*)
    val docs0 = spark.range(nDoc)
      .withColumn("__dup", col("id") >= 200 && u("dup", col("id"), 25) === 0)
      .withColumn("__seed", when(col("__dup"), col("id") - 100).otherwise(col("id")))
      .withColumn("__nw", (u("dn", col("__seed"), 91) + 10).cast("int"))
      .withColumn("__words", transform(sequence(lit(0), col("__nw") - 1),
        i => element_at(voc, (pmod(xxhash64(lit("dw"), col("__seed"), i), lit(31L)) + 1).cast("int"))))
      .withColumn("__exact", col("__dup") && u("dx", col("id"), 20) === 0)
      .withColumn("__words", when(col("__dup") && !col("__exact"),
          concat(slice(col("__words"), lit(1), greatest(col("__nw") - 2, lit(1))),
            array(element_at(voc, (u("dp", col("id"), 31) + 1).cast("int")))))
        .otherwise(col("__words")))
      .withColumn("text", concat_ws(" ", col("__words")))
    write(docs0.select(
      col("id").as("doc_id"),
      col("text"),
      when(u("dl", col("__seed"), 100) < 41, "en")
        .when(u("dl", col("__seed"), 100) < 56, "de")
        .when(u("dl", col("__seed"), 100) < 71, "es")
        .when(u("dl", col("__seed"), 100) < 86, "fr")
        .otherwise("zh").as("lang"),
      format_string("src%d", u("ds", col("id"), 20)).as("source"),
      length(col("text")).cast("long").as("n_chars")),
      "documents", 4)

    // embeddings: 10 hash-derived centroids + per-vector noise, L2-normalized
    val raw = transform(sequence(lit(0), lit(63)), i =>
      (pmod(xxhash64(lit("ec"), col("label"), i), lit(2000L)) - 1000) / 1000.0 +
        (pmod(xxhash64(lit("en"), col("id"), i), lit(800L)) - 400) / 1000.0)
    write(spark.range(nEmb)
      .withColumn("label", u("el", col("id"), 10).cast("int"))
      .withColumn("__raw", raw)
      .withColumn("__norm", sqrt(aggregate(col("__raw"), lit(0.0), (a, x) => a + x * x)))
      .select(
        col("id").as("vec_id"),
        transform(col("__raw"), x => (x / col("__norm")).cast("float")).as("embedding"),
        col("label")),
      "embeddings", 1)

    println(s"generated $out: cust=$nCust supp=$nSupp part=$nPart ord=$nOrd " +
      s"ev=$nEv doc=$nDoc emb=$nEmb")
    spark.stop()
  }
}
