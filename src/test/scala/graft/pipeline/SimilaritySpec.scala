package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.999f, 0.01f, 0.0f)), // near dup of 0
    (2L, Seq(0.0f, 1.0f, 0.0f)), // orthogonal to 0
    (3L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Seq(0.7f, 0.7f, 0.0f)) // between 0 and 2
  ).toDF("vec_id", "embedding")

  test("dot and cosine are exact on unit vectors") {
    val c = vecs.as("a").crossJoin(vecs.as("b"))
      .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(c((0L, 2L))) < 1e-9)
    assert(math.abs(c((0L, 3L)) + 1.0) < 1e-9)
    assert(c((0L, 1L)) > 0.999)
  }

  test("brute-force top-k ranks the near-duplicate first") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
      "vec_id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 4L))
  }

  test("lsh signature is deterministic and buckets near-identical vectors together") {
    val sigs = vecs.select($"vec_id", Similarity.lshSignature($"embedding", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sigs2 = vecs.select($"vec_id", Similarity.lshSignature($"embedding", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs == sigs2, "deterministic across evaluations")
    assert(sigs(0L) == sigs(1L), "near-identical vectors share all sign bits")
    assert(sigs(0L) != sigs(3L), "opposite vectors flip every sign bit")
  }

  test("ivfTopK: deterministic, exact cosines, reasonable recall vs brute force") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf1 = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 4).collect()
    val ivf2 = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 4).collect()
    assert(ivf1.toSeq == ivf2.toSeq) // fixed-seed determinism
    val found = ivf1.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = found.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
    // cosines of found pairs must equal the exact computation (re-rank is exact)
    val exactCos = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf1.foreach { r =>
      assert(math.abs(r.getDouble(2) - exactCos((r.getLong(0), r.getLong(1)))) < 1e-12)
    }
  }

  test("native dot kernel: nulls on length mismatch, codegen'd in the plan") {
    val odd = Seq(
      (0L, Seq(1.0f, 2.0f), Seq(3.0f, 4.0f)),
      (1L, Seq(1.0f, 2.0f), Seq(3.0f)) // length mismatch → null
    ).toDF("id", "a", "b")
    val rows = odd.select($"id", Similarity.dot($"a", $"b").as("d"))
      .orderBy("id").collect()
    assert(rows(0).getDouble(1) == 11.0)
    assert(rows(1).isNullAt(1))
    // the kernel must live inside a WholeStageCodegen span, not fall back
    // (use a real scan — a local relation constant-folds to LocalTableScan)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(Similarity.dot(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val dotLine = plan.linesIterator.find(_.contains("graft_dot")).get.trim
    assert(dotLine.startsWith("*("), plan)
  }

  test("fused cosine kernel is bit-identical to the composed dot/norm form") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val pairs = emb.select($"vec_id".as("ia"), $"embedding".as("va"))
      .crossJoin(emb.select($"vec_id".as("ib"), $"embedding".as("vb")))
    val mismatches = pairs.select(
      Similarity.cosine($"va", $"vb").as("fused"),
      (Similarity.dot($"va", $"vb") /
        (Similarity.norm($"va") * Similarity.norm($"vb"))).as("composed"))
      .filter(!($"fused" <=> $"composed")) // null-safe exact-bits comparison
      .count()
    assert(mismatches == 0)
    // zero-norm vector → null (matching non-ANSI divide), not NaN
    val z = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(z.select(Similarity.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("lshSignatures (scale shape) is bit-identical to the per-row formula") {
    import org.apache.spark.sql.types._
    val withEmpty = vecs.unionByName(
      Seq((99L, Seq.empty[Float])).toDF("vec_id", "embedding"))
    val perRow = withEmpty
      .select($"vec_id", Similarity.lshSignature($"embedding", 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exploded = Similarity.lshSignatures(withEmpty, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exploded == perRow)
    assert(exploded(99L) == 0L) // empty vec: null-poisoned fold → 0, both shapes
  }

  test("cosineNearDup finds the planted pair via LSH blocking") {
    val pairs = Similarity.cosineNearDup(vecs, "vec_id", "embedding",
      threshold = 0.99, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("typed top-k aggregator matches the window row_number ranking") {
    import org.apache.spark.sql.expressions.Window
    // deterministic scored pairs with planted score TIES (ids 20/21 and
    // 30/31 share scores) — the aggregator must break them toward the
    // smaller id exactly like the window's (cos desc, corpus_id) order
    val rnd = new scala.util.Random(11)
    val rows = (for {
      q <- 0L until 6L
      c <- 0L until 40L
    } yield (q, c, math.rint(rnd.nextDouble() * 10) / 10)) ++
      Seq((0L, 20L, 0.95), (0L, 21L, 0.95), (1L, 30L, 0.5), (1L, 31L, 0.5))
    val scored = rows.toDF("query_id", "corpus_id", "cos")
      .dropDuplicates("query_id", "corpus_id")
    val k = 5
    val topk = udaf(new graft.functions.TopKAggregator(k))
    val viaAgg = scored.groupBy("query_id")
      .agg(topk(col("corpus_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("corpus_id"),
        col("t.score").as("cos"), (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    val viaWindow = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 6 * k)
  }

  test("cosineNearDup hot bucket is star-capped, not quadratic") {
    // 40 identical vectors share one signature bucket; with cap = 8 the
    // bucket must emit star pairs (n-1 = 39) instead of all n(n-1)/2 = 780,
    // and the observation must report the cap hit.
    val hot = (0L until 40L).map(i => (i, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val obs = new org.apache.spark.sql.Observation("hot_bucket")
    val pairs = Similarity.cosineNearDup(hot, "vec_id", "embedding",
      threshold = 0.99, bits = 4, cap = 8, obs = Some(obs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.size == 39, s"expected 39 star pairs, got ${pairs.size}")
    assert(pairs.forall(_._1 == 0L), "star pairs anchor on the bucket minimum")
    assert(obs.get("capped_buckets") == 1L)
    assert(obs.get("max_bucket_size") == 40)
  }

  test("ann recall query reports a recall in (0, 1] per method") {
    val rows = graft.SparkEntry.queries("q79_ann_recall")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows.keySet == Set("ivf", "lsh"))
    rows.values.foreach(v => assert(v > 0.0 && v <= 1.0))
  }
}
