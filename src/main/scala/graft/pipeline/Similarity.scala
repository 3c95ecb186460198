package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

import graft.functions.{CosineSimilarity, DotProduct, TopKAggregator}

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`; BASELINE.json north_star, SURVEY.md §2.10 X5/X6).
  *
  * Two paths:
  *  - brute-force cosine top-k (the exactness baseline): query-set ⨯ corpus
  *    join with a NATIVE codegen'd dot-product kernel
  *    ([[graft.functions.DotProduct]] — a Catalyst expression with
  *    `doGenCode`, not a higher-order-function lambda tree, which would
  *    evaluate interpreted per candidate pair), then windowed top-k;
  *  - LSH-bucketed (the 100 TB path): random-hyperplane signatures from
  *    deterministic per-dimension hash weights; candidates only from
  *    matching buckets, then exact re-rank. Probing b buckets bounds the
  *    scanned fraction at b/2^bits of the corpus.
  *
  * Signature computation is the explode + map-side-combinable-SUM shape
  * (same reasoning as [[Dedup.minhashSignatures]]): per-row
  * `aggregate`/`zip_with` lambdas are NOT whole-stage-codegen'd, and a
  * bits×dim lambda tree per row dominates at scale. The exploded shape
  * keeps every operator inside codegen and shuffles only `bits` partial
  * sums per document.
  */
object Similarity {

  /** Σ aᵢ·bᵢ — native codegen'd kernel (double accumulation, element
    * order; null on length mismatch, matching null-padded zip semantics).
    */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Fused single-pass cosine — bit-identical to
    * `dot(a, b) / (norm(a) * norm(b))` but walks each array once instead
    * of three times per candidate pair.
    */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Shared re-rank tail of every ANN path: keep each query's k best
    * (cos desc, corpus_id asc) candidates via the typed [[TopKAggregator]].
    * Unlike a window row_number — which must shuffle EVERY scored candidate
    * to its query's partition before ranking — the aggregator's partial
    * aggregation forwards at most k rows per query from each map task, so
    * the shuffle is queries × k regardless of corpus size. Null scores
    * (zero-norm / mismatched vectors) are not rankable and are dropped.
    *
    * The aggregator's buffer holds ids as Long, so the id column must be
    * integral — validated here rather than letting a string id silently
    * cast to null and corrupt the ranking.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    scored.schema("corpus_id").dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case other => throw new IllegalArgumentException(
        s"ANN top-k needs an integral id column; corpus_id is $other " +
          "(derive one first, e.g. monotonically_increasing_id or xxhash64)")
    }
    val topk = udaf(new TopKAggregator(k))
    scored.filter(col("cos").isNotNull)
      .groupBy("query_id")
      .agg(topk(col("corpus_id"), col("cos")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("query_id"), col("t.id").as("corpus_id"),
        col("t.score").as("cos"), (col("pos") + 1).as("rank"))
  }

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The corpus side is the big one; queries are broadcast, so the corpus
    * is scanned once with no shuffle before the bounded top-k aggregation
    * ([[topKPerQuery]] — the shuffle carries k rows per query).
    *
    * Contract: candidates whose cosine is null (zero-norm or
    * length-mismatched vectors) are unrankable and dropped; a query whose
    * candidates are ALL null is omitted from the output entirely rather
    * than emitted with null-scored rows. Ids must be integral
    * ([[topKPerQuery]] rejects other types).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Deterministic random-hyperplane weights: hyperplane h, dimension d →
    * a pseudo-random double in [-1, 1) derived from xxhash64(h, d). No RNG
    * state, reproducible across runs/partitionings.
    */
  private def hashWeight(h: Int, dIdx: Column): Column =
    (xxhash64(lit(h), dIdx).cast(DoubleType) / lit(Long.MaxValue.toDouble))

  /** `bits`-bit sign-LSH signature as a per-row expression. CAUTION: the
    * `aggregate`/`zip_with` lambdas here evaluate INTERPRETED (HOFs are not
    * whole-stage-codegen'd) and the shingle array is re-walked once per
    * hyperplane — bits×dim lambda evaluations per row. Kept as the
    * reference semantics for tests and ad-hoc Column use; every engine
    * path uses [[lshSignatures]], which computes identical bits at scale.
    */
  def lshSignature(vec: Column, bits: Int): Column = {
    val sigBits = (0 until bits).map { h =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x.cast(DoubleType) * hashWeight(h, i)),
        lit(0d), _ + _)
      when(proj >= 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
    }
    sigBits.reduce[Column]((a, b) => a.bitwiseOR(b))
  }

  /** Sign-LSH signatures as a DataFrame `[idCol, sig: bigint]` — identical
    * bits to [[lshSignature]] (same weights, same left-to-right double
    * accumulation) computed in the scale shape: posexplode the vector,
    * take `bits` conditional SUMs per document (map-side combinable: the
    * shuffle carries `bits` doubles per doc), fold the signs into one
    * long. Whole-stage codegen end to end — no lambda evaluation.
    * Documents with an empty vector get signature 0L, matching the
    * per-row variant (whose fold null-poisons on the empty array, turning
    * every `when(proj >= 0, …)` bit into the otherwise-0 branch).
    */
  def lshSignatures(df: DataFrame, idCol: String, vecCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in 1..64 (got $bits)")
    // posexplode_OUTER keeps empty/null vectors as one null-element row, so
    // one scan + one hash aggregate covers every doc (the previous shape
    // re-scanned the input and left-joined the signatures back — a second
    // full pass at scale). The placeholder row's products are null, so an
    // empty vector's projections sum to null and every `>= 0` test takes
    // the otherwise-0 branch → signature 0L, the documented empty contract;
    // non-empty vectors gain no extra row and are unaffected.
    val ex = df.select(col(idCol), posexplode_outer(col(vecCol)).as(Seq("d", "x")))
    val projs = (0 until bits).map { h =>
      sum(col("x").cast(DoubleType) * hashWeight(h, col("d"))).as(s"_p$h")
    }
    val sigCol = (0 until bits).map { h =>
      when(col(s"_p$h") >= 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    ex.groupBy(idCol).agg(projs.head, projs.tail: _*)
      .select(col(idCol), sigCol.as("sig"))
  }

  /** Per-table sign-LSH signatures: `tables` independent `bits`-bit
    * signatures per row, one output row per (id, table). All tables'
    * projections ride ONE scan + ONE hash aggregate (hyperplane index
    * `t*bits + b` keys the deterministic weight stream), then explode
    * into (id, tbl, sig) rows — the classic multi-table LSH layout:
    * P(candidate found) = 1-(1-p^bits)^tables, so tables buys recall
    * where a single wider signature only loses it.
    */
  def lshSignaturesMulti(df: DataFrame, idCol: String, vecCol: String,
      bits: Int, tables: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, s"bits must be in 1..64 (got $bits)")
    require(tables >= 1, s"tables must be >= 1 (got $tables)")
    val ex = df.select(col(idCol), posexplode_outer(col(vecCol)).as(Seq("d", "x")))
    val projs = (0 until tables * bits).map { h =>
      sum(col("x").cast(DoubleType) * hashWeight(h, col("d"))).as(s"_p$h")
    }
    val sigs = (0 until tables).map { t =>
      val sigCol = (0 until bits).map { b =>
        val h = t * bits + b
        when(col(s"_p$h") >= 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
      struct(lit(t).as("tbl"), sigCol.as("sig"))
    }
    ex.groupBy(idCol).agg(projs.head, projs.tail: _*)
      .select(col(idCol), explode(array(sigs: _*)).as("__ts"))
      .select(col(idCol), col("__ts.tbl").as("tbl"), col("__ts.sig").as("sig"))
  }

  /** LSH-bucketed ANN top-k: candidates share a full signature bucket in
    * ANY of the `tables` independent tables (multi-table sign-LSH — r14:
    * the single-table form measured recall 0.02 at q79; the OR over
    * tables is what makes sign-LSH usable for cosine ANN); exact cosine
    * re-ranks the deduplicated candidate union. Recall tunes by
    * (bits, tables): fewer bits → bigger buckets, more tables → more
    * chances (candidates ≈ tables·n/2^bits per query).
    *
    * Scale posture: the bucket join carries IDS ONLY (the vector payload
    * would otherwise ride tables× through the shuffle) — pairs dedup on
    * (query, corpus) id, then ONE id-keyed join re-attaches corpus
    * vectors and the broadcast query side carries its own. The corpus
    * shuffles once on id and once on (tbl, sig); queries broadcast.
    *
    * Same output contract as [[bruteForceTopK]]: null-cosine candidates are
    * dropped, and a query with no rankable candidate (all-null, or an empty
    * signature bucket) is omitted from the output.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 12, tables: Int = 1): DataFrame = {
    val cSig = lshSignaturesMulti(corpus, idCol, vecCol, bits, tables)
      .select(col(idCol).as("corpus_id"), col("tbl"), col("sig"))
    val qSig = lshSignaturesMulti(queries, idCol, vecCol, bits, tables)
      .select(col(idCol).as("query_id"), col("tbl"), col("sig"))
    val pairs = cSig.join(broadcast(qSig), Seq("tbl", "sig"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "corpus_id")
      .dropDuplicates("query_id", "corpus_id")
    val scored = pairs
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")),
        Seq("corpus_id"))
      .join(broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"))), Seq("query_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer (MLlib, fixed
    * seed → deterministic) partitions the corpus into `nlist` cells; each
    * query probes its `nprobe` nearest cells and exact cosine re-ranks only
    * those candidates. The scanned fraction is ≈ nprobe/nlist of the
    * corpus — the classic IVF-flat trade (higher nprobe → higher recall).
    *
    * Scale posture: the quantizer trains on a bounded SAMPLE
    * (`fitSampleCap` vectors — centroid quality saturates long before 1M
    * training points; fitting the full corpus would iterate over 100 TB
    * ×maxIter). Centroids are driver-side small (nlist × dim) and
    * broadcast into the assignment join; the corpus is scanned once to
    * assign cells (in practice the assignment is precomputed and stored
    * alongside the embeddings — the cell column is just a partition key).
    *
    * Same output contract as [[bruteForceTopK]]: null-cosine candidates are
    * dropped, and a query with no rankable candidate in its probed cells is
    * omitted from the output.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4, fitSampleCap: Long = 1000000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    // limit() short-circuits: Spark reads only enough partitions to fill the
    // cap, so fitting never costs a full corpus pass (the previous
    // count()+sample needed TWO). The per-partition-prefix bias is fine for
    // a coarse quantizer — centroid quality saturates far below the cap, and
    // q79's recall measurement guards against drift. Below the cap this is
    // the whole corpus, unchanged.
    val train = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .limit(math.min(fitSampleCap, Int.MaxValue.toLong).toInt)
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10).fit(train)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")

    // squared euclidean via the codegen'd dot kernel:
    // |v-c|² = v·v − 2·v·c + c·c ; nlist is small → broadcast cross
    def dist2(v: Column, c: Column): Column =
      dot(v, v) - lit(2d) * dot(v, c) + dot(c, c)
    def scoredCells(df: DataFrame, id: String): DataFrame =
      df.crossJoin(broadcast(centroids))
        .select(col(id), col(vecCol), col("cell"),
          dist2(col(vecCol), col("centroid")).as("d2"))

    // Corpus side (the 100 TB side) keeps ONE cell per vector: a hash
    // aggregate — map-side combinable, the shuffle carries one row per
    // corpus vector — where a window rank would shuffle all nlist scored
    // rows per vector just to keep the first. min(struct) picks the same
    // (d2 asc, cell asc) winner the window's ORDER BY did; d2/cell ties are
    // impossible (cells are distinct per vector).
    val corpusCells = scoredCells(corpus.select(col(idCol).as("corpus_id"), col(vecCol)), "corpus_id")
      .groupBy("corpus_id")
      .agg(min(struct(col("d2"), col("cell"), col(vecCol).as("v"))).as("m"))
      .select(col("corpus_id"), col("m.cell").as("cell"), col("m.v").as("cv"))
    // Query side keeps nprobe cells — bounded and tiny; the window is fine.
    val w = Window.partitionBy("query_id").orderBy(col("d2"), col("cell"))
    val queryCells = scoredCells(queries.select(col(idCol).as("query_id"), col(vecCol)), "query_id")
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nprobe)
      .drop("d2", "crank")
      .withColumnRenamed(vecCol, "qv")
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs (X dedup family): pairs whose
    * cosine ≥ `threshold`, found via LSH blocking + exact verification.
    * Pair expansion goes through the capped [[Dedup.bucketPairs]] shape: a
    * degenerate hot signature (all-zero vectors, boilerplate embeddings)
    * would otherwise expand quadratically inside one task at scale; above
    * `cap` members a bucket emits star pairs against its minimum id, and
    * the `capped_buckets` / `max_bucket_size` metrics are published on
    * `obs` — no silent truncation.
    */
  def cosineNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 10, cap: Int = Dedup.DefaultBucketCap,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val v = df.select(col(idCol), col(vecCol))
      .join(lshSignatures(df, idCol, vecCol, bits), Seq(idCol))
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("sig"))
    // struct sorts by leading id field, so pair expansion yields id_a < id_b
    Dedup.bucketPairs(v, Seq("sig"), struct(col("id"), col("v")), cap, obs)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
