package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over embedding columns
  * (`array<float>`; BASELINE.json north_star, SURVEY.md §2.10 X5/X6).
  *
  * Two paths:
  *  - brute-force cosine top-k (the exactness baseline): query-set ⨯ corpus
  *    join with a codegen'd dot product (zip_with + aggregate higher-order
  *    functions — no UDF), then windowed top-k;
  *  - LSH-bucketed (the 100 TB path): random-hyperplane signatures from
  *    deterministic per-dimension hash weights; candidates only from
  *    matching buckets, then exact re-rank. Probing b buckets bounds the
  *    scanned fraction at b/2^bits of the corpus.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a single codegen'd expression (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y), lit(0d), _ + _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * The corpus side is the big one; queries are broadcast, so the corpus
    * is scanned once with no shuffle before the (small) top-k aggregation.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Deterministic random-hyperplane weights: hyperplane h, dimension d →
    * a pseudo-random double in [-1, 1) derived from xxhash64(h, d). No RNG
    * state, reproducible across runs/partitionings.
    */
  private def hashWeight(h: Int, dIdx: Column): Column =
    (xxhash64(lit(h), dIdx).cast(DoubleType) / lit(Long.MaxValue.toDouble))

  /** `bits`-bit sign-LSH signature of a vector. */
  def lshSignature(vec: Column, bits: Int): Column = {
    val sigBits = (0 until bits).map { h =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => x.cast(DoubleType) * hashWeight(h, i)),
        lit(0d), _ + _)
      when(proj >= 0, shiftleft(lit(1L), h)).otherwise(lit(0L))
    }
    sigBits.reduce[Column]((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: candidates share the full signature bucket;
    * exact cosine re-ranks within candidates. Recall is tuned by `bits`
    * (fewer bits → bigger buckets → higher recall, more work).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, bits: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      lshSignature(col(vecCol), bits).as("sig"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshSignature(col(vecCol), bits).as("sig"))
    val scored = c.join(broadcast(q), Seq("sig"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer (MLlib, fixed
    * seed → deterministic) partitions the corpus into `nlist` cells; each
    * query probes its `nprobe` nearest cells and exact cosine re-ranks only
    * those candidates. The scanned fraction is ≈ nprobe/nlist of the
    * corpus — the classic IVF-flat trade (higher nprobe → higher recall).
    *
    * Scale posture: centroids are driver-side small (nlist × dim) and
    * broadcast into the assignment join; the corpus is scanned once to
    * assign cells (in practice the assignment is precomputed and stored
    * alongside the embeddings — the cell column is just a partition key).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._

    val train = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10).fit(train)
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("cell", "centroid")

    // squared euclidean to each centroid; nlist is small → broadcast cross
    def dist2(v: Column, c: Column): Column =
      aggregate(zip_with(v, c, (x, y) => { val d = x.cast(DoubleType) - y; d * d }),
        lit(0d), _ + _)
    def assign(df: DataFrame, id: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(id).orderBy(col("d2"), col("cell"))
      df.crossJoin(broadcast(centroids))
        .select(col(id), col(vecCol), col("cell"),
          dist2(col(vecCol), col("centroid")).as("d2"))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("d2", "crank")
    }

    val corpusCells = assign(corpus.select(col(idCol).as("corpus_id"), col(vecCol)), "corpus_id", 1)
      .withColumnRenamed(vecCol, "cv")
    val queryCells = assign(queries.select(col(idCol).as("query_id"), col(vecCol)), "query_id", nprobe)
      .withColumnRenamed(vecCol, "qv")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("corpus_id"))
    corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs (X dedup family): all pairs whose
    * cosine ≥ `threshold`, found via LSH blocking + exact verification.
    */
  def cosineNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 10): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), bits).as("sig"))
    val l = v.select(col("sig"), col("id").as("id_a"), col("v").as("va"))
    val r = v.select(col("sig"), col("id").as("id_b"), col("v").as("vb"))
    l.join(r, Seq("sig"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
