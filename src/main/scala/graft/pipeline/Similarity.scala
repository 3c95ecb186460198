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
