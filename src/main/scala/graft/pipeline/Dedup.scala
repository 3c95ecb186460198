package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection for training-data pipelines (BASELINE.json
  * north_star; SURVEY.md §2.10). Four families:
  *
  *  - exact: content-hash groupBy (sha256) — see TextQueries q44;
  *  - MinHash + LSH banding: shingle → k minhashes → band buckets →
  *    candidate pairs from bucket joins (never all-pairs);
  *  - SimHash: 64-bit weighted-feature fingerprint, near-dup = small
  *    Hamming distance;
  *  - n-gram Jaccard verification of candidate pairs.
  *
  * Everything is built from codegen'd built-ins (`xxhash64`, higher-order
  * array functions) — no Scala UDFs in the hot path, so whole-stage codegen
  * spans the signature computation.
  *
  * Scale posture (100 TB): the only shuffles are (a) the explode+groupBy
  * computing signatures (map-side combinable) and (b) the bucket self-join,
  * whose fan-out is bounded by bucket size — hot buckets are the classic
  * skew case, so callers should enable AQE skew-join (our sessions do).
  * All-pairs comparison never happens.
  */
object Dedup {

  /** Lower-cased whitespace tokens of `textCol` as an array column. */
  def tokensArr(textCol: Column): Column =
    filter(split(lower(textCol), " "), t => t =!= "")

  /** Word n-gram shingles: n consecutive tokens joined with a U+0001
    * separator (keeps "ab"+"c" distinct from "a"+"bc").
    */
  def shingles(textCol: Column, n: Int): Column = {
    val toks = tokensArr(textCol)
    // transform over a sliding index range; slice is 1-based.
    val idx = sequence(lit(1), greatest(size(toks) - (n - 1), lit(1)))
    array_distinct(transform(idx, i => array_join(slice(toks, i, lit(n)), "\u0001")))
  }

  /** MinHash signature: for seed i, sig_i = min over shingles of
    * xxhash64(i, shingle). Returns an array<bigint> of length `k`.
    * One expression tree, fully codegen'd.
    */
  def minhashSignature(shingleArr: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingleArr, sh => xxhash64(lit(i), sh)))
    }: _*)

  /** LSH banding: docs → (band, bucketHash) rows; docs sharing a bucket in
    * any band are candidate duplicates (standard MinHash-LSH: `bands` bands
    * of `rows = k/bands` signature rows each).
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val sig = df.select(col(idCol).as("id"), minhashSignature(shingles(col(textCol), 3), k).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate near-duplicate pairs from LSH bucket co-membership
    * (id_a < id_b, deduplicated across bands).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16): DataFrame = {
    val b = lshBuckets(df, idCol, textCol, k, bands)
    val l = b.select(col("band"), col("bucket"), col("id").as("id_a"))
    val r = b.select(col("band"), col("bucket"), col("id").as("id_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard over token shingles for verification of candidate pairs
    * (join candidates back to shingle sets; intersection via
    * array_intersect on the paired rows — candidates only, never all pairs).
    */
  def verifyJaccard(df: DataFrame, candidates: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** SimHash: 64-bit fingerprint — bit j of the hash of each token votes
    * +1/-1; fingerprint bit j = sign of the vote sum. Computed per-document
    * with higher-order functions (aggregate over tokens), no UDF.
    */
  def simhash(textCol: Column): Column = {
    val toks = tokensArr(textCol)
    // votes: array of 64 ints; aggregate tokens, each contributing ±1 per bit.
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        transform(acc, (v, j) =>
          v + when(call_function("shiftright", h, j).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
      })
    // fold bits back into a single long
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, j) => struct(v.as("v"), j.as("j"))),
      lit(0L),
      (acc, s) => acc.bitwiseOR(
        when(s.getField("v") > 0, call_function("shiftleft", lit(1L), s.getField("j")))
          .otherwise(lit(0L))))
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a DataFrame, blocked on the top
    * `blockBits` bits to avoid all-pairs (documents differing only in low
    * bits collide into a block; standard multi-probe would add rotations).
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, blockBits: Int = 12): DataFrame = {
    val withSig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .withColumn("block", shiftrightunsigned(col("sig"), 64 - blockBits))
    val l = withSig.select(col("block"), col("id").as("id_a"), col("sig").as("sig_a"))
    val r = withSig.select(col("block"), col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .filter(hamming(col("sig_a"), col("sig_b")) <= maxHamming)
      .select(col("id_a"), col("id_b"), hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .distinct()
  }
}
