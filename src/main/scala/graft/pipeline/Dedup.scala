package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
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

  /** One row per lower-cased whitespace token: `[id, pos, t]`. The
    * posexplode + filter pipeline is whole-stage-codegen'd end to end —
    * unlike the higher-order-function route ([[tokensArr]]), whose lambdas
    * evaluate interpreted. Position gaps from dropped empty tokens don't
    * matter to consumers, which only use `pos` for ordering.
    */
  def tokenRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "t")))
      .filter(col("t") =!= "")

  /** 3-gram shingle HASHES, one row per shingle: `[id, h]`. The shingle
    * string is never materialized — each token is hashed once, and the
    * n-gram hash combines the n token hashes via a window `lead`, keeping
    * the whole pipeline inside codegen (no lambda evaluation, no string
    * allocation). Docs shorter than `n` tokens contribute their single
    * partial shingle (matching [[shingles]]' short-text fallback).
    * MinHash/Jaccard over hashed shingles is equivalent to over strings
    * up to 64-bit hash collisions.
    */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    require(n == 3, s"shingleHashes is specialized to n=3 (got $n)")
    // Array-side shingling (r16): the r15 shape exploded tokens to rows
    // and accessed the next two via a window `lead`, which forced a full
    // sort-shuffle of the TOKEN stream (id-partitioned, pos-ordered) just
    // to see consecutive tokens — at sf100 that is a 250M-row exchange
    // before a single shingle exists. Tokens of one doc are already
    // adjacent in the split() array, so the whole triple-hash runs as the
    // native [[graft.functions.ShingleHashes3]] kernel (a transform()
    // reshape was tried first and measured 2× SLOWER than the window —
    // higher-order lambdas are CodegenFallback) and only the final
    // shingle HASHES explode: zero exchanges until the signature
    // aggregation, which stays map-side combinable. Hash bytes are
    // IDENTICAL to the window shape, pinned by DedupSpec.
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    val shingles = Bridge.column(
      graft.functions.ShingleHashes3(Bridge.expression(toks)))
    df.select(col(idCol).as("id"), explode(shingles).as("h"))
  }

  /** MinHash signatures as a DataFrame `[id, sig: array<bigint>]`: each
    * shingle is hashed ONCE to a long, then seed i's hash is the cheap
    * long-remix `xxhash64(i, h)`; sig_i = MIN over shingles.
    *
    * Shape (r17): ZERO shuffles — a document's shingle hashes are already
    * adjacent inside the [[graft.functions.ShingleHashes3]] array, so the
    * k mins are computed per ROW by the codegen'd
    * [[graft.functions.MinHashSignature]] kernel. The r14-r16 shape
    * exploded shingles to rows and re-grouped them with k min-aggregate
    * columns — a full exchange of the shingle stream (250M rows at
    * sf100), and past k≈100 columns the aggregate fell out of
    * whole-stage codegen (`spark.sql.codegen.maxFields`) onto the
    * interpreted path, which is what made the scale-derived [[bandPlan]]
    * k=160 unusable. Signature BYTES are identical to the aggregate
    * shape (DedupSpec pins the A/B); shingle-less docs (empty sig array)
    * are filtered like the explode shape dropped them.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      k: Int, n: Int = 3): DataFrame = {
    require(n == 3, s"minhashSignatures is specialized to n=3 (got $n)")
    val toks = filter(split(lower(col(textCol)), " "), t => t =!= "")
    val sig = Bridge.column(graft.functions.MinHashSignature(
      graft.functions.ShingleHashes3(Bridge.expression(toks)), k))
    df.select(col(idCol).as("id"), sig.as("sig"))
      .filter(size(col("sig")) > 0)
  }

  /** LSH banding: docs → (band, bucketHash) rows; docs sharing a bucket in
    * any band are candidate duplicates (standard MinHash-LSH: `bands` bands
    * of `rows = k/bands` signature rows each).
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rows = k / bands
    val sig = minhashSignatures(df, idCol, textCol, k)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
    }
    sig.select(col("id"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Default bucket-size cap for pair expansion — above it, a bucket emits
    * star pairs instead of all pairs (see [[bucketPairs]]).
    */
  val DefaultBucketCap = 256

  /** Corpus size past which the band plan takes its first step. Placed by
    * MEASUREMENT, not the r16 densification guess: the r17 sf100 profile
    * showed the bucket BULK never densifies (80M band rows → 77.6M
    * distinct buckets, 97% singletons at 5M docs) — what grows is the hot
    * TAIL of identical/near-identical content clusters, max bucket size
    * 4 → 25 → 301 across sf1/sf10/sf100 (≈ linear in n). The star-pair
    * cap already bounds those (2 capped buckets at sf100, drop metrics
    * published); widening the plan earlier was measured STRICTLY WORSE
    * (sf100 at r=5/b=32: every linear stage ≈2× — signatures 25→43 s,
    * banding 23→43 s — for a tail the cap handles anyway, and identical
    * docs share a signature at ANY r, so their buckets never split).
    * What r-growth buys is splitting the NON-identical near-dup tail
    * before it saturates the cap: projected max bucket ≈ 301·(n/5M)
    * crosses ~4× the 256 cap near n ≈ 2^24 ≈ 16.8M docs — the first
    * step lands there.
    */
  val PlanBaseDocs: Long = 1L << 24

  /** Ceiling for rows-per-band: r=7 (b=128, k=896) covers ~17B docs at
    * the 8×-per-step schedule; past that the j≥0.5 recall floor itself
    * costs k ≈ 2^r minhashes per doc and should be renegotiated (drop the
    * floor to j≥0.6+, where r can grow much more cheaply) rather than
    * silently paying a 2000-wide signature.
    */
  val MaxBandRows = 7

  /** LSH band plan derived from corpus size — (k total minhashes, bands).
    *
    * What r-growth is FOR (r17, measured — see [[PlanBaseDocs]] for the
    * profile): not the bucket bulk (97% singletons at sf100; the r16
    * "densification" theory did not survive measurement) but the hot
    * near-duplicate tail, whose largest bucket grows ≈ linearly with the
    * corpus (4 → 25 → 301 across three decades). Identical docs share a
    * signature at any r and stay the star-cap's job; NON-identical
    * near-dup clusters split with each +1 of r (a band signature is r
    * minhashes — one more row multiplies their distinct-signature
    * space), so stepping r one per 8× corpus growth past
    * [[PlanBaseDocs]] keeps that tail from saturating the cap.
    *
    * Why bands double per step: the q47 recall gate needs detection
    * ≥ 0.6 at Jaccard 0.5 and ≥ 0.9 at 0.8. Detection is 1-(1-j^r)^b;
    * at j = 0.5 with b = 2^r it is 1-(1-2⁻ʳ)^(2ʳ) → 1-1/e ≈ 0.632,
    * monotonically ≥ 0.632 for every step (r=4: 0.644, r=5: 0.638,
    * r=6: 0.635) — the floor holds at EVERY scale by construction, not
    * by tuning. At j = 0.8 detection only improves with the doubling
    * (r=4: 0.99998 → r=7: ≈1-e⁻³⁰). The price is k = r·2^r signature
    * minhashes (64 → 160 → 384 → 896) and 2^(r-4)× band rows — LINEAR,
    * shuffle-free ([[graft.functions.MinHashSignature]]) costs, paid
    * only where the measured tail growth says they buy something.
    */
  def bandPlan(nDocs: Long): (Int, Int) = {
    val extra =
      if (nDocs <= PlanBaseDocs) 0
      else math.ceil(
        math.log(nDocs.toDouble / PlanBaseDocs) / math.log(2.0) / 3.0).toInt
    val r = math.min(4 + extra, MaxBandRows)
    val b = 16 << (r - 4) // = 2^r
    (r * b, b)
  }

  /** Unordered candidate pairs within each group: groupBy(keys) → sorted
    * collect_set → expansion. One shuffle, and the grouped values are
    * computed ONCE — a bucket self-join would recompute the upstream
    * signature plan for each join side (only the bottom exchange is
    * reusable) and shuffle it twice.
    *
    * Degenerate-bucket guard: pair count is quadratic in bucket size by LSH
    * design (buckets are small for non-honest inputs), but a hot bucket —
    * e.g. millions of identical boilerplate docs sharing a signature —
    * would expand quadratically inside ONE task. Buckets larger than `cap`
    * therefore emit STAR pairs (every member paired with the bucket's
    * minimum element, n−1 pairs) instead of all pairs. For
    * connected-component dedup the star keeps exactly the same groups (all
    * members stay transitively connected through the representative); the
    * loss is only direct near-dup pairs between non-identical members of a
    * hot bucket, and hot buckets are overwhelmingly identical content. No
    * silent truncation: the number of capped buckets and the max bucket
    * size are published as observed metrics (`capped_buckets`,
    * `max_bucket_size` — pass an [[org.apache.spark.sql.Observation]] to
    * read them after the action, e.g. to log or alert on cap hits).
    */
  private[graft] def bucketPairs(df: DataFrame, keys: Seq[String], payload: Column,
      cap: Int, obs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    require(cap >= 2, s"bucket cap must be >= 2 (got $cap)")
    // Singleton prefilter (r17): on honest corpora almost every bucket is
    // a singleton — the sf100 profile measured 77.6M buckets over 80M
    // band rows, 97% of them size 1 — and `collect_set` is a
    // TypedImperativeAggregate whose per-partition hash map falls back to
    // SORT-BASED aggregation past 128 groups, so the singletons paid a
    // full object-agg sort-spill-merge for rows the `size > 1` filter
    // then discarded (132 s of q47's sf100 wall for 486k surviving
    // pairs). A window COUNT over the same partitioning keys drops them
    // first: ONE exchange+sort of the big frame (Tungsten sort, no
    // object agg), the filter runs streaming over sorted groups, and the
    // collect_set below sees only the ~3% multi-bucket rows — same
    // partitioning, so Catalyst inserts no second exchange. Observed
    // metrics shift benignly: `max_bucket_size` now reads the max over
    // MULTI buckets (an all-singleton corpus reports 0 where it said 1).
    val w = Window.partitionBy(keys.map(col): _*)
    val multi = df
      .withColumn("__bn", count(lit(1)).over(w))
      .filter(col("__bn") > 1)
      .drop("__bn")
    val grouped0 = multi.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_set(payload)).as("xs"))
      .filter(size(col("xs")) > 1)
    val capped = sum(when(size(col("xs")) > cap, 1L).otherwise(0L)).as("capped_buckets")
    val maxSize = coalesce(max(size(col("xs"))), lit(0)).as("max_bucket_size")
    val grouped = obs match {
      case Some(o) => grouped0.observe(o, capped, maxSize)
      case None => grouped0.observe(s"graft_bucket_stats_${keys.mkString("_")}", capped, maxSize)
    }
    // Pair expansion as two generators (posexplode the anchor, explode the
    // tail slice) — nested `transform` lambdas evaluate interpreted, and at
    // hundreds of thousands of pairs the per-element lambda dispatch is
    // real wall time. Star pairs are exactly the anchor-index-0 subset of
    // all pairs, so the cap becomes a row filter, not a second expression.
    grouped
      .select(col("xs"), posexplode(col("xs")).as(Seq("__i", "a")))
      .filter(size(col("xs")) <= cap || col("__i") === 0)
      .select(col("a"),
        explode(slice(col("xs"), col("__i") + lit(2), size(col("xs")))).as("b"))
  }

  /** Candidate near-duplicate pairs from LSH bucket co-membership
    * (id_a < id_b, deduplicated across bands). `cap` bounds per-bucket
    * expansion (see [[bucketPairs]]); pass `obs` to read the
    * `capped_buckets` / `max_bucket_size` metrics after the action.
    *
    * With the default `k = bands = 0` the band plan is derived from the
    * corpus size via [[bandPlan]] (one `count()` — metadata-cheap on a
    * parquet scan; callers holding a derived frame who already know n
    * can pass an explicit plan to skip it). Explicit k/bands are honored
    * verbatim (the testing / A-B seam).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      k: Int = 0, bands: Int = 0, cap: Int = DefaultBucketCap,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require((k > 0) == (bands > 0),
      s"pass both k and bands, or neither for the scale-derived plan (got k=$k bands=$bands)")
    val (kk, bb) = if (k > 0) (k, bands) else bandPlan(df.count())
    val b = lshBuckets(df, idCol, textCol, kk, bb)
    bucketPairs(b, Seq("band", "bucket"), col("id"), cap, obs)
      .select(col("a").as("id_a"), col("b").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over token shingles for verification of candidate pairs
    * (join candidates back to shingle sets; intersection via
    * array_intersect on the paired rows — candidates only, never all pairs).
    */
  def verifyJaccard(df: DataFrame, candidates: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, n)
      .groupBy("id").agg(collect_set(col("h")).as("sh"))
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
  }

  /** End-to-end MinHash dedup: candidates → exact-Jaccard verification →
    * TRANSITIVE duplicate groups (connected components over the verified
    * pair graph — A≈B≈C collapses as one group even when A,C never pair) →
    * keep the minimum id per group. Returns the deduplicated corpus.
    */
  def dedupByMinhash(df: DataFrame, idCol: String, textCol: String,
      jaccardThreshold: Double = 0.8, k: Int = 0, bands: Int = 0): DataFrame = {
    // transitive grouping runs through the Long-vertex graph layer, and
    // "keep the minimum id" needs an ordered id — require an integral id
    // up front rather than silently null-casting strings later
    df.schema(idCol).dataType match {
      case LongType | IntegerType | ShortType | ByteType => ()
      case other => throw new IllegalArgumentException(
        s"dedupByMinhash needs an integral id column; $idCol is $other " +
          "(derive one first, e.g. monotonically_increasing_id or xxhash64)")
    }
    val cands = minhashCandidates(df, idCol, textCol, k, bands)
    val dups = verifyJaccard(df, cands, idCol, textCol)
      .filter(col("jaccard") >= jaccardThreshold)
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    // Docs with no tokens produce no shingles, hence no signature and no
    // bucket — the MinHash path alone would never group them even though
    // they are exact duplicates of one another. Pair every empty doc with
    // the minimum empty id (star — CC-equivalent to the full clique).
    val empties = df
      .filter(coalesce(col(textCol), lit("")).rlike("^ *$"))
      .select(col(idCol).cast("long").as("eid"))
    val emptyDups = empties
      .crossJoin(broadcast(empties.agg(min(col("eid")).as("emin"))))
      .filter(col("eid") =!= col("emin"))
      .select(col("emin").as("src"), col("eid").as("dst"))
    val groups = graft.graph.GraphAnalytics.connectedComponents(
      df.sparkSession, dups.unionByName(emptyDups))
    val losers = groups
      .filter(col("node") =!= col("component")) // component id = min member id
      .select(col("node").as("__loser"))
    df.join(losers, col(idCol) === col("__loser"), "left_anti")
  }

  /** SimHash: 64-bit fingerprint — bit j of the hash of each token votes
    * +1/-1; fingerprint bit j = sign of the vote sum. Computed per-document
    * with higher-order functions (aggregate over tokens), no UDF.
    */
  def simhash(textCol: Column): Column = {
    // null text ≡ empty text (zero votes → 0L), matching [[simhashDf]]
    val toks = tokensArr(coalesce(textCol, lit("")))
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

  /** SimHash fingerprints as a DataFrame `[id, sig: bigint]` — identical
    * bits to [[simhash]] (same per-token hash and vote rule) but computed by
    * explode + 64 map-side-combinable SUM votes instead of a per-row
    * `aggregate` lambda, for the same scale reason as
    * [[minhashSignatures]]. Docs with no tokens (lost by explode) are
    * restored with the all-zero-votes fingerprint 0L.
    */
  def simhashDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // explode_OUTER keeps token-less documents as one null-token row, so a
    // single scan + one hash aggregate covers every doc — the previous
    // shape re-scanned the table and left-joined the signatures back just
    // to restore empty docs (a second pass + shuffle that at 100 TB costs
    // a full table read). The null row votes 0 on every bit, so real
    // tokens are unaffected and an empty doc sums to 0 votes → sig 0L,
    // bit-identical to the per-row [[simhash]] contract.
    // explode the RAW split (no higher-order filter(...) pre-pass — its
    // lambda evaluates interpreted, outside whole-stage codegen, and was
    // the bulk of a 1.5× q48 wall-time regression); empty-string tokens
    // and the null placeholder row both hash to null and are skipped by
    // the aggregates below, so the row-level filter is unnecessary.
    val tok = df
      .select(col(idCol).as("id"),
        explode_outer(split(lower(col(textCol)), " ")).as("t"))
      // xxhash64(null) is the (non-null) seed hash, so gate on the token:
      // h stays null exactly for empty tokens / the null placeholder row
      .select(col("id"),
        when(col("t").isNotNull && col("t") =!= "", xxhash64(col("t"))).as("h"))
    // vote_j = #ones_j − #zeros_j = 2·#ones_j − n, so the per-row aggregate
    // update is a branch-free `(h >> j) & 1` per bit (SUM skips the null
    // placeholder row natively) plus ONE shared count(h) — not 64 three-way
    // conditionals per row, which tripled q48's wall time when the null
    // gate was first expressed inside every vote. Empty docs: count = 0 and
    // each ones_j is null, so `2·null > 0` is null → bit unset → sig 0L.
    val ones = (0 until 64).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L))).as(s"_o$j")
    }
    val sig = (0 until 64).map { j =>
      when(col(s"_o$j") * 2 > col("_n"), shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tok.groupBy("id").agg(count(col("h")).as("_n"), ones: _*)
      .select(col("id"), sig.as("sig"))
  }

  /** Hamming distance between two simhash fingerprints (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a DataFrame via multi-band blocking
    * (multi-probe): the 64-bit fingerprint splits into `bands` equal bit
    * blocks, and documents sharing ANY block value become candidates —
    * pairs dedup across bands like MinHash banding. Pigeonhole guarantee:
    * a pair within Hamming distance < `bands` differs in fewer blocks than
    * there are blocks, so some block matches exactly and the pair is
    * ALWAYS a candidate (the previous single-block probe missed near-dups
    * whose differing bits fell inside the probed block). Above that,
    * candidacy is probabilistic, as in any LSH scheme. `cap`/`obs` bound
    * hot blocks exactly as in [[bucketPairs]].
    */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 8, bands: Int = 8, cap: Int = DefaultBucketCap,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame =
    simhashCandidatesFromSigs(simhashDf(df, idCol, textCol), maxHamming, bands, cap, obs)

  /** Banding + pair expansion half of [[simhashCandidates]], taking
    * precomputed `[id, sig]` fingerprints (also the testing seam for
    * planted-bit-pattern cases).
    */
  def simhashCandidatesFromSigs(sigs: DataFrame, maxHamming: Int = 8,
      bands: Int = 8, cap: Int = DefaultBucketCap,
      obs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    require(bands >= 2 && 64 % bands == 0, s"bands must divide 64 (got $bands)")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("sig"), b * width).bitwiseAND(lit(mask)).as("block"))
    }
    val exploded = sigs
      .select(col("id"), col("sig"), explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("sig"), col("bb.band").as("band"), col("bb.block").as("block"))
    bucketPairs(exploded, Seq("band", "block"), struct(col("id"), col("sig")), cap, obs)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair can surface from several matching bands
  }
}
