package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy dog near the river bend today"), // near dup of 1
    (4L, "completely different content about spark catalyst optimizer rules and plans"),
    (5L, "another unrelated document mentioning parquet columnar storage formats only")
  ).toDF("doc_id", "text")

  test("array-side shingle hashes are bit-identical to the window-lead shape") {
    // the r16 rewrite removed the token-stream sort-shuffle; the hash
    // BYTES must not move (signatures, buckets, and the recall instrument
    // all derive from them). Reference: the r15 window shape, inlined.
    import org.apache.spark.sql.expressions.Window
    val mixed = Seq((1L, "a b c d e"), (2L, "x"), (3L, "p q"), (4L, ""),
      (5L, "  spaced   out  tokens  "), (6L, "a b c")).toDF("doc_id", "text")
    val w = Window.partitionBy("id").orderBy("pos")
    val reference = Dedup.tokenRows(mixed, "doc_id", "text")
      .select(col("id"), col("pos"), xxhash64(col("t")).as("h0"))
      .select(col("id"),
        lead(col("h0"), 1).over(w).as("h1"),
        lead(col("h0"), 2).over(w).as("h2"),
        row_number().over(w).as("rn"), col("h0"))
      .filter(col("h2").isNotNull || col("rn") === 1)
      .select(col("id"),
        xxhash64(col("h0"), coalesce(col("h1"), lit(0L)),
          coalesce(col("h2"), lit(0L))).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val arrayside = Dedup.shingleHashes(mixed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(arrayside == reference)
  }

  test("per-row minhash signatures are bit-identical to the k-min-column aggregate shape") {
    // the r17 rewrite removed the shingle-stream shuffle; signature BYTES
    // must not move (buckets, candidates, and the recall gates all derive
    // from them). Reference: the r14-r16 explode + k min-aggregate shape,
    // inlined. Also pins the empty-doc contract: the aggregate shape drops
    // shingle-less docs (no rows to group), the array shape filters them.
    val mixed = Seq((1L, "a b c d e f g"), (2L, "x"), (3L, "p q"), (4L, ""),
      (5L, "  spaced   out  tokens  "), (6L, "a b c"), (7L, "a b c d e f g"))
      .toDF("doc_id", "text")
    val k = 64
    val hashed = Dedup.shingleHashes(mixed, "doc_id", "text")
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("h"))).as(s"_m$i"))
    val reference = hashed.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    val arrayside = Dedup.minhashSignatures(mixed, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    assert(arrayside == reference)
    assert(arrayside.map(_._1) == Seq(1L, 2L, 3L, 5L, 6L, 7L)) // doc 4 has no shingles
    // identical docs produce identical signatures (1 and 7)
    assert(arrayside.head._2 == arrayside.last._2)
  }

  test("minhash kernel folds NULL elements as the bare seed remix (aggregate parity)") {
    // ADVICE r17: xxhash64 SKIPS a null child, so the aggregate shape's
    // xxhash64(lit(i), null) row contributes hashInt(i, 42) to the min —
    // it never produced a null the min would drop. Unreachable through
    // ShingleHashes3 (containsNull=false) but pinned here for any future
    // SQL-registered caller. Exercises BOTH eval paths: the DataFrame
    // projection (codegen) and a direct interpreted eval.
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, XXH64}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.types._
    val k = 8
    val rows = Seq(
      (1L, Seq[java.lang.Long](7L, null, 99L)),
      (2L, Seq[java.lang.Long](null, null)), // all-null: sig = seeds themselves
      (3L, Seq[java.lang.Long](7L, 99L)))
      .toDF("id", "h")
    // aggregate reference shape over the exploded (nullable) hashes
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("eh"))).as(s"_m$i"))
    val reference = rows.select(col("id"), explode(col("h")).as("eh"))
      .groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"_m$i")): _*).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    import org.apache.spark.sql.graftbridge.Bridge
    val kernel = rows.select(col("id"), Bridge.column(
        graft.functions.MinHashSignature(Bridge.expression(col("h")), k)).as("sig"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq.sortBy(_._1)
    assert(kernel == reference)
    val seeds = (0 until k).map(i => XXH64.hashInt(i, 42L))
    assert(kernel(1)._2 == seeds) // all-null doc: the bare remixes
    // interpreted path agrees byte-for-byte with the codegen'd one
    val expr = graft.functions.MinHashSignature(
      BoundReference(0, ArrayType(LongType, containsNull = true), nullable = false), k)
    val interp = expr.eval(InternalRow(ArrayData.toArrayData(
      Array[Any](7L, null, 99L)))).asInstanceOf[ArrayData].toLongArray.toSeq
    assert(interp == kernel.head._2)
  }

  test("bandPlan scales rows-per-band with log(n) and holds the recall floors") {
    // every measured SF (≤5M docs) keeps the r14-era 64×16 plan — the r17
    // sf100 A/B measured the wider plan strictly worse there (2× linear
    // stages, tail already cap-bounded; see Dedup.PlanBaseDocs)
    assert(Dedup.bandPlan(0L) == (64, 16))
    assert(Dedup.bandPlan(500L) == (64, 16))
    assert(Dedup.bandPlan(500000L) == (64, 16))
    assert(Dedup.bandPlan(5000000L) == (64, 16))
    assert(Dedup.bandPlan(Dedup.PlanBaseDocs) == (64, 16))
    // first step past the base (projected hot-tail ≈ 4x the bucket cap):
    // r=5, b=32, k=160; one step per 8x corpus, capped at MaxBandRows
    assert(Dedup.bandPlan(Dedup.PlanBaseDocs + 1) == (160, 32))
    assert(Dedup.bandPlan(Dedup.PlanBaseDocs * 8) == (160, 32))
    assert(Dedup.bandPlan(Dedup.PlanBaseDocs * 9) == (384, 64))
    assert(Dedup.bandPlan(Long.MaxValue / 4) == (7 * 128, 128))
    // the floors hold at EVERY plan the schedule can emit: detection
    // 1-(1-j^r)^b >= 0.6 at j=0.5 and >= 0.9 at j=0.8
    (4 to Dedup.MaxBandRows).foreach { r =>
      val b = 16 << (r - 4)
      def det(j: Double) = 1.0 - math.pow(1.0 - math.pow(j, r), b)
      assert(det(0.5) >= 0.6, s"j50 floor broken at r=$r b=$b: ${det(0.5)}")
      assert(det(0.8) >= 0.9, s"j80 floor broken at r=$r b=$b: ${det(0.8)}")
    }
    // k=0/bands=0 must come as a pair
    intercept[IllegalArgumentException](
      Dedup.minhashCandidates(docs, "doc_id", "text", k = 64, bands = 0))
  }

  test("minhash LSH finds exact and near duplicates, not unrelated pairs") {
    val cands = Dedup.minhashCandidates(docs, "doc_id", "text", k = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)), "exact duplicate must be a candidate")
    assert(cands.contains((1L, 3L)) && cands.contains((2L, 3L)),
      "near duplicates should collide in some band")
    assert(!cands.contains((4L, 5L)), "unrelated docs must not be candidates")
  }

  test("dedupByMinhash keeps one canonical doc per transitive dup group") {
    val out = Dedup.dedupByMinhash(docs, "doc_id", "text", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1≈2 (exact) and 1≈3 (near) collapse to the min id 1; 4 and 5 survive
    assert(out == Set(1L, 4L, 5L))
    // idempotent: running again removes nothing more
    val again = Dedup.dedupByMinhash(
        docs.filter(col("doc_id").isin(out.toSeq: _*)), "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out)
    // non-integral id columns are rejected up front, not null-cast later
    val strIds = docs.withColumn("doc_id", concat(lit("doc-"), col("doc_id")))
    val e = intercept[IllegalArgumentException](
      Dedup.dedupByMinhash(strIds, "doc_id", "text"))
    assert(e.getMessage.contains("integral id"))
  }

  test("degenerate hot bucket: 10k identical docs cap to star pairs, still collapse") {
    import org.apache.spark.sql.Observation
    // 10k identical docs + the normal corpus: without the cap, one bucket
    // expands ~50M pairs inside a single task; with it, the bucket emits
    // n-1 star pairs and reports the cap hit via observed metrics
    val flood = spark.range(1000L, 11000L)
      .select(col("id").as("doc_id"), lit("boilerplate disclaimer text repeated verbatim in every scraped page footer").as("text"))
    val corpus = docs.unionByName(flood)
    val obs = Observation("dedup_cap")
    val cands = Dedup.minhashCandidates(corpus, "doc_id", "text", obs = Some(obs))
    val candCount = cands.count()
    val metrics = obs.get
    assert(metrics("capped_buckets").asInstanceOf[Long] >= 1L, metrics.toString)
    assert(metrics("max_bucket_size").asInstanceOf[Int] == 10000, metrics.toString)
    // star expansion: the flood contributes ~9999 pairs per band, not ~50M
    assert(candCount < 100000, s"candidate count $candCount suggests quadratic expansion")
    // end to end: every flood doc collapses into one survivor
    val out = Dedup.dedupByMinhash(corpus, "doc_id", "text", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.count(_ >= 1000L) == 1, "flood must collapse to exactly one survivor")
    assert(out.intersect(Set(1L, 4L, 5L)) == Set(1L, 4L, 5L))
  }

  test("empty/whitespace docs are grouped as exact duplicates of each other") {
    val withEmpties = docs.unionByName(Seq(
      (10L, ""), (11L, "   "), (12L, null.asInstanceOf[String])
    ).toDF("doc_id", "text"))
    val out = Dedup.dedupByMinhash(withEmpties, "doc_id", "text", jaccardThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the three token-less docs collapse to min id 10; rest unchanged
    assert(out == Set(1L, 4L, 5L, 10L))
  }

  test("verifyJaccard: exact dup has jaccard 1.0; near dup is high; ") {
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.verifyJaccard(docs, cands, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
  }

  test("simhash: identical text → distance 0; near dup close; unrelated far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(3L)) < ham(sigs(1L), sigs(4L)))
  }

  test("simhashDf is bit-identical to per-row simhash, including empty docs") {
    val corpus = docs.unionByName(Seq(
      (10L, ""), (11L, "   "), (12L, null.asInstanceOf[String]),
      (13L, "single"), (14L, "tie tie") // 2-token doc exercises the tie rule
    ).toDF("doc_id", "text"))
    val perRow = corpus.select(col("doc_id").as("id"), Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = Dedup.simhashDf(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDf == perRow)
    assert(viaDf(10L) == 0L && viaDf(11L) == 0L && viaDf(12L) == 0L)
  }

  test("simhash banding finds near-dups differing only in HIGH bits") {
    // the old single-probe blocked on the top 12 bits, so a pair whose few
    // differing bits sat exactly there was invisible; with 8 bands of 8
    // bits, any pair within hamming < 8 shares a full band (pigeonhole)
    val base = 0x0123456789abcdefL
    val sigs = Seq(
      (1L, base),
      (2L, base ^ (0x7L << 61)), // 3 bits flipped in the TOP band
      (3L, base ^ 0x5L), // 2 bits flipped in the BOTTOM band
      (4L, ~base) // 64 bits away — never a candidate
    ).toDF("id", "sig")
    val pairs = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "high-bit near-dup must be found")
    assert(pairs.contains((1L, 3L)), "low-bit near-dup must be found")
    assert(pairs.contains((2L, 3L)), "hamming 5 pair shares 6 of 8 bands")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash banding guarantee: every pair under hamming < bands surfaces") {
    // deterministic pseudo-random corpus of 64 sigs + planted neighbors
    val rnd = new scala.util.Random(7)
    val baseSigs = (0L until 64L).map(i => (i, rnd.nextLong()))
    val planted = baseSigs.take(16).map { case (i, s) =>
      // flip up to 7 random bit positions (hamming ≤ 7 < 8 bands)
      val flips = Seq.fill(7)(rnd.nextInt(64)).distinct
      (100L + i, flips.foldLeft(s)((acc, b) => acc ^ (1L << b)))
    }
    val sigs = (baseSigs ++ planted).toDF("id", "sig")
    val byId = (baseSigs ++ planted).toMap
    val found = Dedup.simhashCandidatesFromSigs(sigs, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = for {
      (a, sa) <- byId.toSeq; (b, sb) <- byId.toSeq if a < b
      if java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (a, b)
    assert(want.nonEmpty && want.toSet.subsetOf(found),
      s"missing: ${want.toSet -- found}")
  }

  test("shingles produce n-grams over tokens") {
    val sh = docs.filter($"doc_id" === 4L)
      .select(Dedup.shingles(col("text"), 3).as("sh"))
      .head().getSeq[Any](0).map(_.toString)
    assert(sh.contains("completely\u0001different\u0001content"))
    assert(sh.length == 8) // 10 tokens → 8 trigrams
  }
}
