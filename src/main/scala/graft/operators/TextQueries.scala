package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables

/** Text analysis over `documents` (SURVEY.md §2.10, X1–X4; BASELINE.json
  * north-star training-data-pipeline operators). All integer/deterministic
  * shapes are oracle-gated; the float/sketch family (MinHash, SimHash,
  * embedding cosine) lives in [[graft.pipeline]] and is verified by unit
  * tests + bench.
  *
  * Scale posture: tokenization explodes rows (~100× for word-level tokens);
  * every downstream aggregate here is partial-agg friendly (map-side combine
  * on the exploded stream) and nothing collects to the driver.
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Lower-cased whitespace tokens — the shared tokenizer of X1/X4. */
  private def tokens(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "")

  // ------------------------------------------------------- Q41 token top-k
  /** X1: top-20 tokens by frequency (tokenize → explode → count → top-k). */
  private def q41(s: SparkSession, dir: String): DataFrame =
    tokens(s, dir)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(20)

  private val q41Sql =
    """SELECT token, COUNT(*) AS cnt FROM (
      |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) t
      |WHERE token <> ''
      |GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin

  // ------------------------------------------------- Q42 per-language stats
  /** X2: text stats per language group. The average is computed as an exact
    * integer sum divided in IEEE double — bit-identical across engines and
    * partitionings.
    */
  private def q42(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("cnt"),
        sum(col("n_chars")).cast(LongType).as("sum_chars"))
      .withColumn("avg_chars", col("sum_chars").cast(DoubleType) / col("cnt"))
      .orderBy("lang")

  private val q42Sql =
    """SELECT lang, COUNT(*) AS cnt, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------- Q43 token overlap
  /** X4: pairwise shared-token counts for a bounded doc subset (integer
    * overlap — the exact core of Jaccard). Self-join on token with a
    * triangular predicate.
    */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    // materialized once (bounded: 20 docs' distinct tokens) — the subtree
    // is referenced by both join sides and would otherwise scan+explode+
    // distinct twice per run (r18; same pattern as q79's exact set)
    val t = tokens(s, dir).filter(col("doc_id") < 20).distinct()
      .localCheckpoint(true)
    val a = t.select(col("doc_id").as("doc_a"), col("token"))
    val b = t.select(col("doc_id").as("doc_b"), col("token"))
    a.join(b, Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .orderBy("doc_a", "doc_b")
  }

  private val q43Sql =
    """WITH t AS (SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
      |  ) x WHERE token <> '' AND doc_id < 20)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |FROM t a JOIN t b ON a.token = b.token AND a.doc_id < b.doc_id
      |GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------- Q43b Jaccard similarity
  /** X5 (exact integer form): Jaccard = shared / (|A| + |B| - shared), the
    * division done once in IEEE double on exact integers — deterministic.
    */
  private def q43b(s: SparkSession, dir: String): DataFrame = {
    // materialized once (bounded) — referenced THREE times below (sizes +
    // both join sides); see q43
    val t = tokens(s, dir).filter(col("doc_id") < 20).distinct()
      .localCheckpoint(true)
    val sizes = t.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shared = t.select(col("doc_id").as("doc_a"), col("token"))
      .join(t.select(col("doc_id").as("doc_b"), col("token")), Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sza")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("szb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast(DoubleType) / (col("sza") + col("szb") - col("shared"))).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  private val q43bSql =
    """WITH t AS (SELECT DISTINCT doc_id, token FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
      |  ) x WHERE token <> '' AND doc_id < 20),
      |sz AS (SELECT doc_id, COUNT(*) AS sz FROM t GROUP BY doc_id),
      |sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |       FROM t a JOIN t b ON a.token = b.token AND a.doc_id < b.doc_id
      |       GROUP BY doc_a, doc_b)
      |SELECT doc_a, doc_b,
      |  CAST(shared AS DOUBLE) / (sza.sz + szb.sz - shared) AS jaccard
      |FROM sh JOIN sz sza ON sh.doc_a = sza.doc_id JOIN sz szb ON sh.doc_b = szb.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------- Q44 exact content dedup
  /** X3: content-hash dedup — documents whose sha256(text) collides. */
  private def q44(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .groupBy(sha2(col("text"), 256).as("h")).agg(count(lit(1)).as("copies"))
      .agg(count(lit(1)).as("distinct_texts"),
        sum(when(col("copies") > 1, col("copies")).otherwise(0)).cast(LongType).as("rows_in_dup_groups"))

  private val q44Sql =
    """SELECT COUNT(*) AS distinct_texts,
      |  CAST(SUM(CASE WHEN copies > 1 THEN copies ELSE 0 END) AS BIGINT) AS rows_in_dup_groups
      |FROM (SELECT sha256(text) AS h, COUNT(*) AS copies FROM documents GROUP BY h) g""".stripMargin

  // ------------------------------------------------ Q45 quality-score suite
  /** Text quality signals (length, token count, distinct-token ratio) — the
    * heuristics a training-data pipeline filters on.
    */
  private def q45(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .filter(col("doc_id") < 50)
      .select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars_m"),
        size(split(col("text"), " ")).cast(LongType).as("n_tokens"),
        size(array_distinct(split(lower(col("text")), " "))).cast(LongType).as("n_distinct"))
      .withColumn("distinct_ratio",
        col("n_distinct").cast(DoubleType) / col("n_tokens"))
      .orderBy("doc_id")

  private val q45Sql =
    """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_m,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS distinct_ratio
      |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin

  // -------------------------------------------------- Q46 token accounting
  /** Token counting: whitespace tokens + regex word runs (BPE-ish pre-token
    * split), global totals.
    */
  private def q46(s: SparkSession, dir: String): DataFrame =
    T(s, dir, "documents")
      .select(
        size(split(col("text"), " ")).cast(LongType).as("ws"),
        size(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).cast(LongType).as("re"))
      .agg(sum(col("ws")).cast(LongType).as("ws_tokens"),
        sum(col("re")).cast(LongType).as("re_tokens"))

  private val q46Sql =
    """SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS ws_tokens,
      |  CAST(SUM(len(regexp_extract_all(text, '[a-z0-9]+'))) AS BIGINT) AS re_tokens
      |FROM documents""".stripMargin

  // ------------------------------------------------------------------ registry

  val defs: Map[String, Q] = Map(
    "q41_token_topk" -> q41 _,
    "q42_lang_stats" -> q42 _,
    "q43_token_overlap" -> q43 _,
    "q43b_jaccard" -> q43b _,
    "q44_exact_dedup" -> q44 _,
    "q45_quality_scores" -> q45 _,
    "q46_token_counts" -> q46 _
  )

  val oracle: Map[String, String] = Map(
    "q41_token_topk" -> q41Sql,
    "q42_lang_stats" -> q42Sql,
    "q43_token_overlap" -> q43Sql,
    "q43b_jaccard" -> q43bSql,
    "q44_exact_dedup" -> q44Sql,
    "q45_quality_scores" -> q45Sql,
    "q46_token_counts" -> q46Sql
  )
}
