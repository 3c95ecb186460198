package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data curation (BASELINE.json
  * north_star): language ID, quality scoring, token counting, document
  * fingerprinting. All pure column expressions (codegen'd); nothing
  * collects to the driver.
  */
object TextAnalysis {

  /** Tiny per-language marker-word sets for the n-gram/stopword heuristic
    * language identifier. Real deployments plug in full stopword tables via
    * the same structure.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "des"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "con", "una", "para", "por"))

  /** Language-ID: per-language marker-hit ratio; predicted language =
    * argmax (ties broken lexicographically — deterministic). Emits
    * (lang, score) struct; callers read `.getField`.
    */
  def languageId(textCol: Column): Column = {
    val toks = Dedup.tokensArr(textCol)
    val scores = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isin(words.map(lit): _*)))
      struct((hits.cast(DoubleType) / greatest(size(toks), lit(1))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs: max score, then max lang — invert
    // lang ordering is not needed for determinism, just document tie rule.
    array_max(array(scores: _*))
  }

  /** Language-ID over a whole DataFrame: `[id, pred, score]`. Same scoring
    * and tie rule as [[languageId]] (tokens count toward EVERY language
    * whose marker list contains them), but computed via exploded tokens and
    * per-language conditional sums — fully codegen'd, vs one interpreted
    * lambda filter per language per row. Docs with no tokens keep the
    * all-zero-scores prediction via the left join.
    */
  def languageIdDf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val langs = markers.keys.toSeq.sorted
    val tok = Dedup.tokenRows(df, idCol, textCol)
    val aggs = langs.map { l =>
      sum(when(col("t").isin(markers(l): _*), 1).otherwise(0)).as(s"h_$l")
    } :+ count(lit(1)).as("n")
    val hits = tok.groupBy("id").agg(aggs.head, aggs.tail: _*)
    val pred = array_max(array(langs.map { l =>
      struct((coalesce(col(s"h_$l"), lit(0L)).cast(DoubleType) /
        greatest(coalesce(col("n"), lit(0L)), lit(1))).as("score"),
        lit(l).as("lang"))
    }: _*))
    df.select(col(idCol).as("id")).join(hits, Seq("id"), "left_outer")
      .select(col("id"), pred.getField("lang").as("pred"), pred.getField("score").as("score"))
  }

  /** Quality signals: char/token counts, mean token length, uppercase and
    * digit-punctuation ratios, stopword ratio, distinct-token ratio.
    * A downstream filter thresholds these (e.g. Gopher-style rules).
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = Dedup.tokensArr(t)
    val en = markers("en")
    df.withColumn("n_chars_q", length(t))
      .withColumn("n_tokens", size(toks))
      .withColumn("mean_tok_len",
        aggregate(toks, lit(0), (acc, x) => acc + length(x)).cast(DoubleType) /
          greatest(size(toks), lit(1)))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast(DoubleType) /
          greatest(length(t), lit(1)))
      .withColumn("stopword_ratio",
        size(filter(toks, x => x.isin(en.map(lit): _*))).cast(DoubleType) /
          greatest(size(toks), lit(1)))
      .withColumn("distinct_ratio",
        size(array_distinct(toks)).cast(DoubleType) / greatest(size(toks), lit(1)))
  }

  /** Whitespace token count + BPE-ish pre-token count (alnum runs). */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(split(col(textCol), " ")))
      .withColumn("re_tokens", size(regexp_extract_all(col(textCol), lit("[A-Za-z0-9]+"), lit(0))))

  /** Rolling polynomial fingerprint of the token sequence (order-sensitive,
    * unlike the bag-of-shingles MinHash): fp = Σ hash(tok_i)·31^i mod 2^64,
    * folded left with multiplication — a deterministic single-pass
    * aggregate expression.
    */
  def fingerprint(textCol: Column): Column =
    aggregate(Dedup.tokensArr(textCol), lit(0L),
      (acc, t) => acc * lit(31L) + xxhash64(t))

  /** Order-sensitive chained-MD5 fingerprint: fold the token hash
    * sequence left with fp' = md5(fp || md5(tok)). Same role as
    * [[fingerprint]] but reproducible OUTSIDE the JVM (md5 hex is
    * identical everywhere, Spark's seeded xxhash64 is not) — the
    * oracle-checkable fingerprint; the xxhash64 polynomial stays the
    * cheaper scale path. Empty token list → "".
    */
  def fingerprintChain(textCol: Column): Column =
    aggregate(Dedup.tokensArr(textCol), lit(""),
      (acc, t) => md5(concat(acc, md5(t))))
}
