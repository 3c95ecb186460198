package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("languageId picks the language with the highest marker ratio") {
    val docs = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist nicht mit der katze und das ist gut"),
      (3L, "le chat est dans la maison et la vie est belle")
    ).toDF("id", "text")
    val preds = docs.select($"id", TextAnalysis.languageId($"text").getField("lang").as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds(1L) == "en")
    assert(preds(2L) == "de")
    assert(preds(3L) == "fr")
  }

  test("languageIdDf agrees with the per-column languageId on real docs") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val viaCol = docs.select($"doc_id".as("id"),
        TextAnalysis.languageId($"text").getField("lang").as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaDf = TextAnalysis.languageIdDf(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaDf == viaCol)
  }

  test("qualityFeatures computes exact ratios") {
    val df = Seq((1L, "the the cat cat")).toDF("id", "text")
    val r = TextAnalysis.qualityFeatures(df, "text").head()
    assert(r.getAs[Int]("n_tokens") == 4)
    assert(r.getAs[Double]("distinct_ratio") == 0.5)
    assert(r.getAs[Double]("stopword_ratio") == 0.5) // "the" twice
    assert(r.getAs[Double]("mean_tok_len") == 3.0)
  }

  test("fingerprint is order-sensitive (unlike bag-of-words hashes)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(2L))
  }

  test("fingerprintChain: order-sensitive, md5-reproducible, empty -> ''") {
    val df = Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha beta"),
      (4L, "  "), (5L, "alpha")).toDF("id", "text")
    val fps = df.select($"id", TextAnalysis.fingerprintChain($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(3L) && fps(1L) != fps(2L))
    assert(fps(4L) == "")
    // reproducible outside the JVM: fp(["alpha"]) = md5("" + md5("alpha"))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fps(5L) == md5hex(md5hex("alpha")))
  }

  test("tokenCounts: whitespace vs regex pre-tokens") {
    val df = Seq((1L, "abc def42 xy-z")).toDF("id", "text")
    val r = TextAnalysis.tokenCounts(df, "text").head()
    assert(r.getAs[Int]("ws_tokens") == 3)
    assert(r.getAs[Int]("re_tokens") == 4) // abc, def42, xy, z
  }
}
