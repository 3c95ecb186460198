package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** SQL reachability of the native vector kernels: both registration paths
  * (live-session `register` and the `spark.sql.extensions` builder hook)
  * must expose `graft_dot`/`graft_cosine` with the exact semantics of the
  * Scala-API expressions — including the null-on-length-mismatch contract.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("register(spark) makes graft_dot/graft_cosine callable from SQL") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
                graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
                graft_dot(array(1.0D), array(1.0D, 2.0D)) AS mismatch""").head()
    assert(row.getDouble(0) == 32.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.isNullAt(2))
  }

  test("register is idempotent and works on float embeddings end to end") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // second call must not throw
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_ext_spec")
    val top = spark.sql(
      """SELECT b.vec_id, graft_cosine(a.embedding, b.embedding) AS cos
           FROM emb_ext_spec a JOIN emb_ext_spec b ON a.vec_id = 0
          ORDER BY cos DESC LIMIT 1""").head()
    // the most-similar vector to vec 0 is vec 0 itself, cosine 1
    assert(top.getLong(0) == 0L)
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
  }

  test("graft_shingle3 hashes null elements as the empty string, both eval paths") {
    GraftExtensions.register(spark)
    // a direct SQL call may legally carry array<string> with nulls —
    // codegen must hash the null slot exactly like '' (the empty string)
    val viaSql = spark.sql(
      "SELECT graft_shingle3(array('a', CAST(NULL AS STRING), 'c')) AS h")
      .head().getSeq[Long](0)
    val asEmpty = spark.sql(
      "SELECT graft_shingle3(array('a', '', 'c')) AS h")
      .head().getSeq[Long](0)
    assert(viaSql == asEmpty)
    // interpreted eval over a GenericArrayData null slot (the path that
    // used to NPE): must agree with codegen byte-for-byte
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val expr = graft.functions.ShingleHashes3(Literal(
      new GenericArrayData(Array[Any](
        UTF8String.fromString("a"), null, UTF8String.fromString("c"))),
      ArrayType(StringType, containsNull = true)))
    val interp = expr.eval(null).asInstanceOf[ArrayData].toLongArray().toSeq
    assert(interp == asEmpty)
  }

  test("the SparkSessionExtensions hook accepts the injection") {
    // A real `spark.sql.extensions` session can't be built here (the
    // JVM-wide test SparkContext already exists and getOrCreate ignores
    // static confs), but the builder path and register() share the same
    // `descriptions` rows — so exercising the public injection hook plus
    // the register() tests above covers both surfaces.
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    assert(GraftExtensions.descriptions.map(_._1.funcName).sorted ==
      Seq("graft_cosine", "graft_dot", "graft_shingle3"))
  }
}
