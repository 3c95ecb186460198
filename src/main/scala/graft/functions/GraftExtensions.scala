package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's native vector kernels, so `spark.sql` users
  * get the same whole-stage-codegen expressions the Scala API uses:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *
  * Two entry points, same registry rows:
  *
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build time (the standard extension-library hook — survives into every
  *    session cloned from the builder);
  *  - `GraftExtensions.register(spark)` on a live session (idempotent), for
  *    callers who receive an already-built SparkSession.
  *
  * The reference exposes its similarity surface only through driver code
  * (`final/langraph_neo4j3.py` renders Cypher, never SQL); registering the
  * kernels here is the Spark-native equivalent: one definition, reachable
  * from Scala, SQL, and therefore every BI/notebook front end.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "math_funcs", "4.0.0", "", "scala_udf")

  private def binary(name: String, make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(arrayA, arrayB) - native codegen'd vector kernel."),
      { args: Seq[Expression] =>
        require(args.length == 2, s"$name expects exactly 2 arguments, got ${args.length}")
        make(args(0), args(1))
      })

  private def unary(name: String, make: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      info(name, s"$name(array) - native codegen'd kernel."),
      { args: Seq[Expression] =>
        require(args.length == 1, s"$name expects exactly 1 argument, got ${args.length}")
        make(args(0))
      })

  /** (identifier, info, builder) rows shared by both registration paths. */
  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      binary("graft_dot", DotProduct(_, _)),
      binary("graft_cosine", CosineSimilarity(_, _)),
      unary("graft_shingle3", ShingleHashes3(_)))

  /** Idempotent registration on a live session (covers sessions built
    * without the `spark.sql.extensions` config).
    */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptions.foreach { case (id, inf, builder) =>
      registry.registerFunction(id, inf, builder)
    }
  }
}
