package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{DotProduct, HyperplaneBands, TopKAgg}

/** SQL surface for the engine's native expressions — the analog of the
  * reference registering its kernels as SQLite scalar functions
  * (/root/reference/sqlite/lib.cpp:209-335): the same primitives become
  * first-class `spark.sql(...)` functions, so pure-SQL users get them
  * without the Scala API.
  *
  * Cluster use: `--conf spark.sql.extensions=graft.GraftExtensions`.
  * Existing sessions (tests, REPL): `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", name, usage)

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("graft_lsh_bands"),
      info("graft_lsh_bands", "graft_lsh_bands(v) - hyperplane-LSH band signature"),
      (args: Seq[Expression]) => HyperplaneBands(args.head)),
    (FunctionIdentifier("graft_topk_min"),
      info("graft_topk_min", "graft_topk_min(score, id, k) - k least (score, id) as array<struct>"),
      (args: Seq[Expression]) =>
        TopKAgg(Cast(args(0), DoubleType), Cast(args(1), LongType),
          litInt(args(2), "k"), largest = false)
          .toAggregateExpression()),
    (FunctionIdentifier("graft_topk_max"),
      info("graft_topk_max", "graft_topk_max(score, id, k) - k greatest (score desc, id) as array<struct>"),
      (args: Seq[Expression]) =>
        TopKAgg(Cast(args(0), DoubleType), Cast(args(1), LongType),
          litInt(args(2), "k"), largest = true)
          .toAggregateExpression()))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
