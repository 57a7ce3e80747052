package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration of the engine's native Catalyst expressions, so
  * `spark.sql` users get them as first-class functions:
  *
  *   SELECT simhash64(text), cosine_sim(e1, e2), sign_lsh(embedding, 8)
  *
  * Two entry points, same registry entries:
  *   - `GraftFunctions.register(spark)` on an existing session;
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` (or
  *     `SparkSession.builder.withExtensions(new GraftExtensions)`) at
  *     session build — the idiomatic SparkSessionExtensions route for
  *     spark-submit deployments.
  */
object GraftFunctions {

  private def info(clazz: Class[_], name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  /** sign_lsh's planes argument must be a foldable integer literal. */
  private def planesOf(e: Expression): Int = {
    require(e.foldable, "sign_lsh(embedding, planes): planes must be a literal")
    e.eval() match {
      case i: Int => i
      case other => sys.error(s"sign_lsh planes must be an int literal, got $other")
    }
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("simhash64"),
        info(classOf[SimHash64], "simhash64",
          "simhash64(text) - 64-bit Charikar simhash of the text"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "simhash64(text) takes one argument")
          SimHash64(args.head)
        }),
      (FunctionIdentifier("cosine_sim"),
        info(classOf[CosineSim], "cosine_sim",
          "cosine_sim(a, b) - cosine similarity of two array<double|float>"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "cosine_sim(a, b) takes two arguments")
          CosineSim(args(0), args(1))
        }),
      (FunctionIdentifier("sign_lsh"),
        info(classOf[SignLsh], "sign_lsh",
          "sign_lsh(embedding, planes) - sign-LSH bucket id (one bit per plane)"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "sign_lsh(embedding, planes) takes two arguments")
          SignLsh(args(0), planesOf(args(1)))
        }),
      (FunctionIdentifier("sparse_dot"),
        info(classOf[SparseDot], "sparse_dot",
          "sparse_dot(idx1, val1, idx2, val2) - dot product of two sorted " +
            "sparse vectors (array<int> indices, array<double> values)"),
        (args: Seq[Expression]) => {
          require(args.length == 4,
            "sparse_dot(idx1, val1, idx2, val2) takes four arguments")
          SparseDot(args(0), args(1), args(2), args(3))
        }))

  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
