package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions hook: registers graft's native expressions as
  * SQL functions, so `spark.sql("SELECT dot_native(a, b)")` works and
  * the cypher/natural-language surface can call them. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotNativeFn)
    ext.injectFunction(GraftExtensions.cosineNativeFn)
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
  }
}

object GraftExtensions {
  private val dotNativeFn = (
    FunctionIdentifier("dot_native"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_native"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "dot_native expects exactly 2 arguments")
      DotProduct(children.head, children(1))
    })

  /** cosine_native(a, b) = dot(a,b) / (‖a‖·‖b‖) as a composite of the
    * codegen'd DotProduct — whole-stage codegen CSE shares the repeated
    * child scans, so SQL users score ANN candidates without HOF chains. */
  private val cosineNativeFn = (
    FunctionIdentifier("cosine_native"),
    new ExpressionInfo(classOf[DotProduct].getName, "cosine_native"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "cosine_native expects exactly 2 arguments")
      import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
      val (a, b) = (children.head, children(1))
      Divide(DotProduct(a, b), Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
    })

  /** Register into an already-built session (getOrCreate ignores
    * withExtensions once a session exists in the JVM). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .registerFunction(dotNativeFn._1, dotNativeFn._2, dotNativeFn._3)
    spark.sessionState.functionRegistry
      .registerFunction(cosineNativeFn._1, cosineNativeFn._2, cosineNativeFn._3)
  }
}
