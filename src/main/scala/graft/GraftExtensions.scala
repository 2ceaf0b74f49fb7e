package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point (SURVEY §4.3): registers the
  * library's native expressions at session build time —
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * Queries ALSO call VectorExprs.ensureRegistered defensively (the
  * harness hands sessions in, so extension wiring can't be assumed),
  * but this is the front door for users embedding the library.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[functions.ArrayDot].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.ArrayDot(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot_pre"),
      new ExpressionInfo(classOf[functions.ArrayDotPrefix].getName,
        "graft_dot_pre"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.ArrayDotPrefix(args(0), args(1), args(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[functions.PolyHash].getName,
        "graft_polyhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.PolyHash(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_agg"),
      new ExpressionInfo(classOf[functions.ThetaSketchAgg].getName,
        "graft_theta_agg"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.ThetaSketchAgg(args.head).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_intersect_est"),
      new ExpressionInfo(classOf[functions.ThetaIntersectEstimate].getName,
        "graft_theta_intersect_est"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.ThetaIntersectEstimate(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_theta_diff_est"),
      new ExpressionInfo(classOf[functions.ThetaDiffEstimate].getName,
        "graft_theta_diff_est"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.ThetaDiffEstimate(args(0), args(1))))
  }
}
