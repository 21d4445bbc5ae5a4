package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** SparkSessionExtensions entry point: injects the engine's native
  * functions at session build time, so clusters configured with
  * `spark.sql.extensions=graft.GraftExtensions` get `graft_cosine` (and
  * future native expressions) in every session without imperative
  * registration.
  *
  * ```
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * // or: --conf spark.sql.extensions=graft.GraftExtensions
  * ```
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(graft.functions.GraftFunctions.CosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName,
        graft.functions.GraftFunctions.CosineName),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
