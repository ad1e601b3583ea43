package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * SparkSessionExtensions hook exposing the engine's native expressions to
 * SQL. Activate either via config
 * `spark.sql.extensions=graft.functions.GraftExtensions` or
 * programmatically: `SparkSession.builder().withExtensions(new GraftExtensions)`.
 *
 * ```sql
 * SELECT t.tok, t.sep FROM src
 * LATERAL VIEW explode(graft_tokenize(line)) AS t
 * ```
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_tokenize"),
      new ExpressionInfo(classOf[Tokenize].getName, "graft_tokenize"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Tokenize(children.head)))
  }
}
