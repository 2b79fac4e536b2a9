package graft

import graft.functions.ArrayCosineSimilarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extensions registering graft's native Catalyst functions so SQL
  * users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) ...
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) ...")
  * }}}
  *
  * (or via `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[ArrayCosineSimilarity].getName, "graft_cosine"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "graft_cosine takes exactly 2 arguments")
        ArrayCosineSimilarity(children.head, children(1))
      }
    ))
  }
}
