package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Nested Spark-UI job-description tagging.
  * (reference: bdq/spark_ui_logger.py — a context manager stacking dotted
  * descriptions per thread; here a loan-pattern `tagged` block.)
  */
object SparkUILogger {
  private val stack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  def currentDescription: Option[String] = stack.get().headOption

  /** Run `body` with the Spark job description set to the dotted path of
    * all enclosing tags + `desc`; restores the previous description after.
    */
  def tagged[T](desc: String, spark: SparkSession)(body: => T): T = {
    val full = stack.get().headOption.map(h => s"$h.$desc").getOrElse(desc)
    val sc = spark.sparkContext
    sc.setJobDescription(full)
    stack.set(full :: stack.get())
    try body
    finally {
      stack.set(stack.get().tail)
      sc.setJobDescription(stack.get().headOption.orNull)
    }
  }
}
