package graft.pipeline

import java.sql.Timestamp
import graft.dag.DAG
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Multi-step Spark pipeline on top of [[graft.dag.DAG]].
  *
  * Capability parity with the reference's SparkPipeline
  * (reference: bdq/spark_pipeline.py): named steps with declared outputs,
  * dependencies by step or by output name, temp-view steps, managed-table
  * steps, streaming foreachBatch steps, per-step Spark metrics via
  * `Dataset.observe`, and persisted run state.
  *
  * Steps run concurrently on the DAG's worker pool; concurrent Spark
  * actions from different steps share the scheduler (this is how a wide
  * pipeline keeps a large cluster busy — independent stages overlap).
  */
class SparkPipeline(
    val name: String,
    val spark: SparkSession,
    val stateStore: Option[StateStore] = None
) {
  import SparkPipeline._

  private val dag = new DAG(name)
  private val registeredOutputs = mutable.LinkedHashMap.empty[String, Step]
  private val stepsByName = mutable.LinkedHashMap.empty[String, Step]
  // full metric keys ("step.progressive_x") registered via
  // progressiveMetricExprs — the EXPLICIT carry-over set (never inferred
  // from name shape)
  private val progressiveKeys = mutable.Set.empty[String]
  val conf: mutable.Map[String, String] = mutable.Map.empty

  @volatile var startTs: Option[Timestamp] = None
  @volatile var stopTs: Option[Timestamp] = None
  @volatile private var lastRunMetricsCache: Map[String, Double] =
    stateStore.flatMap(_.loadLatest(name)).map(_.metrics).getOrElse(Map.empty)

  def checkpointLocation: Option[String] =
    conf.get("spark.sql.streaming.checkpointLocation")
      .orElse(Option(spark.conf.getOption("spark.sql.streaming.checkpointLocation").orNull))

  final class Step private[SparkPipeline] (
      val name: String,
      val outputs: Seq[String],
      dependsOn: Seq[StepRef],
      body: Step => Seq[Any]
  ) {
    private[SparkPipeline] val node: dag.Node = {
      val depSteps = dependsOn.map {
        case StepRef.ByStep(s) => s
        case StepRef.ByName(n) =>
          registeredOutputs.getOrElse(n, throw new IllegalArgumentException(s"unresolved depends on: $n"))
      }.distinct
      dag.node(name, depSteps.map(_.node)) { () =>
        SparkUILogger.tagged(s"${SparkPipeline.this.name}#$name", spark) {
          val data = body(this)
          require(
            data.length == outputs.length,
            s"Step $name returned ${data.length} value(s), expected ${outputs.length} to match $outputs"
          )
          data
        }
      }
    }

    val metrics: mutable.Map[String, Double] = new java.util.concurrent.ConcurrentHashMap[String, Double]().asScala

    def state: DAG.State = node.state
    def result: Seq[Any] = Option(node.result).map(_.asInstanceOf[Seq[Any]]).getOrElse(Nil)
    def exception: Option[Throwable] = node.exception
    def startTs: Long = node.startTs
    def stopTs: Long = node.stopTs
    override def toString: String = s"Step($name, $state)"
  }

  sealed trait StepRef
  object StepRef {
    final case class ByStep(s: Step) extends StepRef
    final case class ByName(n: String) extends StepRef
  }
  import StepRef._

  private def refs(dependsOn: Seq[Any]): Seq[StepRef] = dependsOn.map {
    case s: Step => ByStep(s)
    case n: String => ByName(n)
    case x => throw new IllegalArgumentException(s"depends_on must be Step or output name, got $x")
  }

  private def register(step: Step): Step = {
    step.outputs.foreach { o =>
      registeredOutputs.get(o).filter(_.name != step.name).foreach { other =>
        throw new IllegalArgumentException(s"$o is already created by Step ${other.name}")
      }
      registeredOutputs(o) = step
    }
    stepsByName(step.name) = step
    step
  }

  /** Arbitrary (non-Spark) logic step; returns any values. */
  def step(name: String, outputs: Seq[String] = null, dependsOn: Seq[Any] = Nil)(
      body: Step => Seq[Any]): Step =
    register(new Step(name, Option(outputs).getOrElse(Seq(name)), refs(dependsOn), body))

  /** Step producing DataFrames (one per declared output). */
  def stepSpark(name: String, outputs: Seq[String] = null, dependsOn: Seq[Any] = Nil)(
      body: Step => Seq[DataFrame]): Step =
    register(new Step(name, Option(outputs).getOrElse(Seq(name)), refs(dependsOn),
      s => body(s).map(_.asInstanceOf[Any])))

  /** DataFrames registered as temp views named after the outputs; the step
    * result re-reads the views (reference: step_spark_temp_view).
    */
  def stepSparkTempView(name: String, outputs: Seq[String] = null, dependsOn: Seq[Any] = Nil)(
      body: Step => Seq[DataFrame]): Step = {
    val outs = Option(outputs).getOrElse(Seq(name))
    register(new Step(name, outs, refs(dependsOn), { s =>
      val dfs = body(s)
      require(dfs.length == outs.length, s"Step $name returned ${dfs.length} df(s), expected ${outs.length}")
      dfs.zip(outs).map { case (df, o) =>
        df.createOrReplaceTempView(o)
        spark.table(o).asInstanceOf[Any]
      }
    }))
  }

  /** DataFrames written as managed tables named after the outputs
    * (reference: step_spark_table). Observed metrics registered via
    * [[sparkMetric]] are collected from the write.
    */
  def stepSparkTable(
      name: String,
      outputs: Seq[String] = null,
      dependsOn: Seq[Any] = Nil,
      format: String = "parquet",
      mode: String = "overwrite",
      partitionBy: Seq[String] = Nil,
      metricExprs: Map[String, String] = Map.empty,
      progressiveMetricExprs: Map[String, String] = Map.empty
  )(body: Step => Seq[DataFrame]): Step = {
    val outs = Option(outputs).getOrElse(Seq(name))
    val allowed = Set("overwrite", "append", "errorifexists", "ignore")
    require(allowed.contains(mode), s"Invalid mode: $mode, allowed: $allowed")
    require((metricExprs.isEmpty && progressiveMetricExprs.isEmpty) || outs.length == 1,
      "spark metrics require a single output")
    // progressive metrics (reference: spark_pipeline.py:235
    // spark_progressive_metric) are observed identically but their recorded
    // key is prefixed progressive_, which makes run()'s save-state carry the
    // last run's value forward whenever the current run fails to produce one
    val allExprs = metricExprs ++
      progressiveMetricExprs.map { case (k, v) => s"progressive_$k" -> v }
    // registered explicitly IN ADDITION to the reserved-prefix convention
    // run() applies (see the carry-over filter there): the registry covers
    // metric names that themselves contain dots, where the final-segment
    // convention can't see the prefix
    progressiveMetricExprs.keys.foreach(k => progressiveKeys += s"$name.progressive_$k")
    register(new Step(name, outs, refs(dependsOn), { s =>
      val dfs = body(s)
      require(dfs.length == outs.length, s"Step $name returned ${dfs.length} df(s), expected ${outs.length}")
      dfs.zip(outs).map { case (df0, o) =>
        val observations = allExprs.map { case (mName, _) =>
          mName -> new Observation(s"$name.$mName")
        }
        var df = df0
        observations.foreach { case (mName, obs) =>
          df = df.observe(obs, org.apache.spark.sql.functions.expr(allExprs(mName)).as(mName))
        }
        val writer = df.write.format(format).mode(mode)
        (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer).saveAsTable(o)
        observations.foreach { case (mName, obs) =>
          obs.get.get(mName).foreach {
            case n: Number => s.metrics(mName) = n.doubleValue()
            case _ =>
          }
        }
        spark.table(o).asInstanceOf[Any]
      }
    }))
  }

  /** Structured Streaming foreachBatch step (reference:
    * step_spark_for_each_batch): reads `input` (a temp view/table name whose
    * content is a streaming DataFrame), runs `onBatch` per micro-batch,
    * blocks until the query terminates (use availableNow for bounded runs).
    */
  def stepForEachBatch(
      name: String,
      input: Step => DataFrame,
      dependsOn: Seq[Any] = Nil,
      trigger: Trigger = Trigger.AvailableNow(),
      outputMode: Option[String] = None,
      checkpoint: Option[String] = None
  )(onBatch: (DataFrame, Long, Step) => Unit): Step =
    register(new Step(name, Seq(name), refs(dependsOn), { s =>
      val cp = checkpoint
        .orElse(checkpointLocation.map(base => s"$base/${SparkPipeline.this.name}/$name"))
        .getOrElse(throw new IllegalStateException("no checkpoint location configured"))
      var dw = input(s).writeStream
        .option("checkpointLocation", cp)
        .queryName(s"${SparkPipeline.this.name}#$name")
        .foreachBatch((df: DataFrame, id: Long) => onBatch(df, id, s))
        .trigger(trigger)
      outputMode.foreach(m => dw = dw.outputMode(m))
      val q = dw.start()
      q.awaitTermination()
      q.exception.foreach(e => throw e)
      Seq(s.name)
    }))

  /** Instantiate a registered custom step kind by name (reference:
    * bdq/spark_pipeline.py:346 register_spark_pipeline_step_implementation —
    * the open plugin mechanism; factories build on the public step
    * builders, so a custom kind composes dependencies/outputs like any
    * built-in one).
    */
  def stepImpl(impl: String, spec: SparkPipeline.StepSpec): Step =
    SparkPipeline.stepImplementation(impl)(this, spec).asInstanceOf[Step]

  /** DOT rendering of the step graph with live states (reference:
    * spark_pipeline.py:232 visualize).
    */
  def visualize: String = dag.toDot

  def steps: Map[String, Step] = stepsByName.toMap
  def successSteps: Map[String, Step] = stepsByName.filter(_._2.state == DAG.Success).toMap
  def errorSteps: Map[String, Step] = stepsByName.filter(_._2.state == DAG.Error).toMap
  def skippedSteps: Map[String, Step] = stepsByName.filter(_._2.state == DAG.Skipped).toMap
  def isSuccess: Boolean = errorSteps.isEmpty

  def metrics: Map[String, Double] =
    stepsByName.values.flatMap(s => s.metrics.map { case (k, v) => s"${s.name}.$k" -> v }).toMap

  def lastRunMetrics: Map[String, Double] = lastRunMetricsCache

  /** Execute all steps respecting dependencies; persists state; throws when
    * any step failed (after all runnable steps finished).
    */
  def run(maxConcurrentSteps: Int = 10): Map[String, Step] = {
    startTs = Some(new Timestamp(System.currentTimeMillis()))
    stopTs = None
    dag.execute(maxConcurrentSteps)
    stopTs = Some(new Timestamp(System.currentTimeMillis()))
    stateStore.foreach { ss =>
      // progressive_ is a RESERVED prefix for the final dot-segment of a
      // metric key (reference behaviour: bdq/spark_pipeline.py:325
      // _get_save_state): any metric whose name starts with it gains carry
      // semantics, registered or not — so plain metrics must not use the
      // prefix. The explicit progressiveKeys registry ADDS carry for
      // metric names that themselves contain dots, where the final-segment
      // convention can't see the prefix. (Step-name segments never
      // trigger carry — only the final segment is inspected.)
      val current = metrics
      val carried = lastRunMetricsCache.filter { case (k, _) =>
        (progressiveKeys.contains(k) || k.split('.').last.startsWith("progressive_")) &&
          !current.contains(k)
      }
      ss.save(ss.State(name, startTs.get, stopTs, current ++ carried))
      lastRunMetricsCache = ss.loadLatest(name).map(_.metrics).getOrElse(Map.empty)
    }
    if (!isSuccess)
      throw new IllegalStateException(
        s"Step(s) have failed: ${errorSteps.keys.mkString(", ")}",
        errorSteps.values.headOption.flatMap(_.exception).orNull
      )
    successSteps
  }
}

object SparkPipeline {

  /** Declarative config a custom step factory receives: identity, wiring,
    * free-form params, and the user body.
    */
  final case class StepSpec(
      name: String,
      outputs: Seq[String] = null,
      dependsOn: Seq[Any] = Nil,
      params: Map[String, String] = Map.empty,
      body: SparkPipeline#Step => Seq[Any] = _ => Nil
  )

  type StepFactory = (SparkPipeline, StepSpec) => SparkPipeline#Step

  private val stepImplementations =
    scala.collection.concurrent.TrieMap.empty[String, StepFactory]

  /** Register a user-defined step kind once, globally; any pipeline can then
    * instantiate it via [[SparkPipeline.stepImpl]]. Same contract as the
    * reference: the name must start with "step" and double registration is
    * an error.
    */
  def registerStepImplementation(name: String)(factory: StepFactory): Unit = {
    require(name.startsWith("step"), s"invalid name: $name; name must start with 'step'")
    if (stepImplementations.putIfAbsent(name, factory).isDefined)
      throw new IllegalArgumentException(s"$name is already registered!")
  }

  /** Test/liveness hook: drop a registered kind (the reference's module-level
    * setattr registry has no unregister; long-lived JVMs need one).
    */
  def unregisterStepImplementation(name: String): Unit =
    stepImplementations.remove(name)

  private def stepImplementation(name: String): StepFactory =
    stepImplementations.getOrElse(name,
      throw new IllegalArgumentException(s"no step implementation registered under: $name"))
}
