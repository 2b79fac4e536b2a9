package graft.dag

import java.util.concurrent.{ConcurrentHashMap, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import scala.collection.mutable
import scala.util.control.NonFatal

/** Threaded topological DAG executor.
  *
  * Capability parity with the reference's DAG (reference: bdq/dag.py) —
  * node states (SUCCESS / ERROR / RUNNING / SKIPPED), `Break` short-circuit
  * result that skips descendants, bounded worker pool, per-node timings —
  * rebuilt on plain JUC primitives. Nodes typically submit Spark actions, so
  * concurrent nodes give the Spark scheduler parallel jobs (FAIR/FIFO at the
  * cluster level); the DAG itself does no Spark work.
  */
object DAG {
  /** Sentinel result: mark this node "done, but do not run my descendants". */
  case object Break

  sealed trait State
  case object Pending extends State
  case object Running extends State
  case object Success extends State
  case object Error extends State
  case object Skipped extends State
}

class DAG(val name: String = "DAG") {
  import DAG._

  final class Node private[DAG] (
      val name: String,
      private[DAG] val fn: () => Any
  ) {
    private[DAG] val parents = mutable.LinkedHashSet.empty[Node]
    private[DAG] val children = mutable.LinkedHashSet.empty[Node]
    @volatile private[DAG] var _state: State = Pending
    @volatile var result: Any = _
    @volatile var exception: Option[Throwable] = None
    @volatile var startTs: Long = -1L
    @volatile var stopTs: Long = -1L

    def state: State = _state match {
      case Success if result == Break => Skipped
      case s => s
    }
    def dependsOn: Set[String] = parents.map(_.name).toSet
    override def toString = s"Node($name, state=$state)"
  }

  private val nodesByName = mutable.LinkedHashMap.empty[String, Node]

  def nodes: Seq[Node] = nodesByName.values.toSeq
  def apply(name: String): Node = nodesByName(name)

  /** Register a node. Re-registering an existing name replaces its function
    * and dependencies (reference behaviour: bdq/dag.py:158-174).
    */
  def node(name: String, dependsOn: Seq[Node] = Nil)(fn: () => Any): Node = {
    dependsOn.foreach { d =>
      require(nodesByName.get(d.name).contains(d), s"dependency not in this DAG: ${d.name}")
    }
    nodesByName.get(name).foreach { old =>
      nodesByName.values.foreach { n => n.children -= old; n.parents -= old }
      nodesByName.remove(name)
    }
    val n = new Node(name, fn)
    nodesByName(name) = n
    dependsOn.foreach { p => p.children += n; n.parents += p }
    n
  }

  def isDependencyMet(n: Node): Boolean =
    n.parents.forall(p => p.state == Success)

  def isSuccess: Boolean = errorNodes.isEmpty
  def errorNodes: Seq[Node] = nodes.filter(_.state == Error)
  def skippedNodes: Seq[Node] = nodes.filter(_.state == Skipped)
  def successNodes: Seq[Node] = nodes.filter(_.state == Success)

  def resetNodes(): Unit = nodesByName.values.foreach { n =>
    n._state = Pending; n.result = null; n.exception = None
    n.startTs = -1L; n.stopTs = -1L
  }

  /** Graphviz DOT rendering of the DAG with per-node execution state
    * (reference: bdq/dag.py:236 visualize — there a live ipydagred3 widget;
    * here a dependency-free DOT string renderable by any graphviz tool,
    * `dot -Tsvg`, or a notebook cell).
    */
  def toDot: String = {
    def esc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n").replace("\r", "\\r")
    def q(s: String): String = "\"" + esc(s) + "\""
    val color: State => String = {
      case Success => "palegreen"
      case Error   => "salmon"
      case Skipped => "lightgray"
      case Running => "khaki"
      case Pending => "white"
    }
    val sb = new StringBuilder
    sb ++= s"digraph ${q(name)} {\n  rankdir=LR;\n  node [shape=box, style=filled];\n"
    nodes.foreach { n =>
      // \n inside the label is a DOT line break, not an escaped backslash
      sb ++= s"""  ${q(n.name)} [fillcolor=${color(n.state)}, label="${esc(n.name)}\\n${n.state}"];\n"""
    }
    nodes.foreach { n =>
      n.parents.foreach { p => sb ++= s"  ${q(p.name)} -> ${q(n.name)};\n" }
    }
    sb ++= "}\n"
    sb.result()
  }

  /** Run all runnable nodes with at most `maxWorkers` concurrent threads.
    * Blocks until every node reaches a terminal state.
    */
  def execute(maxWorkers: Int): Unit = {
    require(maxWorkers > 0, "maxWorkers must be positive")
    resetNodes()
    if (nodesByName.isEmpty) return
    val pool = Executors.newFixedThreadPool(maxWorkers)
    val pendingCount = new AtomicInteger(nodesByName.size)
    val done = new java.util.concurrent.CountDownLatch(1)
    val lock = new Object
    val started = ConcurrentHashMap.newKeySet[Node]()

    def finish(n: Node): Unit = {
      val toStart = lock.synchronized {
        if (pendingCount.decrementAndGet() == 0) { done.countDown(); Nil }
        else schedulable()
      }
      toStart.foreach(submit)
    }

    // A node is startable when all parents are terminal-success; if any
    // parent is Error/Skipped/Break the node is terminally Skipped.
    def schedulable(): Seq[Node] = {
      val out = mutable.ArrayBuffer.empty[Node]
      var progress = true
      while (progress) {
        progress = false
        nodesByName.values.foreach { n =>
          if (n._state == Pending && !started.contains(n)) {
            val parentStates = n.parents.map(_.state)
            if (parentStates.exists(s => s == Error || s == Skipped)) {
              n._state = Skipped
              started.add(n)
              if (pendingCount.decrementAndGet() == 0) done.countDown()
              progress = true
            } else if (parentStates.forall(_ == Success)) {
              started.add(n)
              out += n
            }
          }
        }
      }
      out.toSeq
    }

    def submit(n: Node): Unit = {
      n._state = Running
      pool.execute { () =>
        n.startTs = System.currentTimeMillis()
        try {
          n.result = n.fn()
          n._state = Success
        } catch {
          case NonFatal(e) =>
            n.exception = Some(e)
            n._state = Error
        } finally {
          n.stopTs = System.currentTimeMillis()
          finish(n)
        }
      }
    }

    val initial = lock.synchronized(schedulable())
    if (pendingCount.get() == 0) done.countDown()
    initial.foreach(submit)
    done.await()
    pool.shutdown()
    pool.awaitTermination(1, TimeUnit.MINUTES)
  }
}
