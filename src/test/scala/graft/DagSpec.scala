package graft

import graft.dag.DAG
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Mirrors reference tests/dag_test.py semantics: dependency order, error
  * propagation (descendants skipped), BREAK short-circuit, states.
  */
class DagSpec extends AnyFunSuite {

  test("executes in dependency order with results visible to children") {
    val dag = new DAG("t")
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val a = dag.node("a") { () => order.add("a"); 5 }
    val b = dag.node("b") { () => order.add("b"); "beep" }
    val c = dag.node("c", Seq(b)) { () => order.add("c"); 8 }
    val d = dag.node("d", Seq(a, b, c)) { () =>
      order.add("d")
      b.result.toString * math.abs(c.result.asInstanceOf[Int] - a.result.asInstanceOf[Int])
    }
    dag.execute(4)
    assert(dag.isSuccess)
    assert(d.result == "beep" * 3)
    val idx = order.toArray.map(_.toString).zipWithIndex.toMap
    assert(idx("b") < idx("c") && idx("c") < idx("d") && idx("a") < idx("d"))
  }

  test("error marks node ERROR and skips all descendants") {
    val dag = new DAG("t2")
    val a = dag.node("a")(() => 1)
    val e = dag.node("e", Seq(a))(() => throw new RuntimeException("omg, crash!"))
    val f = dag.node("f", Seq(e))(() => "never")
    val g = dag.node("g", Seq(f))(() => "never2")
    val h = dag.node("h", Seq(a))(() => "fine")
    dag.execute(4)
    assert(!dag.isSuccess)
    assert(a.state == DAG.Success && h.state == DAG.Success)
    assert(e.state == DAG.Error && e.exception.exists(_.getMessage == "omg, crash!"))
    assert(f.state == DAG.Skipped && g.state == DAG.Skipped)
  }

  test("Break result skips descendants without error") {
    val dag = new DAG("t3")
    val a = dag.node("a")(() => DAG.Break)
    val b = dag.node("b", Seq(a))(() => "never")
    dag.execute(2)
    assert(dag.isSuccess)
    assert(a.state == DAG.Skipped && b.state == DAG.Skipped)
    assert(dag.errorNodes.isEmpty)
  }

  test("bounded concurrency") {
    val dag = new DAG("t4")
    val running = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    (1 to 8).foreach { i =>
      dag.node(s"n$i") { () =>
        val r = running.incrementAndGet()
        maxSeen.updateAndGet(m => math.max(m, r))
        Thread.sleep(50)
        running.decrementAndGet()
        i
      }
    }
    dag.execute(2)
    assert(dag.isSuccess)
    assert(maxSeen.get() <= 2)
  }

  test("toDot renders nodes with states, edges, and escaped names") {
    val dag = new DAG("viz")
    val a = dag.node("load")(() => 1)
    val b = dag.node("boom \"q\"", Seq(a))(() => throw new RuntimeException("x"))
    dag.node("after", Seq(b))(() => 2)
    dag.execute(2)
    val dot = dag.toDot
    assert(dot.startsWith("digraph \"viz\" {"))
    assert(dot.contains("\"load\" [fillcolor=palegreen, label=\"load\\nSuccess\"]"))
    assert(dot.contains("\"boom \\\"q\\\"\" [fillcolor=salmon"))
    assert(dot.contains("label=\"after\\nSkipped\"") && dot.contains("fillcolor=lightgray"))
    assert(dot.contains("\"load\" -> \"boom \\\"q\\\"\";"))
    assert(dot.contains("\"boom \\\"q\\\"\" -> \"after\";"))
  }

  test("pipeline visualize emits the step graph as DOT") {
    val p = new graft.pipeline.SparkPipeline("vizp", SparkSpec.session)
    val s1 = p.step("first") { _ => Seq(1) }
    p.step("second", dependsOn = Seq(s1)) { _ => Seq(2) }
    p.run(2)
    val dot = p.visualize
    assert(dot.contains("\"first\" -> \"second\";"))
    assert(dot.contains("label=\"second\\nSuccess\""))
  }

  test("re-registering a node name replaces function and dependencies") {
    val dag = new DAG("t5")
    val a = dag.node("a")(() => 1)
    dag.node("x", Seq(a))(() => "old")
    val x2 = dag.node("x")(() => "new")
    dag.execute(2)
    assert(x2.result == "new")
    assert(dag.nodes.count(_.name == "x") == 1)
  }
}
