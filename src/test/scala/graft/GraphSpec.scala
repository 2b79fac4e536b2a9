package graft

import org.apache.spark.sql.functions._
import graft.graph.PageRank

/** Integer PageRank invariants (q132 gates the cross-engine replay;
  * these gate the algebra on graphs with known closed forms).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("regular graph is a fixed point at the uniform start") {
    // directed 3-cycle + reverse = 2-regular symmetric graph: every node
    // sends 2 × floor(r·85/200) and receives the same back, so
    // r = 150000 + 2·425000 = 1000000 forever
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val r = PageRank.hostAuthority(e, iters = 7).collect()
    assert(r.length == 3)
    r.foreach(row => assert(row.getLong(1) == 1000000L))
  }

  test("authority concentrates on the hub of a star") {
    // star: hub h linked to 6 leaves (symmetrized). Hub receives 6 full
    // damped shares, leaves split the hub's share 6 ways.
    val e = (1 to 6).map(i => ("h", s"l$i")).toDF("src", "dst")
    val ranks = PageRank.hostAuthority(e, iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val hub = ranks("h")
    val leaves = (1 to 6).map(i => ranks(s"l$i"))
    assert(leaves.distinct.size == 1, "leaves must tie exactly")
    assert(hub > 3 * leaves.head, s"hub=$hub leaf=${leaves.head}")
  }

  test("duplicate edges do not change the result") {
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val dup = e.unionByName(e).unionByName(e)
    assert(PageRank.ranks(e, 3).orderBy("node").collect().toSeq ==
      PageRank.ranks(dup, 3).orderBy("node").collect().toSeq)
  }

  test("triangles: K4 has 4, each node in 3; forest has none; dups/loops ignored") {
    import graft.graph.Triangles
    val k4 = (for { a <- Seq("p", "q", "r", "s"); b <- Seq("p", "q", "r", "s") if a < b }
      yield (a, b)).toDF("src", "dst")
    assert(Triangles.triangles(k4).count() == 4L)
    val per = Triangles.perNode(k4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(per == Map("p" -> 3L, "q" -> 3L, "r" -> 3L, "s" -> 3L))
    val forest = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    assert(Triangles.triangles(forest).count() == 0L)
    // duplicate edges, reversed orientation and self-loops change nothing
    val noisy = k4.unionByName(k4.select($"dst".as("src"), $"src".as("dst")))
      .unionByName(Seq(("p", "p")).toDF("src", "dst"))
    assert(Triangles.triangles(noisy).count() == 4L)
  }

  test("dangling nodes keep the damped base share") {
    // one edge a -> b (NOT symmetrized): b has no out-edges; after the
    // first iteration a never receives inflow -> base 150000; b gets
    // floor(150000·85/100) = 127500 inflow at the fixed point
    val e = Seq(("a", "b")).toDF("src", "dst")
    val ranks = PageRank.ranks(e, iters = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks("a") == 150000L)
    assert(ranks("b") == 150000L + 127500L)
  }
}
