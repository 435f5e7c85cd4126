package graft.graph

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GraphQueriesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a -> b -> c -> d, a -> c, plus cycle c <-> b
  private lazy val edges = Seq(
    ("a", "b", 1), ("b", "c", 1), ("c", "d", 2), ("a", "c", 1), ("c", "b", 2)
  ).toDF("src", "dst", "wave")

  test("popular: top-k by in-degree, deterministic tiebreak") {
    val got = GraphQueries.popular(edges, 3)
      .as[(String, Long)].collect.toSeq
    assert(got == Seq(("b", 2L), ("c", 2L), ("d", 1L)))
  }

  test("trace: BFS shortest path root->target over incoming edges") {
    assert(GraphQueries.trace(spark, edges, "a", "d") == Seq("a", "c", "d"))
    assert(GraphQueries.trace(spark, edges, "a", "a") == Seq("a"))
  }

  test("trace: cycle-safe, unreachable returns empty (web.py self-test b<->c)") {
    // reference self-test (web.py:190-206): loop b<->c with no path from a
    val cyc = Seq(("c", "b", 1), ("b", "c", 1)).toDF("src", "dst", "wave")
    assert(GraphQueries.trace(spark, cyc, "a", "c", maxDepth = 8) == Seq.empty)
  }

  test("deepest: furthest url from root via multi-source BFS") {
    assert(GraphQueries.deepest(spark, edges, "a") == ("d", 2))
  }

  test("driver-local BFS fast path == distributed loop (trace + deepest)") {
    // localMaxEdges = 0 forces the Pregel-style loop; default takes the
    // small-graph collect path — both must agree everywhere, including
    // ties, cycles and unreachable targets
    val cyc = Seq(("c", "b", 1), ("b", "c", 1)).toDF("src", "dst", "wave")
    for ((e, r, t) <- Seq((edges, "a", "d"), (edges, "a", "b"),
        (cyc, "a", "c"), (edges, "b", "a"))) {
      assert(GraphQueries.trace(spark, e, r, t, maxDepth = 8) ==
        GraphQueries.trace(spark, e, r, t, maxDepth = 8, localMaxEdges = 0),
        s"trace($r -> $t)")
    }
    for ((e, r) <- Seq((edges, "a"), (edges, "b"), (cyc, "b"))) {
      assert(GraphQueries.deepest(spark, e, r) ==
        GraphQueries.deepest(spark, e, r, localMaxEdges = 0),
        s"deepest($r)")
    }
  }

  test("pagerank: integer fixed-point recurrence, hand-computed 3 iterations") {
    // outdeg a=2 b=1 c=2; r0 = 1e6 each; per iteration
    // r'(v) = 150000 + (85 * sum(r(u) div outdeg(u))) div 100:
    //   i1: a=150000 b=1000000 c=1425000 d=575000
    //   i2: a=150000 b=819375  c=1063750 d=755625
    //   i3: a=150000 b=665843  c=910218  d=602093
    val got = GraphQueries.pagerank(edges).as[(String, Long)].collect.toSeq
    assert(got == Seq(("c", 910218L), ("b", 665843L), ("d", 602093L),
      ("a", 150000L)))
  }

  test("pagerank: a source-only node keeps the base rank; sinks absorb") {
    // x -> y only: y gets the full mass of x, x keeps base
    val line = Seq(("x", "y", 1)).toDF("src", "dst", "wave")
    val got = GraphQueries.pagerank(line, iters = 1)
      .as[(String, Long)].collect.toMap
    assert(got("x") == 150000L)
    assert(got("y") == 150000L + 850000L)
  }

  test("refs and aliases filters") {
    assert(GraphQueries.outRefs(edges, "a").as[String].collect.toSet == Set("b", "c"))
    assert(GraphQueries.inRefs(edges, "c").as[String].collect.toSet == Set("b", "a"))
    val aliases = Seq(("u1", "u2", 1), ("u1", "u3", 1)).toDF("canonicalUrl", "aliasUrl", "wave")
    assert(GraphQueries.aliasesOf(aliases, "u2").count() == 1)
    val m = GraphQueries.multiple(aliases).as[(String, Long, String)].collect.toSeq
    assert(m == Seq(("u1", 3L, "u2|u3")))
  }
}
