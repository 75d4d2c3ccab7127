package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.canon.ConnectedComponents
import graft.link.EntityLink

class ConnectedComponentsSpec extends AnyFunSuite with SparkTest {

  test("large-star/small-star finds components incl. chains and singletons") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("b", "c"), ("c", "d"), // chain → comp a
      ("x", "y"),                          // pair → comp x
      ("s", "s")                           // self-loop singleton
    ).toDF("src", "dst")
    val comp = ConnectedComponents.run(edges).as[(String, String)].collect().toMap
    assert(comp("a") === "a" && comp("b") === "a" && comp("c") === "a" && comp("d") === "a")
    assert(comp("x") === "x" && comp("y") === "x")
    assert(comp("s") === "s")
  }

  test("entity linking blocks + jaccard produce expected edges") {
    import spark.implicits._
    val forms = Seq("Acme Corp", "acme corp", "Acme Corp Inc", "Globex Systems")
      .toDF("form")
    val edges = EntityLink.candidateEdges(forms, minJaccard = 0.5)(spark)
      .select("src", "dst").as[(String, String)].collect().toSet
    // same-block (a:2) pair at jaccard 1.0
    assert(edges.contains(("Acme Corp", "acme corp")))
    // different token counts → different blocks → no edge (recall traded for scale)
    assert(!edges.exists(e => e._1.contains("Inc") || e._2.contains("Inc")))
    assert(!edges.exists(e => e._1.contains("Globex") || e._2.contains("Globex")))
  }

  test("entity linking embedding scoring links same-block aliases by cosine") {
    import spark.implicits._
    // "j smith" / "john smith" share block (j:2) and an identical direction vector;
    // "jane doe" is in the same block but orthogonal; "zeta co" is another block and
    // must never be compared even with a parallel vector.
    val forms = Seq(
      ("J. Smith", Array(1.0f, 0.0f, 0.0f)),
      ("john smith", Array(2.0f, 0.0f, 0.0f)),
      ("jane doe", Array(0.0f, 1.0f, 0.0f)),
      ("zeta co", Array(3.0f, 0.0f, 0.0f))
    ).toDF("form", "vec")
    val edges = EntityLink.candidateEdgesEmbedding(forms, minCosBp = 8000L)(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(edges.toSeq == Seq(("J. Smith", "john smith", 10000L)))
  }

  test("canonicalization is deterministic across runs") {
    import spark.implicits._
    val edges = (1 to 50).map(i => (s"n${i}", s"n${i + 1}")).toDF("src", "dst")
    val c1 = ConnectedComponents.run(edges).orderBy("node").collect().toSeq
    val c2 = ConnectedComponents.run(edges).orderBy("node").collect().toSeq
    assert(c1 === c2)
    // single chain: all nodes share the min component "n1"... (lexicographic min)
    val comps = c1.map(_.getString(1)).distinct
    assert(comps.size === 1)
  }
}
