package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.{AhoCorasick, GazEntry, Gazetteer, Tokenizer}

class AhoCorasickSpec extends AnyFunSuite {

  test("finds overlapping multi-token matches via fail links") {
    val ac = AhoCorasick.build(Seq(
      Seq("a", "b"), Seq("b", "c"), Seq("a", "b", "c"), Seq("c")))
    val hits = ac.findAll(Vector("a", "b", "c", "a", "b"))
    // (start, end, dictId)
    assert(hits.toSet === Set((0, 2, 0), (1, 3, 1), (0, 3, 2), (2, 3, 3), (3, 5, 0)))
  }

  test("no false positives on shared prefixes") {
    val ac = AhoCorasick.build(Seq(Seq("x", "y", "z")))
    assert(ac.findAll(Vector("x", "y", "x", "y", "z")) === Vector((2, 5, 0)))
  }

  test("gazetteer produces Lookup annotations with case-insensitive phrase match") {
    val gaz = Gazetteer.build(Seq(GazEntry("Acme Corp", "entity", "org")))
    val text = "We met ACME corp today"
    val toks = Tokenizer.scan(text)
    val anns = gaz.annotate("u", text, toks, firstId = 10)
    assert(anns.size === 1)
    val a = anns.head
    assert(a.annotType === "Lookup")
    assert(text.substring(a.begin, a.end) === "ACME corp")
    assert(a.features("majorType") === "entity")
    assert(a.annotId === 10)
  }
}
