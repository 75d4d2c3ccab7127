package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.align.{Grid, MSA, SmithWaterman}
import graft.nlp.Tokenizer

/** SW kernel + MSA pattern-induction fixtures, adapted from the reference's built-in
  * examples (/root/reference/src/msa/MultipleSequenceAlignment.java:355-374: rows
  * "there is a ##" + "is a large and big ##" → profile "is a - ##"). */
class SmithWatermanSpec extends AnyFunSuite {

  private def gridOf(text: String, target: String): Grid = {
    val anns = Tokenizer.annotate("u", text)
    val b = text.indexOf(target)
    Grid.build("u", 0, text.length, anns.filter(_.annotType != "Sentence"),
      Seq((b, b + target.length)))
  }

  test("golden: 'there is a ##' vs 'is a large and big ##' → is a - ##") {
    val g1 = gridOf("there is a 42", "42")
    val g2 = gridOf("is a large and big 42", "42")
    val al = SmithWaterman.align(g1, g2)
    assert(al.coversTarget)
    val pat = MSA.toPattern(al, MSA.Gates(maxGaps = 4)).get
    val core = pat.dropWhile(t => t == Grid.Start || t == Grid.Gap)
      .reverse.dropWhile(t => t == Grid.End || t == Grid.Gap).reverse
    assert(core === Vector(":token|string|is", ":token|string|a", Grid.Gap, Grid.Target))
  }

  test("identical sentences align with zero gaps") {
    val g = gridOf("Acme was founded in 1997", "1997")
    val al = SmithWaterman.align(g, g)
    assert(al.gapCount === 0)
    assert(al.coversTarget)
    assert(al.anchors.size === g.cols.size)
  }

  test("label-disjoint sentences are rejected by the gap gate (K2)") {
    val g1 = gridOf("alpha beta 1", "1")
    val g2 = gridOf("gamma delta x y z", "gamma")
    val al = SmithWaterman.align(g1, g2)
    // the :target slots still anchor (reference semantics: target match = 10^6), so
    // induction yields only the trivially generic [:start, :gap, :target] — junk that
    // the precision gate kills downstream; a minAnchors=3 gate drops it at induction
    assert(MSA.toPattern(al, MSA.Gates(maxGaps = 4)).forall(_.count(t =>
      t != Grid.Start && t != Grid.End && t != Grid.Gap) <= 1))
    assert(MSA.toPattern(al, MSA.Gates(maxGaps = 4, minAnchors = 3)) === None)
  }

  test("alignment is symmetric in score") {
    val g1 = gridOf("there is a 42", "42")
    val g2 = gridOf("is a large and big 42", "42")
    assert(SmithWaterman.align(g1, g2).score === SmithWaterman.align(g2, g1).score)
  }

  test("token-list variant counts aligned tokens (duplicate-sentence kernel)") {
    val a = Vector("the", "cat", "sat", "on", "the", "mat")
    val b = Vector("a", "cat", "sat", "on", "a", "mat")
    assert(SmithWaterman.alignTokens(a, b) === 4)
  }
}
