package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Prop, Test => SCTest}
import graft.ingest.Normalize

/** Byte-identity invariant tests mirroring the reference normalization
  * (/root/reference/src/gate/GateBatch.java:327-352). */
class NormalizeSpec extends AnyFunSuite {

  private def check(p: Prop): Unit =
    assert(SCTest.check(SCTest.Parameters.default, p).passed)

  test("trim + strip \\r + trailing \\n") {
    assert(Normalize.normalize("  hello\r\nworld \r ") === Some("hello\nworld\n"))
  }

  test("rejects docs with no alphanumeric (DOTALL)") {
    assert(Normalize.normalize("   \n\t .,;!? \n") === None)
    assert(Normalize.normalize("") === None)
    assert(Normalize.normalize(null) === None)
    assert(Normalize.normalize(".,\n a \n.,") === Some(".,\n a \n.,\n"))
  }

  test("idempotence: clean(clean(x)) == clean(x)") {
    check(Prop.forAll { (s: String) =>
      Normalize.clean(s).forall(t => Normalize.clean(t).contains(t))
    })
  }

  test("normalized text always ends with exactly one \\n and has no \\r") {
    check(Prop.forAll { (s: String) =>
      Normalize.normalize(s).forall(t =>
        t.endsWith("\n") && !t.contains("\r") && !t.dropRight(1).endsWith("\n"))
    })
  }

  test("sha256 golden") {
    assert(Normalize.sha256("abc\n") ===
      "edeaaff3f1774ad2888673770c6d64097e391bc362d7d6fb34982ddf0efd18cb")
  }
}
