package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{HtmlText, Normalize}

class HtmlTextSpec extends AnyFunSuite {

  test("drops script/style, decodes entities, breaks on block tags") {
    val html = "<html><head><title>T</title><style>p{color:red}</style>" +
      "<script>var x = '<p>not text</p>';</script></head>" +
      "<body><p>Hello &amp; <b>world</b></p><div>Second&nbsp;line</div></body></html>"
    assert(HtmlText.extract(html) === "T\nHello & world\nSecond line")
  }

  test("collapses whitespace deterministically") {
    assert(HtmlText.extract("<p>a   b\t c</p>\n\n<p>d</p>") === "a b c\nd")
  }

  test("numeric entities and unknown entities") {
    assert(HtmlText.extract("x&#65;y &unknown; z") === "xAy &unknown; z")
  }

  test("self-closing and malformed tags") {
    assert(HtmlText.extract("a<br/>b<img src='x'>c<unclosed") === "a\nbc")
  }

  test("full page path is deterministic and byte-stable (golden)") {
    val page = "<html><body><p>Acme Corp was founded in 1997.</p></body></html>"
    val norm = HtmlText.extractNormalized(page.getBytes("UTF-8"))
    assert(norm === Some("Acme Corp was founded in 1997.\n"))
    assert(Normalize.sha256(norm.get) ===
      Normalize.sha256("Acme Corp was founded in 1997.\n"))
  }

  test("alnum gate rejects tag-only pages") {
    assert(HtmlText.extractNormalized("<p>.,;</p>".getBytes("UTF-8")) === None)
  }
}
