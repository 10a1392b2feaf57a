package graft.html

import org.scalatest.funsuite.AnyFunSuite
import Boilerplate._

/** FIXTURES.md §5 + pinned heuristic behavior. */
class BoilerplateSpec extends AnyFunSuite {

  test("html_basic: nav/footer stripped, article kept") {
    val html = "<html><body><nav>menu</nav><article><p>Main content.</p></article>" +
      "<footer>c</footer></body></html>"
    assert(extract(html) == Vector(TextPiece("Main content.")))
  }

  test("html_link_dense: link-heavy block stripped, plain block kept") {
    val html = "<div><a href='/a'>one link</a> <a href='/b'>two links here</a></div>" +
      "<div>This paragraph is plain prose with enough text.</div>"
    assert(extract(html) == Vector(TextPiece("This paragraph is plain prose with enough text.")))
  }

  test("html_with_img: media span interleaved at document order") {
    val html = "<article><p>Before.</p><img src=\"pic1.png\"><p>After.</p></article>"
    assert(extract(html) == Vector(
      TextPiece("Before."), MediaPiece("pic1.png"), TextPiece("After.")))
  }

  test("img inside nav is stripped") {
    val html = "<nav><img src=\"logo.png\"></nav><p>Body text.</p>"
    assert(extract(html) == Vector(TextPiece("Body text.")))
  }

  test("script/style raw content never leaks") {
    val html = "<style>p { color: red }</style><script>var x = '<p>fake</p>';</script><p>Real.</p>"
    assert(extract(html) == Vector(TextPiece("Real.")))
  }

  test("entities decode and whitespace collapses") {
    val html = "<p>a &amp; b&nbsp;&nbsp; c\n\n  d &#65;&#x42;</p>"
    assert(extract(html) == Vector(TextPiece("a & b c d AB")))
  }

  test("half link / half text block survives at exactly 0.5 density") {
    val html = "<div><a href='/'>abcde</a> fghij</div>"
    assert(extract(html) == Vector(TextPiece("abcde fghij")))
  }

  test("unclosed tags and bare < are fail-soft") {
    val html = "<p>1 < 2 and <unclosed"
    assert(extract(html) == Vector(TextPiece("1 < 2 and")))
  }

  test("comments and doctype skipped") {
    val html = "<!DOCTYPE html><!-- <p>ghost</p> --><p>Live.</p>"
    assert(extract(html) == Vector(TextPiece("Live.")))
  }

  test("nested strip regions need matching depth") {
    val html = "<header><div><nav>x</nav></div>deep</header><p>Kept.</p>"
    assert(extract(html) == Vector(TextPiece("Kept.")))
  }

  test("raw-text close tags match case-insensitively (</SCRIPT>)") {
    val html = "<SCRIPT>var x = '<p>ghost</p>';</SCRIPT><p>Real.</p><style>p{}</STYLE><p>Also.</p>"
    assert(extract(html) == Vector(TextPiece("Real."), TextPiece("Also.")))
  }

  test("links: edges in order, boilerplate flag, entity-decoded anchors, decoys skipped") {
    import Boilerplate.LinkEdge
    val html =
      """<nav><a href="/home">Home &amp; start</a></nav>
        |<p><a href="/x">one</a> mid <a href=/y>two  words</a></p>
        |<script>var a = "<a href='/ghost'>no</a>";</script>
        |<a name="anchor-only">not an edge</a><a href="">empty</a>
        |<footer><a href="/f">f</a></footer>""".stripMargin
    assert(Boilerplate.links(html) == Vector(
      LinkEdge("/home", "Home & start", boilerplate = true),
      LinkEdge("/x", "one", boilerplate = false),
      LinkEdge("/y", "two words", boilerplate = false),
      LinkEdge("/f", "f", boilerplate = true)))
  }

  test("links: a new <a> auto-closes a dangling one (browser rule); unclosed final anchor flushes") {
    import Boilerplate.LinkEdge
    val html = """<a href="/1">first <a href="/2">second"""
    assert(Boilerplate.links(html) == Vector(
      LinkEdge("/1", "first", boilerplate = false),
      LinkEdge("/2", "second", boilerplate = false)))
  }
}
