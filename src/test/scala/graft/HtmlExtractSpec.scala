package graft

import graft.operators.HtmlExtract
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the HTML walk: chrome subtrees vanish, raw-text elements
  * cannot desync on embedded '<' or fake tags, entities round-trip,
  * empty paragraphs survive as real segments, the link-density gate
  * fires on link farms and spares prose with a link, and the builder ∘
  * extractor composition is the identity on the text.
  */
class HtmlExtractSpec extends AnyFunSuite {

  private def main(html: String): String = HtmlExtract.extractMain(html)._1

  test("chrome subtrees (nav/header/footer/aside) contribute nothing") {
    val html = "<body><nav>Home About</nav><p>keep</p>" +
      "<header>Logo<div>deep</div></header><footer>© 2026</footer></body>"
    assert(main(html) === "keep")
  }

  test("script/style raw text cannot desync the walk") {
    val html = "<head><script>if(x<2){y='</div><p>fake</p>'}</script>" +
      "<style>p{content:'<nav>'}</style></head><body><p>real</p></body>"
    assert(main(html) === "real")
  }

  test("entities decode; escape ∘ decode is the identity") {
    val nasty = "a < b && c > \"d\" &amp; 'e' — ✓"
    val html = s"<body><p>${HtmlExtract.escapeHtml(nasty)}</p></body>"
    assert(main(html) === nasty)
    assert(main("<body><p>&#65;&#x42;&nbsp;&apos;</p></body>") === "AB\u00a0'")
  }

  test("empty paragraphs are real segments; br is a newline") {
    assert(main("<body><p>a</p><p></p><p>b</p></body>") === "a\n\nb")
    assert(main("<body><p>x<br>y</p></body>") === "x\ny")
  }

  test("link-density gate drops link farms, keeps prose with a link") {
    val farm = "<div>See: <a>long related article one</a> <a>long related article two</a></div>"
    val prose = "<p>A sentence with one short <a>link</a> inside a lot of prose.</p>"
    val (txt, kept, dropped) = HtmlExtract.extractMain(s"<body>$farm$prose</body>")
    assert(kept === 1 && dropped === 1)
    assert(txt === "A sentence with one short link inside a lot of prose.")
  }

  test("comments and declarations are skipped") {
    assert(main("<!DOCTYPE html><body><!-- <p>no</p> --><p>yes</p></body>") === "yes")
  }

  test("pageMeta: title RCDATA, quoted attrs, link count incl. chrome") {
    val html = "<html><head><title>A &amp; B</title>" +
      "<meta name='description' content=\"desc with spaces\">" +
      "<script>var t='<title>no</title>'</script></head>" +
      "<body><nav><a href='/'>x</a></nav><p><a>y</a></p>" +
      "<!-- <a>comment link</a> --></body></html>"
    val m = HtmlExtract.pageMeta(html)
    assert(m.title === Some("A & B"))
    assert(m.metaDesc === Some("desc with spaces"))
    assert(m.nLinks === 2)
  }

  test("pageMeta: absent fields are None; bare attr values parse") {
    val m = HtmlExtract.pageMeta("<body><meta name=description content=one></body>")
    assert(m.title === None)
    assert(m.metaDesc === Some("one"))
    assert(m.nLinks === 0)
  }

  test("builder ∘ extractor is the identity on corpus text") {
    val texts = Seq("one line", "two\nlines", "trailing\n", "", "a & b < c",
      "unicode — déjà ✓\nsecond")
    texts.zipWithIndex.foreach { case (t, i) =>
      val paras = t.split("\n", -1)
      val sb = new StringBuilder("<html><head><title>T</title></head><body><div>")
      paras.foreach(p => sb ++= "<p>" + HtmlExtract.escapeHtml(p) + "</p>")
      sb ++= "</div></body></html>"
      assert(main(sb.toString) === t, s"case $i")
    }
  }
}
