package graft.core

import org.scalatest.funsuite.AnyFunSuite

class HtmlExtractSpec extends AnyFunSuite {

  private val page =
    """<!DOCTYPE html><html><head><title>ignored</title>
      |<style>body { color: red }</style></head>
      |<body>
      |<nav><a href="/">Home</a> <a href="/about">About</a></nav>
      |<h1>Main Article Title</h1>
      |<p>This is the first paragraph of the main content with enough words.</p>
      |<p>Second paragraph continues the main content here &amp; now.</p>
      |<div><a href="/x">read more</a></div>
      |<footer>Copyright 2026 Example Corp</footer>
      |</body></html>""".stripMargin

  test("looksLikeHtml routes markup, not plain text or markdown") {
    assert(HtmlExtract.looksLikeHtml(page))
    assert(!HtmlExtract.looksLikeHtml("plain text turn"))
    assert(!HtmlExtract.looksLikeHtml("a < b and c > d"))
    assert(!HtmlExtract.looksLikeHtml("^C TITLE\nbody"))
  }

  test("boilerplate containers and link-dense blocks stripped") {
    val els = HtmlExtract.tokenize(page).collect { case ParaElement(e) => e }
    val content = els.filter(!_.boilerplate).map(_.text)
    val boiler = els.filter(_.boilerplate).map(_.text)
    assert(content == Seq(
      "Main Article Title",
      "This is the first paragraph of the main content with enough words.",
      "Second paragraph continues the main content here & now."))
    assert(boiler.exists(_.contains("Home")))           // nav
    assert(boiler.exists(_.contains("read more")))      // link-dense div
    assert(boiler.exists(_.contains("Copyright")))      // footer
    assert(!els.exists(_.text.contains("color: red")))  // style raw text
  }

  test("headings become headers through the segmenter") {
    val md = Segmenter.segment(HtmlExtract.tokenize(page))
    assert(md.documents.size == 1)
    val p = md.documents.head.paragraphs
    assert(p.size == 1)
    assert(p.head.header.text == "Main Article Title")
    assert(p.head.body.text ==
      "This is the first paragraph of the main content with enough words.\n" +
      "Second paragraph continues the main content here & now.")
    assert(md.spans.count(_.kind == "boilerplate") >= 3)
  }

  test("entities decoded, whitespace collapsed, comments skipped") {
    val els = HtmlExtract.tokenize(
      "<p>a&nbsp;&lt;b&gt;   c\n\n d</p><!-- hidden --><p>tail</p>")
      .collect { case ParaElement(e) => e }
    assert(els.map(_.text) == Seq("a <b> c d", "tail"))
  }
}
