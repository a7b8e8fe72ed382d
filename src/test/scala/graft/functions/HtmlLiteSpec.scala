package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HtmlLiteSpec extends AnyFunSuite {

  val page =
    """<html><body>
      |<div id="postingTitle">TITLE Report Ad</div>
      |<div class="adInfo"> Posted: Thursday, May 4, 2017 11:53 PM </div>
      |<p class="metaInfoDisplay">Poster's age: 25</p>
      |<div class="postingBody">outer <div>nested</div> tail &amp; more</div>
      |<div>Location: Downtown, Eastside</div>
      |<div id="OtherAdsByThisUser"><div class="cat first"><a href="http://x/1">a</a></div>
      |<div class="cat"><a href='http://x/2'>b</a></div></div>
      |</body></html>""".stripMargin

  test("findFirst by class with nesting") {
    val inner = HtmlLite.findFirst(page, "div", "class", "postingBody").get
    assert(HtmlLite.text(inner) == "outer nested tail & more")
  }

  test("findFirst by id") {
    assert(HtmlLite.text(HtmlLite.findFirst(page, "div", "id", "postingTitle").get)
      == "TITLE Report Ad")
  }

  test("class token match like BeautifulSoup (cat.* matches 'cat first')") {
    val cats = HtmlLite.findAll(
      HtmlLite.findFirst(page, "div", "id", "OtherAdsByThisUser").get,
      "div", "class", "cat.*")
    assert(cats.flatMap(HtmlLite.hrefs) == Seq("http://x/1", "http://x/2"))
  }

  test("findByText for the Location selector") {
    val loc = HtmlLite.findByText(page, "div", "Location:").get
    assert(HtmlLite.text(loc).trim == "Location: Downtown, Eastside")
  }

  test("absent selector yields None / empty") {
    assert(HtmlLite.findFirst(page, "div", "class", "nope").isEmpty)
    assert(HtmlLite.findFirst(null, "div", "class", "x").isEmpty)
    assert(HtmlLite.hrefs(null).isEmpty)
  }
}
