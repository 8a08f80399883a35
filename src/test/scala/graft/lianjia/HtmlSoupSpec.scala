package graft.lianjia

import javax.xml.parsers.DocumentBuilderFactory
import org.scalatest.funsuite.AnyFunSuite

/** HtmlSoup is a pure function: every output must parse under the SAME
  * strict, hardened XML configuration XPathStructExpr uses. */
class HtmlSoupSpec extends AnyFunSuite {

  private def parse(xml: String) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    f.newDocumentBuilder().parse(
      new org.xml.sax.InputSource(new java.io.StringReader(xml)))
  }

  private def cleanParses(html: String): org.w3c.dom.Document =
    parse(HtmlSoup.clean(html))

  test("well-formed fragment passes through with content intact") {
    val doc = cleanParses("""<div class="a"><span>hi</span></div>""")
    assert(doc.getElementsByTagName("span").item(0).getTextContent === "hi")
  }

  test("void tags and unclosed containers are repaired") {
    val doc = cleanParses(
      """<ul><li>one<br><li>two<img src="x.png"><li>three &mdash; tail""")
    val lis = doc.getElementsByTagName("li")
    assert(lis.getLength === 3)
    assert(lis.item(0).getTextContent === "one")
    assert(lis.item(2).getTextContent === "three — tail")
  }

  test("bare ampersands, HTML entities, and stray angle brackets") {
    val doc = cleanParses("<p>Tom & Jerry &nbsp;&copy; a<b if 1<2</p>")
    val t = doc.getElementsByTagName("p").item(0).getTextContent
    assert(t.contains("Tom & Jerry"))
    assert(t.contains("©"))
    // numeric and XML-predefined entities survive as escapes
    val d2 = cleanParses("<p>&#65;&amp;&lt;</p>")
    assert(d2.getElementsByTagName("p").item(0).getTextContent === "A&<")
  }

  test("stray close tags dropped; overlap closes at implicit boundary") {
    val doc = cleanParses("<div>x</span></div></div>")
    assert(doc.getElementsByTagName("div").getLength === 1)
  }

  test("script/style bodies with markup-breaking chars survive as text") {
    val doc = cleanParses(
      "<div><script>if (a < b && c) { url = \"/x?a=1&b=2\"; }</script><p>after</p></div>")
    assert(doc.getElementsByTagName("p").item(0).getTextContent === "after")
    assert(doc.getElementsByTagName("script").item(0).getTextContent.contains("a < b && c"))
  }

  test("attributes: unquoted, bare, duplicated, and illegal names") {
    val doc = cleanParses(
      """<input type=checkbox checked class=big class=small 2bad=x data-n="5">""")
    val el = doc.getElementsByTagName("input").item(0).asInstanceOf[org.w3c.dom.Element]
    assert(el.getAttribute("type") === "checkbox")
    assert(el.getAttribute("checked") === "checked")
    assert(el.getAttribute("class") === "big") // first wins
    assert(el.getAttribute("data-n") === "5")
    assert(!el.hasAttribute("2bad"))
  }

  test("doctype, comments, CDATA, and multi-root soup") {
    val doc = cleanParses(
      """<!DOCTYPE html><!-- c --><p>one</p><![CDATA[x < y]]><p>two</p>""")
    assert(doc.getElementsByTagName("p").getLength === 2)
  }

  test("fuzz: clean() of arbitrary markup soup always parses as XML") {
    // deterministic pseudo-random soup from markup-ish fragments — the
    // property is total: whatever a crawler fetches, the repair pass
    // must yield a parseable document (worst case: all text)
    val frags = Array(
      "<div>", "</div>", "<li>", "</li>", "<p class=", "x\">", "'y'>",
      "<br>", "<img src=foo>", "&", "&amp;", "&nbsp;", "&#65;", "&bogus;",
      "<", ">", "</", "<!--", "-->", "<!DOCTYPE html>", "<![CDATA[", "]]>",
      "<script>", "</script>", "a<b", "q=\"r\"", "text 文本 ", "<3 ", "=",
      "<span", " id=1 id=2>", "</wrong>", "<a href='u'>", "")
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { i =>
      val soup = Seq.fill(rnd.nextInt(40) + 1)(frags(rnd.nextInt(frags.length))).mkString
      val doc = try cleanParses(soup) catch {
        case e: Exception => fail(s"iteration $i failed on soup:\n$soup\n${e.getMessage}")
      }
      assert(doc != null)
    }
  }

  test("the reference page shapes: label-sibling li rows in tag soup") {
    // lianjia.py:131-153 extracts li[span=...] — real pages leave li open
    val doc = cleanParses(
      """<div class=base><div class=content><ul>
        |<li><span>房屋户型</span>3室2厅
        |<li><span>建筑面积</span>142.3㎡
        |</ul></div></div>""".stripMargin)
    assert(doc.getElementsByTagName("li").getLength === 2)
  }
}
