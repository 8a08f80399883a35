package graft.lianjia

import scala.collection.mutable

/** Tag-soup HTML → well-formed XML normalizer (SURVEY §2.2 P1/P2 parity:
  * the reference's parsel/lxml tolerates broken real-world markup —
  * house_spider/spiders/lianjia.py:77-88,131-153 run against live pages
  * with unclosed <li>, bare &, void tags, HTML entities). The engine's
  * XPath extraction rides a strict XML DocumentBuilder, so this pass
  * repairs the input instead: a single-scan state machine, no
  * dependencies (the build is offline), deterministic output.
  *
  * Repairs:
  *  - void tags (<br>, <img …>) → self-closed
  *  - unclosed container tags → closed at the HTML implicit-close
  *    boundaries (<li> closes the previous <li>, <p> a <p>, <td>/<tr>
  *    table cells) and at end of input
  *  - stray close tags (</div> with no open <div>) → dropped
  *  - bare '&' and stray '<'/'>' in text and attributes → escaped
  *  - HTML named entities (&nbsp; …) → literal chars (XML only defines
  *    the 5 predefined ones; unknown names degrade to literal "&name;")
  *  - <script>/<style> bodies → XML-escaped text (they may contain '<')
  *  - comments, DOCTYPE, processing instructions, CDATA → dropped or
  *    unwrapped; control chars illegal in XML 1.0 → stripped
  *  - attributes: re-quoted, duplicates dropped, bare flags expanded
  *    (checked → checked="checked"), malformed names dropped
  *  - everything wrapped in a synthetic <root> so multi-rooted soup
  *    still yields one document (all extraction XPaths are '//'-rooted)
  */
object HtmlSoup {

  private val Void = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")

  /** opening `key` implicitly closes any of `values` currently on top of
    * the stack — the HTML5 "a new li ends the previous li" rules for the
    * structures the extraction XPaths rely on. */
  private val ImplicitClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"),
    "p" -> Set("p"),
    "td" -> Set("td", "th"),
    "th" -> Set("td", "th"),
    "tr" -> Set("tr", "td", "th"),
    "option" -> Set("option"),
    "dt" -> Set("dd", "dt"),
    "dd" -> Set("dd", "dt"))

  /** Common HTML named entities → literal characters. */
  private val NamedEntities = Map(
    "nbsp" -> " ", "middot" -> "·", "copy" -> "©",
    "reg" -> "®", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "ldquo" -> "“", "rdquo" -> "”",
    "lsquo" -> "‘", "rsquo" -> "’", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "yen" -> "¥",
    "deg" -> "°", "plusmn" -> "±", "sup2" -> "²",
    "frac12" -> "½", "iquest" -> "¿")

  private val XmlEntities = Set("amp", "lt", "gt", "quot", "apos")

  private def isNameStart(c: Char) = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char) =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'
  private def legalXmlChar(c: Char) =
    c == '\t' || c == '\n' || c == '\r' || (c >= ' ' && c != '￾' && c != '￿')

  def clean(html: String): String = {
    val n = html.length
    val out = new StringBuilder(n + (n >> 3) + 16)
    val stack = mutable.Stack[String]()
    out.append("<root>")

    def emitClose(): Unit = out.append("</").append(stack.pop()).append('>')

    /** Escape a text run for XML: entities resolved, specials escaped,
      * illegal chars dropped. Used for text nodes AND attribute values
      * (quote char escaped there via &quot;). */
    def emitText(s: String, from: Int, until: Int): Unit = {
      var i = from
      while (i < until) {
        val c = s.charAt(i)
        c match {
          case '<' => out.append("&lt;"); i += 1
          case '>' => out.append("&gt;"); i += 1
          case '"' => out.append("&quot;"); i += 1
          case '&' =>
            // &name; / &#123; / &#x1F; — resolve or keep; bare & → &amp;
            val semi = s.indexOf(';', i + 1)
            if (semi > i && semi - i <= 10) {
              val body = s.substring(i + 1, semi)
              if (XmlEntities(body)) { out.append('&').append(body).append(';'); i = semi + 1 }
              else if (body.startsWith("#") && body.length > 1 &&
                  body.drop(1).forall(_.isDigit)) {
                out.append('&').append(body).append(';'); i = semi + 1
              } else if ((body.startsWith("#x") || body.startsWith("#X")) &&
                  body.length > 2 &&
                  body.drop(2).forall(ch => Character.digit(ch, 16) >= 0)) {
                out.append('&').append(body).append(';'); i = semi + 1
              } else NamedEntities.get(body.toLowerCase) match {
                case Some(lit) => out.append(lit); i = semi + 1
                case None => out.append("&amp;"); i += 1
              }
            } else { out.append("&amp;"); i += 1 }
          case c if legalXmlChar(c) => out.append(c); i += 1
          case _ => i += 1 // strip control chars
        }
      }
    }

    /** Parse the inside of an open tag starting after the name; returns
      * (endIndexAfterGt, selfClosed). Emits re-quoted attributes. */
    def emitAttrs(i0: Int): (Int, Boolean) = {
      var i = i0
      val seen = mutable.Set[String]()
      var selfClosed = false
      var done = false
      while (!done && i < n) {
        val c = html.charAt(i)
        if (c == '>') { i += 1; done = true }
        else if (c == '/' && i + 1 < n && html.charAt(i + 1) == '>') {
          selfClosed = true; i += 2; done = true
        } else if (c.isWhitespace || c == '/') i += 1
        else {
          // attribute name
          val ns = i
          while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val rawName = html.substring(ns, i)
          val name = rawName.toLowerCase
          var value: Option[(Int, Int)] = None // substring bounds
          // optional = value
          var j = i
          while (j < n && html.charAt(j).isWhitespace) j += 1
          if (j < n && html.charAt(j) == '=') {
            j += 1
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
              val q = html.charAt(j)
              val vs = j + 1
              var k = vs
              while (k < n && html.charAt(k) != q) k += 1
              value = Some((vs, k))
              i = math.min(n, k + 1)
            } else {
              val vs = j
              var k = vs
              while (k < n && !html.charAt(k).isWhitespace &&
                html.charAt(k) != '>' && html.charAt(k) != '/') k += 1
              value = Some((vs, k))
              i = k
            }
          }
          val valid = name.nonEmpty && isNameStart(name.charAt(0)) &&
            name.forall(ch => isNameChar(ch) || ch == '.')
          if (valid && !seen(name)) {
            seen += name
            out.append(' ').append(name).append("=\"")
            value match {
              case Some((vs, ve)) => emitText(html, vs, ve)
              case None => out.append(name) // bare flag → checked="checked"
            }
            out.append('"')
          }
        }
      }
      (i, selfClosed)
    }

    def openTag(name: String, selfClosed: Boolean): Unit = {
      // (the "<name" and attributes were already emitted by the caller;
      //  implicit closes were emitted BEFORE that — see the main loop)
      if (selfClosed || Void(name)) out.append("/>")
      else { out.append('>'); stack.push(name) }
    }

    def closeTag(name: String): Unit = {
      if (!Void(name) && stack.contains(name)) {
        while (stack.top != name) emitClose()
        emitClose()
      } // else: stray close → drop
    }

    /** <script>/<style> body: raw until the matching close tag, emitted
      * as escaped text (may contain '<', '&&', etc.). */
    def rawContent(i0: Int, name: String): Int = {
      val lower = html.toLowerCase
      val close = lower.indexOf("</" + name, i0)
      val end = if (close < 0) n else close
      emitText(html, i0, end)
      if (close < 0) { closeTag(name); n }
      else {
        val gt = html.indexOf('>', close)
        closeTag(name)
        if (gt < 0) n else gt + 1
      }
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val e = html.indexOf("]]>", i + 9)
          val end = if (e < 0) n else e
          emitText(html, i + 9, end)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else if (html.startsWith("</", i) && i + 2 < n && isNameStart(html.charAt(i + 2))) {
          var j = i + 2
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = html.substring(i + 2, j).toLowerCase
          val gt = html.indexOf('>', j)
          closeTag(name)
          i = if (gt < 0) n else gt + 1
        } else if (i + 1 < n && isNameStart(html.charAt(i + 1))) {
          var j = i + 1
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          ImplicitClose.get(name).foreach { closers =>
            while (stack.nonEmpty && closers(stack.top)) emitClose()
          }
          out.append('<').append(name)
          val (after, selfClosed) = emitAttrs(j)
          openTag(name, selfClosed)
          i = after
          if (!selfClosed && (name == "script" || name == "style"))
            i = rawContent(i, name)
        } else {
          emitText(html, i, i + 1) // lone '<' → &lt;
          i += 1
        }
      } else {
        var j = i
        while (j < n && html.charAt(j) != '<') j += 1
        emitText(html, i, j)
        i = j
      }
    }
    while (stack.nonEmpty) emitClose()
    out.append("</root>")
    out.toString
  }
}
