package graft.lianjia

/** CSS selector → XPath translator for the selector subset the reference
  * actually uses (every `sel.css(...)` in house_spider/spiders/lianjia.py:
  * 32,40,48,53,63,77-88,105,109,113,127-130):
  *
  *  - type, `*`, `.class`, `#id` and compounds (`a.info`, `div.x.y`)
  *  - attribute tests `[attr]`, `[attr='v']`, `[attr="v"]`
  *  - structural `:first-child`, `:nth-child(n)`
  *  - descendant (space) and child (`>`) combinators
  *  - pseudo-elements `::text` and `::attr(name)` as the result form
  *
  * This is the same translation parsel/cssselect performs before
  * evaluating — classes become the standard token-in-@class XPath test,
  * so class ORDER inside the attribute doesn't matter, exactly like CSS.
  * Unsupported syntax throws at plan construction (fail fast at the
  * driver, not per-row at executors).
  */
object Css {

  private val Simple =
    """(\*|[a-zA-Z][\w-]*)?((?:\.[\w-]+|#[\w-]+|\[[^\]]+\]|:first-child|:nth-child\(\d+\))*)""".r
  private val Part = """\.[\w-]+|#[\w-]+|\[[^\]]+\]|:first-child|:nth-child\((\d+)\)""".r
  private val AttrEq = """([\w-]+)\s*=\s*(?:'([^']*)'|"([^"]*)"|([^'"\s]+))""".r

  /** `.resultDes .total span::text` becomes a descendant chain of
    * star-elements with token-in-@class tests ending in `span/text()`. */
  def toXPath(selector: String): String = {
    val sel = selector.trim
    val (selPart, suffix) = {
      val attrIdx = sel.indexOf("::attr(")
      if (attrIdx >= 0) {
        require(sel.endsWith(")"), s"malformed ::attr in: $selector")
        (sel.substring(0, attrIdx), "/@" + sel.substring(attrIdx + 7, sel.length - 1))
      } else if (sel.endsWith("::text")) (sel.dropRight(6), "/text()")
      else (sel, "")
    }
    val tokens = selPart.trim.split("\\s+").filter(_.nonEmpty)
    require(tokens.nonEmpty, s"empty selector: $selector")
    val sb = new StringBuilder
    var axis = "//"
    tokens.foreach {
      case ">" => axis = "/"
      case t => sb.append(axis).append(simple(t, selector)); axis = "//"
    }
    sb.toString + suffix
  }

  private def simple(token: String, whole: String): String = token match {
    case Simple(tagOpt, rest) if (tagOpt != null && tagOpt.nonEmpty) || rest.nonEmpty =>
      val tag = Option(tagOpt).filter(_.nonEmpty).getOrElse("*")
      val preds = Part.findAllMatchIn(if (rest == null) "" else rest).map { m =>
        val p = m.matched
        if (p.startsWith("."))
          s"contains(concat(' ',normalize-space(@class),' '),' ${p.drop(1)} ')"
        else if (p.startsWith("#")) s"@id='${p.drop(1)}'"
        else if (p == ":first-child") "not(preceding-sibling::*)"
        else if (p.startsWith(":nth-child")) {
          val k = m.group(1).toInt
          require(k >= 1, s"nth-child($k) in: $whole")
          s"count(preceding-sibling::*)=${k - 1}"
        } else { // [attr] / [attr='v']
          val body = p.substring(1, p.length - 1).trim
          AttrEq.findFirstMatchIn(body) match {
            case Some(a) =>
              val v = Seq(a.group(2), a.group(3), a.group(4)).find(_ != null).getOrElse("")
              s"@${a.group(1)}='$v'"
            case None =>
              require(body.matches("[\\w-]+"), s"unsupported attribute test [$body] in: $whole")
              s"@$body"
          }
        }
      }.toSeq
      tag + preds.map(p => s"[$p]").mkString
    case _ =>
      throw new IllegalArgumentException(s"unsupported CSS token '$token' in: $whole")
  }
}
