package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GetStructField}

/** Session-extension entry point — the idiomatic way to ship a Spark
  * library's functions to a cluster without any driver-side code:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * Every native expression (and the plan-time CSS/XPath extraction
  * surface) becomes callable from pure SQL on every session the cluster
  * builds. `GraftSession.registerFunctions` applies the same registry to
  * an already-running session (e.g. notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}

object GraftExtensions {

  /** The selector/xpath argument must be a literal: the expression is
    * compiled once at plan time (Css.toXPath + XPath.compile), not per
    * row. A non-foldable argument is a planning error, surfaced here. */
  private def literalString(e: Expression, fn: String): String = {
    require(e.foldable, s"$fn requires a literal string argument")
    String.valueOf(e.eval())
  }

  /** Winnow window geometry must be literal: w/k shape the generated
    * code, they are not per-row data. */
  private def literalInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn requires a literal integer argument")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** name → expression builder, shared by the extension injection and
    * GraftSession.registerFunctions. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_simhash64" ->
      ((exprs: Seq[Expression]) => graft.plans.SimHash64Expr(exprs.head)),
    "graft_cosine_sim" ->
      ((exprs: Seq[Expression]) => graft.plans.CosineSimExpr(exprs.head, exprs(1))),
    "graft_xpath_first" ->
      ((exprs: Seq[Expression]) => GetStructField(
        graft.plans.XPathStructExpr(exprs.head,
          Seq("v" -> literalString(exprs(1), "graft_xpath_first"))), 0, Some("v"))),
    "graft_xpath_all" ->
      ((exprs: Seq[Expression]) => graft.plans.XPathArrayExpr(exprs.head,
        literalString(exprs(1), "graft_xpath_all"))),
    "graft_css_first" ->
      ((exprs: Seq[Expression]) => GetStructField(
        graft.plans.XPathStructExpr(exprs.head,
          Seq("v" -> graft.lianjia.Css.toXPath(
            literalString(exprs(1), "graft_css_first")))), 0, Some("v"))),
    "graft_css_all" ->
      ((exprs: Seq[Expression]) => graft.plans.XPathArrayExpr(exprs.head,
        graft.lianjia.Css.toXPath(literalString(exprs(1), "graft_css_all")))),
    "graft_winnow" ->
      ((exprs: Seq[Expression]) => graft.plans.WinnowExpr(exprs.head,
        literalInt(exprs(1), "graft_winnow"), literalInt(exprs(2), "graft_winnow"))),
    "graft_hilbert" ->
      ((exprs: Seq[Expression]) => graft.plans.HilbertExpr(exprs.head, exprs(1))))
}
