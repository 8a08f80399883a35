package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MOSS winnowing (Schleimer et al. 2003) over a normalized string as a
  * native Catalyst expression: w-char gram hashes, k-window minima,
  * per-document distinct — one tight loop per row.
  *
  * Why custom (SURVEY §7.3 said "only if measured"): the declarative
  * formulation needs TWO higher-order `transform`s per row (one md5 per
  * character position, then `array_min(slice(...))` per window — O(n·k)
  * interpreted element copies); both run outside whole-stage codegen.
  * This expression keeps the identical fingerprint VALUES — md5 over the
  * UTF-8 bytes of each `substringSQL(i, w)`, top 60 bits, exactly
  * `conv(substring(md5(substr(norm, i, w)), 1, 15), 16, 10)` — so q44's
  * DuckDB oracle is unchanged, while the window minima drop to O(n) via
  * a monotonic deque and nothing is interpreted per element. Bench at
  * sf0.1 (q44): 3.2 s → see COVERAGE round-5 notes.
  */
case class WinnowExpr(child: Expression, w: Int, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow requires STRING, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.fingerprints(input.asInstanceOf[UTF8String], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowExpr.fingerprints($c, $w, $k)")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowExpr {

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code. Returns the DISTINCT
    * k-window gram-hash minima in first-occurrence order — the same
    * multiset `array_distinct(transform(seq, j => array_min(slice(gh, j,
    * k))))` produces (min is a value, so tie-handling cannot differ). */
  def fingerprints(norm: UTF8String, w: Int, k: Int): ArrayData = {
    val npos = norm.numChars() - (w - 1)
    if (npos < k) return new GenericArrayData(Array.empty[Long])
    val md = Md5.get()
    val gh = new Array[Long](npos)
    var i = 0
    while (i < npos) {
      md.reset()
      // substringSQL is 1-based and code-point-aware — the exact
      // semantics of the SQL substr() the declarative form hashed
      val d = md.digest(norm.substringSQL(i + 1, w).getBytes)
      // first 15 hex digits of the digest = top 60 bits
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      gh(i) = v >>> 4
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](npos)
    var head = 0
    var tail = 0
    var j = 0
    while (j < npos) {
      while (tail > head && gh(deque(tail - 1)) >= gh(j)) tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - k) head += 1
      if (j >= k - 1) out.add(gh(deque(head)))
      j += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { res(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(res)
  }

  def winnow(norm: Column, w: Int, k: Int): Column =
    ColumnBridge.column(WinnowExpr(ColumnBridge.expression(norm), w, k))
}
