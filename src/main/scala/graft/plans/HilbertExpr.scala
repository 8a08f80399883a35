package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Hilbert-curve index of a 2-D point as a native Catalyst expression —
  * the locality-better sibling of [[graft.operators.ZOrder]]'s Morton
  * interleave (Hilbert 1891; the curve Delta/Iceberg adopted after
  * Z-order because it has no Morton "seams": consecutive curve
  * positions are ALWAYS grid neighbors, so per-file min/max ranges stay
  * tighter under range predicates).
  *
  * Why a custom expression (SURVEY §7.3): the standard xy→d algorithm
  * is an 8-iteration loop with data-dependent rotation state. Declared
  * as nested `when()` columns the rotation makes the expression tree
  * multiply ~4× per bit level (4⁸ ≈ 65k nodes — unusable); as a native
  * expression it is a 10-line loop inside whole-stage codegen. The
  * relational twin unrolls the same loop as a CTE chain carrying (x, y,
  * d) state — mechanical, and hash-verified by the driver gate.
  *
  * Uses the low [[HilbertExpr.Bits]] bits of each input (the ZOrder
  * contract); inputs are masked, never rejected.
  */
case class HilbertExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  private val integral: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (integral(left.dataType) && integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index requires integral inputs, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def nullSafeEval(a: Any, b: Any): Any = {
    def toLong(v: Any): Long = v match {
      case i: java.lang.Integer => i.longValue()
      case l: java.lang.Long => l
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
    }
    HilbertExpr.index(toLong(a), toLong(b))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.HilbertExpr.index((long) $a, (long) $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert_index"
}

object HilbertExpr {

  /** Bits per dimension: a 256×256 grid, 16-bit curve index. */
  val Bits: Int = 8

  /** The classic iterative xy→d conversion (public-domain algorithm;
    * see e.g. Hamilton 2006 tech report CS-2006-07): walk bit levels
    * high→low, add the quadrant's curve offset, rotate/reflect the
    * coordinate frame. Shared by interpreted eval and codegen. */
  def index(x0: Long, y0: Long): Long = {
    val mask = (1L << Bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the frame so the sub-square's curve starts bottom-left
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertIndex(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertExpr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
