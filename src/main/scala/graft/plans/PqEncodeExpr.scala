package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization encode (Jégou et al. 2011) as a native Catalyst
  * expression: per subspace, the argmin codeword index against a literal
  * codebook.
  *
  * Why custom (SURVEY §7.3 said "only if measured"): the declarative
  * form unrolls m·c·sub subtract-square terms — 1024 expression nodes
  * per row at the q93/q122 geometry — which bloats whole-stage codegen
  * (multi-second first-rep compiles in the bench) and still evaluates
  * every term through the expression interpreter when the generated
  * class overflows. This runs the identical arithmetic as one tight
  * primitive loop: per (subspace, codeword) the squared distance
  * accumulates in ascending dimension order — the exact left-to-right
  * fold of the unrolled `reduce(_ + _)` — and ties keep the LOWEST
  * codeword (strict `<`), matching `array_position(d, array_min(d))`.
  * Bit-identical codes ⇒ the q93/q122 DuckDB oracles are unchanged.
  *
  * @param codebook flat [code j][global dim i] = codebook(j * dim + i),
  *                 dim = m * sub
  */
case class PqEncodeExpr(child: Expression, codebook: Array[Double],
    m: Int, sub: Int, c: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires ARRAY<DOUBLE>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    PqEncodeExpr.encode(input.asInstanceOf[ArrayData], codebook, m, sub, c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.plans.PqEncodeExpr.encode($in, $cbRef, $m, $sub, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_encode"
}

object PqEncodeExpr {

  /** Shared by interpreted eval and generated code. */
  def encode(v: ArrayData, cb: Array[Double], m: Int, sub: Int, c: Int): ArrayData = {
    val dim = m * sub
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < c) {
        var d = 0.0
        var kk = 0
        while (kk < sub) {
          val i = mm * sub + kk
          val diff = v.getDouble(i) - cb(j * dim + i)
          d += diff * diff
          kk += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new GenericArrayData(codes)
  }

  /** @param cbRows (code j, global dim i) → codeword component */
  def pqEncode(v: Column, cbRows: Map[(Int, Int), Double],
      m: Int, sub: Int, c: Int): Column = {
    val dim = m * sub
    val flat = new Array[Double](c * dim)
    for (((j, i), x) <- cbRows) flat(j * dim + i) = x
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(v), flat, m, sub, c))
  }
}
