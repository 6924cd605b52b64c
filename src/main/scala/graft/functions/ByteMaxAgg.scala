package graft.functions

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, BitwiseAnd, BitwiseNot, BitwiseOr, Coalesce,
  EvalMode, Expression, Literal, ShiftRightUnsigned, Subtract}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Lane-wise MAX over the 8 unsigned bytes of a LongType column — the
  * merge aggregate for byte-packed register vectors (q255 HyperBall
  * packs 64 HLL registers, each ≤ 55 < 2^7, into 8 longs of 8 byte
  * lanes; 8 `bytemax` aggregates replace 64 per-register `max`
  * aggregates, shrinking the shuffled state row 8x and the generated
  * aggregate class with it).
  *
  * SWAR, branch-free, and codegen'd through the ordinary expression
  * compiler because it is a [[DeclarativeAggregate]] over plain
  * arithmetic (update and merge are the same lane-max):
  *
  *   m    = ((a | H) - b) & H          H = 0x8080…80: per-lane flag,
  *                                     set iff lane(a) >= lane(b) —
  *                                     (a|H) makes every lane ≥ 0x80 >
  *                                     any 7-bit lane of b, so borrows
  *                                     never cross lanes
  *   mask = (m - (m >>> 7)) | m        0xFF per winning lane, 0x00 else
  *                                     (overflow-free; the multiply-
  *                                     by-255 form of this trick wraps
  *                                     past Long.Max when all lanes win)
  *   out  = (a & mask) | (b & ~mask)
  *
  * CONTRACT: lanes must stay ≤ 0x7F (high bit clear) — true for HLL
  * rho values by construction. Lane values with the high bit set would
  * break the borrow containment.
  */
case class ByteMaxAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bytemax requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "bytemax"

  private lazy val buf =
    AttributeReference("bytemax", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))

  private def laneMax(a: Expression, b: Expression): Expression = {
    val h = Literal(0x8080808080808080L)
    // LEGACY (wrapping) subtraction, NOT the session default: SWAR is
    // defined over arithmetic mod 2^64 — (a|H) - b routinely crosses
    // Long.MIN as a signed 64-bit op (the borrow into bit 63 IS lane
    // 7's flag), and under the ANSI default Subtract raises
    // ARITHMETIC_OVERFLOW on exactly the inputs the trick needs.
    val m = BitwiseAnd(
      Subtract(BitwiseOr(a, h), b, EvalMode.LEGACY), h)
    val mask = BitwiseOr(
      Subtract(m, ShiftRightUnsigned(m, Literal(7)), EvalMode.LEGACY), m)
    BitwiseOr(BitwiseAnd(a, mask), BitwiseAnd(b, BitwiseNot(mask)))
  }

  override lazy val updateExpressions: Seq[Expression] =
    Seq(laneMax(buf, Coalesce(Seq(child, Literal(0L)))))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(laneMax(buf.left, buf.right))
  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(
      newChild: Expression): ByteMaxAgg = copy(child = newChild)
}
