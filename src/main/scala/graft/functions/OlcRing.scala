package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 3×3 neighbor ring of an OLC cell — the cell's own code plus its up
  * to 8 same-length neighbors (deduplicated; polar cells repeat codes and
  * drop the ring rows beyond the pole). This is the explode key of every
  * tile-bucketed distance join (reference semantics: the 150 m / 100 m
  * proximity groupings of OprHistoryChangesProvider.java:185-209 and
  * MergePlaceBot.java:169-182 must see across cell borders).
  *
  * A native expression (not a UDF) so [[graft.plans.HaversineJoinRule]]
  * can synthesize it inside a logical plan without a deserialization
  * round-trip per row.
  */
case class OlcRing(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"olc_ring expects a string code, got ${child.dataType.sql}")

  override def nullSafeEval(code: Any): Any =
    OlcRing.ring(code.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, code =>
      s"${ev.value} = graft.functions.OlcRing$$.MODULE$$.ring($code);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OlcRing {
  /** Row-local kernel: code → deduplicated [code, neighbors...]. */
  def ring(code: UTF8String): ArrayData = {
    val c = code.toString
    val cells = (c +: graft.geo.Olc.neighbors(c)).distinct
    new GenericArrayData(cells.map(UTF8String.fromString).toArray[Any])
  }

  val info = new ExpressionInfo(classOf[OlcRing].getName, "olc_ring")

  /** Idempotently register `olc_ring` with a session. */
  def register(spark: SparkSession): Unit = {
    val name = FunctionIdentifier("olc_ring")
    if (!spark.sessionState.functionRegistry.functionExists(name)) {
      spark.sessionState.functionRegistry.registerFunction(
        name, info, (exprs: Seq[Expression]) => OlcRing(exprs.head))
    }
  }
}
