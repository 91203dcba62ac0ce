package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/** Reinterprets a TIMESTAMP_NTZ wall clock as the identical UTC instant
  * (TIMESTAMP), with zero arithmetic: both types carry the same physical
  * representation — microseconds since the epoch of the wall-clock
  * rendering — so "wall clock read as UTC" is a pure type change over an
  * unchanged Long.
  *
  * Exists because every built-in route is session-zone-dependent and
  * therefore IMPURE for this purpose: `cast(ts AS timestamp)` interprets
  * the wall clock in the session zone, and `to_utc_timestamp(ntz, "UTC")`
  * implicitly performs that same session-zone cast before its (then
  * no-op) shift — measured −9 h under an Asia/Tokyo session
  * (SourceFormatsSpec). The zone-function composition that cancels the
  * session cast (`from_utc_timestamp(cast, current_timezone())`) breaks
  * at DST boundaries, where the cast's offset is looked up at the wall
  * time but the correction's at the instant. A reinterpret has no zone
  * lookup to get wrong, stays inside whole-stage codegen, and makes the
  * intended semantics — "this file's NTZ micros ARE UTC micros" — the
  * entire implementation.
  */
case class NtzAsUtcInstant(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TimestampType

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ntz_as_utc_instant requires a timestamp_ntz argument, got ${child.dataType}")
  }

  override protected def nullSafeEval(input: Any): Any = input

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): NtzAsUtcInstant =
    copy(child = newChild)

  override def prettyName: String = "ntz_as_utc_instant"
}

object NtzAsUtcInstant {
  def column(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(NtzAsUtcInstant(ColumnBridge.expression(c)))
  }
}
