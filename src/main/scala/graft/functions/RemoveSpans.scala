package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document span-removal kernel for
  * [[graft.operators.Dedup.dedupSpans]] (r13): from a document's raw
  * token array and the ASCENDING-sorted start positions of its
  * non-canonical duplicated k-windows, emit
  * `struct<clean_text: string, n_kept: long, n_removed: long>` — the
  * tokens NOT covered by any `[s, s+k-1]` span, rejoined with single
  * spaces, in one O(tokens + starts) interval-union merge walk.
  *
  * This replaces the former reassembly tail, which exploded every
  * corpus token into a `(doc_id, tpos, tok)` row, anti-joined the
  * covered-position set, and re-aggregated the WHOLE corpus text
  * through a `groupBy(doc_id)` exchange (plus a per-group
  * `array_sort(collect_list(struct))`) just to rebuild strings the
  * checkpointed token frame already held. With the kernel, the only
  * data the tail shuffles is the non-canonical window START set —
  * 12-byte `(doc_id, pos)` rows, k× fewer than the expanded covered
  * positions it previously moved — and the corpus text never crosses
  * an exchange after the window build.
  *
  * Caller contracts (the operator guarantees both; violations produce
  * silently wrong spans, which DedupSpansRandomSpec's scalar-replica
  * parity would catch): `starts` is sorted ASCENDING (duplicates are
  * harmless — same interval twice), and every start is a valid window
  * position in THIS document (0 ≤ s ≤ |toks| − k). A document with no
  * duplicated spans passes `array()` and round-trips exactly
  * (single-space join of a single-space split, empties kept).
  *
  * CodegenFallback is deliberate: the expression runs once per
  * DOCUMENT (not per pair or per token), so the per-row boxed eval is
  * noise next to the per-token walk it performs — the same
  * adjudication as [[TokenWindows]].
  */
case class RemoveSpans(toks: Expression, starts: Expression, k: Int)
    extends BinaryExpression with CodegenFallback {

  require(k >= 1, s"window width must be >= 1, got $k")

  override def left: Expression = toks
  override def right: Expression = starts

  override def dataType: DataType = RemoveSpans.schema

  override def checkInputDataTypes(): TypeCheckResult =
    (toks.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<int>), got $l and $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val t = a.asInstanceOf[ArrayData]
    val s = b.asInstanceOf[ArrayData]
    val n = t.numElements()
    val m = s.numElements()
    val kept = new Array[UTF8String](n)
    var nKept = 0
    var i = 0
    var j = 0
    var maxEnd = -1L // rightmost covered position among spans starting <= i
    while (i < n) {
      while (j < m && s.getInt(j) <= i) {
        // starts sorted ascending => s + k - 1 is monotone; plain
        // assignment suffices
        maxEnd = s.getInt(j).toLong + (k - 1)
        j += 1
      }
      if (i > maxEnd) {
        kept(nKept) = t.getUTF8String(i)
        nKept += 1
      }
      i += 1
    }
    val text = UTF8String.concatWs(RemoveSpans.sep, java.util.Arrays.copyOf(kept, nKept): _*)
    InternalRow(text, nKept.toLong, (n - nKept).toLong)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RemoveSpans =
    copy(toks = newLeft, starts = newRight)

  override def prettyName: String = "remove_spans"
}

object RemoveSpans {
  val schema: StructType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_kept", LongType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  private val sep: UTF8String = UTF8String.fromString(" ")

  /** The expression as a Column — direct construction, no session
    * registry (same pattern as the other graft kernels).
    */
  def column(toks: Column, starts: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      RemoveSpans(ColumnBridge.expression(toks), ColumnBridge.expression(starts), k))
  }
}
