package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole per-document MinHash input — the `perms`-long signature
  * AND the ascending sorted hash-set array the verify join consumes —
  * as ONE scalar kernel over the raw text:
  * `struct<mh: array<long>, hs: array<long>>` (set size = `size(hs)`).
  *
  * Why a scalar and not the aggregate pipeline it replaces
  * (shingles_distinct generator → xxhash64 → repartition(doc_id) →
  * MinHashSig + SortedLongSetAgg + count): every shingle of a document
  * originates in that document's ONE input row, so the per-doc "group"
  * is complete inside the scan task and the exchange existed only to
  * satisfy the aggregate's distribution requirement — 313 MB of
  * (doc_id, h) rows at sf10 (a third of the query's total shuffle)
  * carrying data that never needed to leave its partition. This kernel
  * computes the same three values in the scan projection itself: the
  * signature/set building becomes embarrassingly parallel map work,
  * and the first exchange the query pays is the (band, bucket, doc_id)
  * explode — rows, not corpus content.
  *
  * Bit-compatibility contract (MinHashDocSpec pins all three against
  * the aggregate formulation on real tables):
  *  - shingles: [[ShingleGenerator.tokenize]] + n-token join on ' ',
  *    per-document distinct by STRING, first occurrence wins — the
  *    `shingles_distinct` stream;
  *  - hashes: `xxhash64(shingle)` exactly ([[XXH64.hashUTF8String]]
  *    with Spark's default seed 42 over the shingle's UTF-8 bytes);
  *  - mh: min over the same seeded multiply-shift permutation family
  *    as [[MinHashSig]] (shared [[MinHashSig.coeffs]] — a_i odd ⇒
  *    bijective), element-wise over the per-doc hash stream;
  *  - hs: the hashes sorted ASCENDING, duplicates kept (two distinct
  *    shingles of one doc colliding in 64 bits — the documented
  *    ~(shingles/doc)²/2⁶⁵ class), matching [[SortedLongSetAgg]].
  *
  * A document with fewer than `n` tokens yields empty arrays — the
  * caller filters `size(hs) > 0`, mirroring the aggregate shape where
  * such docs produced no index rows and therefore no group.
  */
case class MinHashDoc(
    child: Expression,
    perms: Int,
    n: Int = 3,
    seed: Long = 0x9e3779b97f4a7c15L)
    extends UnaryExpression {

  require(perms > 0, "perms must be positive")
  require(n >= 1, "shingle width must be >= 1")

  @transient private lazy val coeffs: (Array[Long], Array[Long]) =
    MinHashSig.coeffs(perms, seed)

  override def dataType: DataType = StructType(Seq(
    StructField("mh", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_doc requires a string argument, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashDoc.compute(input.asInstanceOf[UTF8String], n, coeffs._1, coeffs._2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val as = ctx.addReferenceObj("mhdAs", coeffs._1, "long[]")
      val bs = ctx.addReferenceObj("mhdBs", coeffs._2, "long[]")
      s"${ev.value} = graft.functions.MinHashDoc.compute($v, $n, $as, $bs);"
    })

  override def toString: String = s"minhash_doc($child, $perms)"

  override protected def withNewChildInternal(newChild: Expression): MinHashDoc =
    copy(child = newChild)

  override def prettyName: String = "minhash_doc"
}

object MinHashDoc {

  /** The fused pass — static so generated code calls it directly. */
  def compute(s: UTF8String, n: Int, as: Array[Long], bs: Array[Long]): InternalRow = {
    val tokens = ShingleGenerator.tokenize(s.toString)
    val perms = as.length
    val cnt = tokens.length - n + 1
    if (cnt <= 0)
      return InternalRow(
        new GenericArrayData(Array.emptyLongArray), new GenericArrayData(Array.emptyLongArray))
    // distinct-by-string, first occurrence wins — same pre-sizing as
    // the generator (cnt shingles max, never rehash-grows mid-doc)
    val seen = new java.util.HashSet[String](cnt * 4 / 3 + 1)
    val hs = new Array[Long](cnt)
    var m = 0
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < cnt) {
      sb.setLength(0)
      var j = i
      while (j < i + n) {
        if (j > i) sb.append(' ')
        sb.append(tokens(j))
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        hs(m) = XXH64.hashUTF8String(UTF8String.fromString(sh), 42L)
        m += 1
      }
      i += 1
    }
    val mh = Array.fill(perms)(Long.MaxValue)
    var k = 0
    while (k < m) {
      val h = hs(k)
      var p = 0
      while (p < perms) {
        val v = as(p) * h + bs(p)
        if (v < mh(p)) mh(p) = v
        p += 1
      }
      k += 1
    }
    val hsOut = java.util.Arrays.copyOf(hs, m)
    java.util.Arrays.sort(hsOut)
    InternalRow(new GenericArrayData(mh), new GenericArrayData(hsOut))
  }

  /** The kernel as a Column (direct construction, no session registry —
    * same pattern as the other graft kernels).
    */
  def column(text: org.apache.spark.sql.Column, perms: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashDoc(ColumnBridge.expression(text), perms))
  }
}
