package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Static helper callable from generated Java. */
object MinhashSigUtil {
  /** k-permutation minhash signature of a hashed-shingle array:
    * `sig[i] = min over h of (a[i] * (h mod p) + b[i]) mod p`, with `p` as
    * the sentinel for empty inputs. Single pass over the array — the
    * signature never leaves the row, so LSH banding needs no explode and no
    * shuffle.
    */
  def sig(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, p)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val hm = arr.getLong(j) % p
      var i = 0
      while (i < k) {
        val v = (a(i) * hm + b(i)) % p
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native minhash signature over a hashed-shingle `array<long>` column.
  *
  * Codegen'd replacement for both earlier formulations: the per-permutation
  * HOF `array_min(transform(...))` (interpreted, k passes) and the
  * explode → k partial min-aggs plan (codegen but costs a row explosion and
  * a shuffle). Identical arithmetic — `(a_i * (h mod p) + b_i) mod p`,
  * sentinel `p` on empty — so the DuckDB oracle replay is unchanged.
  */
case class MinhashSigF(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression
    with ExpectsInputTypes {
  require(a.length == b.length, "a and b must be the same length")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override protected def nullSafeEval(input: Any): Any =
    MinhashSigUtil.sig(input.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graft.MinhashSigUtil.sig($c, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
