package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper callable from generated Java. */
object NfcUtil {
  /** Unicode NFC (canonical composition) of a UTF8String. The common fast
    * path — already-NFC text, i.e. virtually all web text — is a single
    * `isNormalized` scan with NO allocation; only decomposed input pays
    * the normalize + re-encode cost.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else
      UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Native Unicode NFC normalization of a string column (Spark has no
  * built-in; a Scala UDF would break whole-stage codegen and pay
  * serialization per row). Canonical composition only — NFC, not NFKC —
  * matching DuckDB's `nfc_normalize`, which is the correctness oracle:
  * both implement Unicode canonical composition, so results agree
  * byte-for-byte on well-formed text.
  */
case class NfcNormalizeF(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
