package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static digest helper callable from generated Java (plain `object` →
  * static forwarders on the `Hash61Util` class).
  */
object Hash61Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) as a non-negative long — numerically equal
    * to `CAST(CONV(SUBSTRING(MD5(x), 1, 15), 16, 10) AS BIGINT)`: 15 hex
    * chars = bytes 0-6 big-endian, then the high nibble of byte 7.
    */
  def hash(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 7) {
      acc = (acc << 8) | (d(i) & 0xffL)
      i += 1
    }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** Native 60-bit portable md5 hash of a string column (codegen'd
  * replacement for the `conv(substring(md5(c), 1, 15), 16, 10)` chain,
  * which materializes a 32-char hex string, copies a substring and parses
  * it back per evaluation — measured hot in shingle hashing). Value is
  * identical, so the DuckDB oracle
  * (`CAST(('0x'||substr(md5(x),1,15)) AS UBIGINT)`) is unchanged.
  */
case class Hash61F(child: Expression)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash61"

  override protected def nullSafeEval(input: Any): Any =
    Hash61Util.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graft.Hash61Util.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
