package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper callable from generated Java. */
object DeflateSizeUtil {
  /** DEFLATE-compressed byte count of the UTF-8 bytes at the given level.
    * Deterministic for a fixed zlib implementation + level (the JDK
    * bundles its own zlib, so results are stable across this JVM fleet) —
    * but NOT portable to other engines, which is why the op is spec-
    * verified rather than DuckDB-gated.
    */
  def size(s: UTF8String, level: Int): Long = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(level, /*nowrap=*/ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** Compressed-size expression for the gzip-compressibility quality signal
  * (highly compressible text = repetitive boilerplate; incompressible =
  * random noise/binary — both tails get filtered in Gopher-style quality
  * suites). Codegen'd; one Deflater per evaluation, ended deterministically.
  */
case class DeflateSizeF(child: Expression, level: Int)
    extends UnaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSizeUtil.size(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(
      ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"org.apache.spark.sql.graft.DeflateSizeUtil.size($c, $level)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
