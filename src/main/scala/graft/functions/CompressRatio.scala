package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a string: compressed_bytes /
  * raw_bytes. A standard corpus-quality signal — highly repetitive
  * or templated text compresses far below ~0.4, random noise sits
  * near 1.0; both tails are usually dropped before training.
  * Deterministic (fixed level, no dictionary), evaluated per row in
  * one pass — no UDF registry, no serialization.
  */
case class CompressRatio(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compress_ratio"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 1.0
    else {
      val deflater = new java.util.zip.Deflater(6, false)
      deflater.setInput(bytes)
      deflater.finish()
      val out = new Array[Byte](8192)
      var total = 0
      while (!deflater.finished()) total += deflater.deflate(out)
      deflater.end()
      total.toDouble / bytes.length
    }
  }

  override protected def withNewChildInternal(c: Expression): CompressRatio = copy(child = c)
}

object CompressRatio {
  def compressRatio(c: Column): Column =
    GraftBridge.column(CompressRatio(GraftBridge.expression(c)))
}
