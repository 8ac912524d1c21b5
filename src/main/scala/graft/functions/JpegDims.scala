package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native JPEG dimension extraction: a JFIF segment walk to the first
  * SOF marker — `[width, height]`, or null for anything that is not a
  * well-formed JPEG prefix. This is container-HEADER parsing, not codec
  * work: every segment carries a 2-byte big-endian length, so the walk
  * skips APPn/quantization/comment segments deterministically until a
  * frame header (SOFn) exposes the pixel dimensions. Null on any
  * malformation (misaligned marker, truncated segment) — never garbage.
  *
  * The walk is variable-length, so unlike PNG/GIF/BMP it cannot be a
  * fixed-offset column formula; it generates as a static call around a
  * tight byte loop and stays inside whole-stage codegen.
  */
case class JpegDimsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    JpegDimsExpr.dims(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = JpegDimsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = ($helper).dims($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JpegDimsExpr =
    copy(child = newChild)

  override def prettyName: String = "jpeg_dims"
}

object JpegDimsExpr {

  /** `[width, height]` from the first SOF segment, or null. */
  def dims(bytes: Array[Byte]): ArrayData = {
    if (bytes == null || bytes.length < 4) return null
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 3 < bytes.length) {
      if ((bytes(i) & 0xFF) != 0xFF) return null // marker misalignment
      val marker = bytes(i + 1) & 0xFF
      // standalone markers (no length field): TEM, RSTn, repeated SOI
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) {
        i += 2
      } else {
        val len = ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
        if (len < 2) return null
        // SOF0-15 minus DHT(C4)/JPG(C8)/DAC(CC) carry frame dimensions
        if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
          if (i + 9 > bytes.length || len < 7) return null
          val h = ((bytes(i + 5) & 0xFF) << 8) | (bytes(i + 6) & 0xFF)
          val w = ((bytes(i + 7) & 0xFF) << 8) | (bytes(i + 8) & 0xFF)
          return new GenericArrayData(Array(w, h))
        }
        i += 2 + len
      }
    }
    null
  }
}
