package pipeline.expr

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Image codec expressions over the JDK's `javax.imageio` — REAL codecs, no
 * external jar (the "no image libraries in this container" premise holds
 * only for audio/video; PNG/JPEG ship with the JDK). These are the
 * row-level form of pipeline.ops.Multimodal's per-partition decode: use
 * the expressions when the image work is one scalar inside a bigger
 * projection (stays inside whole-stage codegen), the mapPartitions form
 * when a heavyweight decoder needs per-partition lifecycle.
 */
object ImageExprs {

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Deterministic PNG encode: (width, height) → real PNG bytes whose
    * pixels are a pure function of (x, y), so fixtures are bit-stable. */
  def pngEncode(width: Column, height: Column): Column =
    column(PngEncodeExpr(expression(width), expression(height)))

  /** Real header decode: image bytes → struct(width int, height int,
    * format string); null when no JDK reader recognizes the bytes. */
  def imageDims(bytes: Column): Column =
    column(ImageDimsExpr(expression(bytes)))
}

/** (width, height) → deterministic PNG via the JDK encoder. Pixel (x,y) =
  * a fixed RGB mix of the coordinates — no randomness, no timestamps, so
  * the same (w, h) always yields identical bytes within a JDK. */
case class PngEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  def compute(w: Any, h: Any): Any =
    PngEncodeExpr.encode(w.asInstanceOf[Int], h.asInstanceOf[Int])

  override def nullSafeEval(w: Any, h: Any): Any = compute(w, h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => NativeCodegen.callCompute(ctx, ev, this, dataType, s"$a, $b"))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PngEncodeExpr =
    copy(left = l, right = r)
}

object PngEncodeExpr {
  def encode(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14),
      s"png dims out of range: ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x * 31 + y * 7) & 0xff) << 16 | ((x ^ y) & 0xff) << 8 | ((x + y) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // ImageIO.write would route through a disk-backed cache; wrap the
    // stream directly so encode stays pure in-memory on executors
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      val ok = javax.imageio.ImageIO.write(img, "png", ios)
      require(ok, "JDK PNG writer missing")
    } finally ios.close()
    out.toByteArray
  }
}

/** image bytes → struct(width, height, format) via a HEADER-ONLY ImageIO
  * read (reader.getWidth/getHeight never decode pixels); null when no
  * registered reader recognizes the payload. */
case class ImageDimsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))
  override def nullable: Boolean = true

  def compute(input: Any): Any =
    ImageDimsExpr.dims(input.asInstanceOf[Array[Byte]]) match {
      case Some((w, h, fmt)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](w, h, UTF8String.fromString(fmt)))
      case None => null
    }

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): ImageDimsExpr =
    copy(child = c)
}

object ImageDimsExpr {
  /** Header-only dims + format name, or None when unrecognized/corrupt. */
  def dims(bytes: Array[Byte]): Option[(Int, Int, String)] = {
    if (bytes == null || bytes.length == 0) return None
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
        } catch {
          // JDK readers throw unchecked (NegativeArraySize etc.) on crafted
          // headers whose magic they recognized — corrupt payloads must
          // yield None, never kill the task (this guards decodeMeta AND
          // resize's header pre-check)
          case scala.util.control.NonFatal(_) => None
        } finally r.dispose()
      }
    } finally iis.close()
  }
}
