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

  /** 64-bit difference hash (dHash) of an image: decode → 8×9 grayscale
    * area-average grid → bit i = cell(row, col+1) brighter than
    * cell(row, col). Null for unrecognized/corrupt/too-small payloads. */
  def dhash(bytes: Column): Column =
    column(ImageDhashExpr(expression(bytes)))

  /** Deterministic 9×8 grayscale PNG whose dHash is EXACTLY the given
    * 64-bit value (fixture generator for image-dedup oracles/specs). */
  def pngFromDhash(hash: Column): Column =
    column(PngFromBitsExpr(expression(hash)))
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

/** Image bytes → 64-bit dHash (difference hash), the standard perceptual
  * near-dup fingerprint: decode, pool to an 8-row × 9-column grayscale
  * grid by integer area-average, and set bit `i = row*8 + col` iff the
  * cell to the RIGHT is strictly brighter — 64 horizontal-gradient bits.
  * Gradients survive uniform brightness/contrast shifts and resampling,
  * which is what makes hamming distance on this hash a near-dup metric
  * (vs md5, which only finds byte-identical files).
  *
  * Exactness contract (what the oracle leans on): pooling is integer
  * arithmetic — luma = (299r + 587g + 114b) / 1000 per pixel, cell =
  * floor(sum / count) over the rectangle [⌊c·w/9⌋, ⌊(c+1)·w/9⌋) ×
  * [⌊r·h/8⌋, ⌊(r+1)·h/8⌋) — so for a 9×8 input the grid IS the pixel
  * array and [[PngFromBitsExpr]] round-trips bit-for-bit.
  *
  * Null (never an error) when: no JDK reader recognizes the bytes, the
  * decoder throws on a corrupt payload, the image is smaller than the
  * 9×8 grid (nothing to pool), or the header declares more than 64M
  * pixels (decode-bomb guard, same bound as Multimodal.decodeMeta). */
case class ImageDhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  def compute(input: Any): Any =
    ImageDhashExpr.dhash(input.asInstanceOf[Array[Byte]]) match {
      case Some(h) => java.lang.Long.valueOf(h)
      case None => null
    }

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): ImageDhashExpr =
    copy(child = c)
}

object ImageDhashExpr {
  /** Decode bound: ~256 MB ARGB, matching Multimodal's guard. */
  val MaxPixels: Long = 64L * 1024 * 1024

  def dhash(bytes: Array[Byte]): Option[Long] = {
    // header pre-check BEFORE the pixel decode: reject unrecognized
    // payloads and decode bombs without allocating the raster
    val okHeader = ImageDimsExpr.dims(bytes).exists { case (w, h, _) =>
      w >= 9 && h >= 8 && w.toLong * h <= MaxPixels
    }
    if (!okHeader) return None
    val img =
      try javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => return None }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w < 9 || h < 8) return None // header lied; re-check on real raster
    // 8×9 integer area-average grid
    val grid = Array.ofDim[Long](8, 9)
    var r = 0
    while (r < 8) {
      val y0 = r * h / 8
      val y1 = (r + 1) * h / 8
      var c = 0
      while (c < 9) {
        val x0 = c * w / 9
        val x1 = (c + 1) * w / 9
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            x += 1
          }
          y += 1
        }
        grid(r)(c) = sum / ((y1 - y0).toLong * (x1 - x0))
        c += 1
      }
      r += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val row = i / 8
      val colx = i % 8
      if (grid(row)(colx + 1) > grid(row)(colx)) hash |= (1L << i)
      i += 1
    }
    Some(hash)
  }
}

/** 64-bit value → REAL 9×8 grayscale PNG whose [[ImageDhashExpr]] is
  * exactly that value: each row walks left→right from luma 128, stepping
  * +1 where the corresponding hash bit is set ("right cell brighter")
  * and −1 where clear. Because a 9×8 input makes the pooling grid the
  * identity, the decode→pool→compare path recovers every bit — which
  * lets an image-dedup ORACLE derive expected hashes by pure arithmetic
  * while the Spark side still exercises the full PNG encode → javax
  * .imageio decode → pooling pipeline (a stubbed codec cannot pass). */
case class PngFromBitsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  def compute(input: Any): Any =
    PngFromBitsExpr.encode(input.asInstanceOf[Long])

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): PngFromBitsExpr =
    copy(child = c)
}

object PngFromBitsExpr {
  def encode(hash: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var r = 0
    while (r < 8) {
      var v = 128
      img.setRGB(0, r, v << 16 | v << 8 | v)
      var c = 0
      while (c < 8) {
        v += (if (((hash >>> (r * 8 + c)) & 1L) == 1L) 1 else -1)
        img.setRGB(c + 1, r, v << 16 | v << 8 | v)
        c += 1
      }
      r += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    try {
      val ok = javax.imageio.ImageIO.write(img, "png", ios)
      require(ok, "JDK PNG writer missing")
    } finally ios.close()
    out.toByteArray
  }
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
