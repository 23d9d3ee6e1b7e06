package pipeline.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Video container header expressions via a pure-byte ISO-BMFF (MP4) box
 * walk — REAL header parsing with zero codec libraries, the same
 * "not actually environment-blocked" move as ImageExprs (r2) and
 * AudioExprs (r4): `moov/mvhd` carries timescale+duration and `trak/tkhd`
 * carries width/height as plain big-endian box arithmetic (ISO/IEC
 * 14496-12 box layout). FRAME DECODE stays a documented stub in
 * pipeline.ops.Multimodal — pixel data needs a real codec; the container
 * header does not.
 *
 * Reference behavior: reveald treats media payloads as opaque bytes;
 * header metadata extraction is our training-data-pipeline extension
 * (multimodal corpus curation needs duration/dims without decoding).
 */
object Mp4Exprs {

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Deterministic minimal-MP4 encode: (timescale, durationTicks, width,
    * height) → real ftyp+moov(mvhd+trak(tkhd))+mdat bytes — bit-stable
    * fixtures, the [[AudioExprs.wavEncode]] pattern. */
  def mp4Encode(timescale: Column, durationTicks: Column,
                width: Column, height: Column): Column =
    column(Mp4EncodeExpr(expression(timescale.cast("int")),
      expression(durationTicks.cast("long")),
      expression(width.cast("int")), expression(height.cast("int"))))

  /** Real container-header decode: mp4 bytes → struct(brand string,
    * timescale int, duration bigint, width int, height int); null when the
    * bytes are not a well-formed ISO-BMFF file with an mvhd (corrupt /
    * non-MP4 payloads — deadletter material). */
  def mp4Header(bytes: Column): Column =
    column(Mp4HeaderExpr(expression(bytes.cast("binary"))))
}

/** (timescale, durationTicks, width, height) → deterministic minimal MP4.
  * All times zero (no wall clock), matrix identity, one video track. */
case class Mp4EncodeExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def dataType: DataType = BinaryType

  def compute(ts: Any, dur: Any, w: Any, h: Any): Any = Mp4EncodeExpr.encode(
    ts.asInstanceOf[Int], dur.asInstanceOf[Long],
    w.asInstanceOf[Int], h.asInstanceOf[Int])

  override def nullSafeEval(ts: Any, dur: Any, w: Any, h: Any): Any =
    compute(ts, dur, w, h)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b, c, d) => NativeCodegen.callCompute(ctx, ev, this, dataType, s"$a, $b, $c, $d"))
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Mp4EncodeExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object Mp4EncodeExpr {

  private def be32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def tag(out: java.io.ByteArrayOutputStream, t: String): Unit =
    out.write(t.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
  private def box(t: String)(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    body(b)
    val out = new java.io.ByteArrayOutputStream()
    be32(out, 8L + b.size()); tag(out, t); b.writeTo(out)
    out.toByteArray
  }

  /** ISO/IEC 14496-12 identity matrix: 0x10000, 0, 0 / 0, 0x10000, 0 /
    * 0, 0, 0x40000000 (16.16 / 2.30 fixed point). */
  private def matrix(out: java.io.ByteArrayOutputStream): Unit = {
    val m = Seq(0x10000L, 0L, 0L, 0L, 0x10000L, 0L, 0L, 0L, 0x40000000L)
    m.foreach(be32(out, _))
  }

  def encode(timescale: Int, durationTicks: Long, width: Int, height: Int): Array[Byte] = {
    require(timescale >= 1 && timescale <= 1000000, s"bad timescale $timescale")
    require(durationTicks >= 0 && durationTicks <= 0xffffffffL, s"bad duration $durationTicks")
    require(width >= 1 && width <= 32767 && height >= 1 && height <= 32767,
      s"bad dims ${width}x$height")
    val ftyp = box("ftyp") { b =>
      tag(b, "isom"); be32(b, 0x200L); tag(b, "isom"); tag(b, "mp42")
    }
    val mvhd = box("mvhd") { b =>
      be32(b, 0L)                      // version 0 + flags
      be32(b, 0L); be32(b, 0L)         // creation/modification: fixed zero
      be32(b, timescale.toLong)
      be32(b, durationTicks)
      be32(b, 0x10000L)                // rate 1.0
      b.write(0x01); b.write(0x00)     // volume 1.0
      b.write(new Array[Byte](10))     // reserved
      matrix(b)
      b.write(new Array[Byte](24))     // pre_defined
      be32(b, 2L)                      // next_track_ID
    }
    val tkhd = box("tkhd") { b =>
      be32(b, 7L)                      // version 0, flags: enabled|in-movie|in-preview
      be32(b, 0L); be32(b, 0L)         // creation/modification
      be32(b, 1L)                      // track_ID
      be32(b, 0L)                      // reserved
      be32(b, durationTicks)           // duration (movie timescale)
      b.write(new Array[Byte](8))      // reserved
      b.write(new Array[Byte](2))      // layer
      b.write(new Array[Byte](2))      // alternate_group
      b.write(new Array[Byte](2))      // volume (0 for video)
      b.write(new Array[Byte](2))      // reserved
      matrix(b)
      be32(b, width.toLong << 16)      // 16.16 fixed
      be32(b, height.toLong << 16)
    }
    val trak = box("trak")(b => b.write(tkhd))
    val moov = box("moov") { b => b.write(mvhd); b.write(trak) }
    val mdat = box("mdat") { b =>
      // deterministic 16-byte payload (a real file would carry samples)
      var i = 0
      while (i < 16) { b.write((i * 37 + 11) & 0xff); i += 1 }
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }
}

/** mp4 bytes → struct(brand, timescale, duration, width, height) via a
  * bounds-checked ISO-BMFF box walk; null on anything malformed. */
case class Mp4HeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true

  def compute(input: Any): Any =
    Mp4HeaderExpr.header(input.asInstanceOf[Array[Byte]]) match {
      case Some((brand, ts, dur, w, h)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(brand), ts, dur, w, h))
      case None => null
    }

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): Mp4HeaderExpr =
    copy(child = c)
}

object Mp4HeaderExpr {

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** One box at `off` within [off, end): returns (type, payloadStart,
    * payloadEnd, nextBoxOff), or None when the header is malformed or the
    * declared size escapes the enclosing range. */
  private def readBox(b: Array[Byte], off: Int, end: Int): Option[(String, Int, Int, Int)] = {
    if (off + 8 > end) return None
    val size32 = u32(b, off)
    val typ = fourcc(b, off + 4)
    // size 1 = 64-bit largesize follows; size 0 = box runs to container end
    val (payloadStart, boxEnd) =
      if (size32 == 1L) {
        if (off + 16 > end) return None
        val large = u64(b, off + 8)
        if (large < 16 || large > (end - off).toLong) return None
        (off + 16, off + large.toInt)
      } else if (size32 == 0L) (off + 8, end)
      else {
        if (size32 < 8 || size32 > (end - off).toLong) return None
        (off + 8, off + size32.toInt)
      }
    Some((typ, payloadStart, boxEnd, boxEnd))
  }

  private def findBox(b: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] = {
    var off = start
    while (off < end) {
      readBox(b, off, end) match {
        case Some((t, ps, pe, next)) =>
          if (t == typ) return Some((ps, pe))
          if (next <= off) return None // no progress → malformed
          off = next
        case None => return None
      }
    }
    None
  }

  /** (brand, timescale, durationTicks, width, height), or None. A file
    * with no video trak parses with width=height=0 (audio-only MP4s are
    * legal); no ftyp or no mvhd → None. */
  def header(bytes: Array[Byte]): Option[(String, Int, Long, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    val end = bytes.length
    val brand = findBox(bytes, 0, end, "ftyp") match {
      case Some((ps, pe)) if pe - ps >= 8 => fourcc(bytes, ps)
      case _ => return None
    }
    val (moovS, moovE) = findBox(bytes, 0, end, "moov").getOrElse(return None)
    val (ts, dur) = findBox(bytes, moovS, moovE, "mvhd") match {
      case Some((ps, pe)) =>
        if (pe - ps < 4) return None
        val version = bytes(ps) & 0xff
        if (version == 0) {
          if (pe - ps < 20) return None
          (u32(bytes, ps + 12), u32(bytes, ps + 16))
        } else if (version == 1) {
          if (pe - ps < 32) return None
          (u32(bytes, ps + 20), u64(bytes, ps + 24))
        } else return None
      case None => return None
    }
    if (ts <= 0 || ts > Int.MaxValue || dur < 0) return None
    // first trak with a tkhd; width/height are 16.16 fixed point
    var (w, h) = (0, 0)
    var off = moovS
    var scanning = true
    while (scanning && off < moovE) {
      readBox(bytes, off, moovE) match {
        case Some(("trak", ps, pe, next)) =>
          findBox(bytes, ps, pe, "tkhd").foreach { case (ts2, te2) =>
            val version = if (te2 - ts2 >= 1) bytes(ts2) & 0xff else -1
            // v0: 4+4+4+4+4+4=24 to post-duration; dims at payload end-8
            val need = if (version == 0) 84 else if (version == 1) 96 else -1
            if (need > 0 && te2 - ts2 >= need) {
              val wRaw = u32(bytes, te2 - 8)
              val hRaw = u32(bytes, te2 - 4)
              val wi = (wRaw >> 16).toInt
              val hi = (hRaw >> 16).toInt
              if (wi > 0 && hi > 0 && w == 0) { w = wi; h = hi; scanning = false }
            }
          }
          off = next
        case Some((_, _, _, next)) if next > off => off = next
        case _ => scanning = false
      }
    }
    Some((brand, ts.toInt, dur, w, h))
  }
}
