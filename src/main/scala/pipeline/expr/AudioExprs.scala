package pipeline.expr

import java.io.ByteArrayInputStream

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Audio codec expressions over the JDK's `javax.sound.sampled` — REAL
 * codecs, no external jar (the "no audio libraries in this container"
 * premise holds only for compressed formats; WAV/AIFF/AU header parsing
 * and PCM WAV writing ship with every JDK — the same situation as
 * javax.imageio for PNG/JPEG, pipeline.expr.ImageExprs). Compressed audio
 * (mp3/ogg/aac) and all video remain documented stubs in
 * pipeline.ops.Multimodal.Codecs.
 */
object AudioExprs {

  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Deterministic 16-bit PCM WAV encode: (sampleRate, channels, frames) →
    * real RIFF/WAVE bytes whose samples are a pure function of (frame,
    * channel) — bit-stable fixtures, like [[ImageExprs.pngEncode]]. */
  def wavEncode(sampleRate: Column, channels: Column, frames: Column): Column =
    column(WavEncodeExpr(expression(sampleRate.cast("int")),
      expression(channels.cast("int")), expression(frames.cast("int"))))

  /** Real header decode: audio bytes → struct(sample_rate int, channels
    * int, frames long, format string); null when no JDK reader recognizes
    * the bytes (corrupt/compressed payloads — deadletter material). */
  def wavHeader(bytes: Column): Column =
    column(WavHeaderExpr(expression(bytes.cast("binary"))))
}

/** (sampleRate, channels, frames) → deterministic PCM WAV via the JDK
  * encoder. Sample (frame i, channel c) = a fixed integer mix of (i, c) —
  * no randomness, no timestamps. */
case class WavEncodeExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BinaryType

  def compute(r: Any, c: Any, f: Any): Any = WavEncodeExpr.encode(
    r.asInstanceOf[Int], c.asInstanceOf[Int], f.asInstanceOf[Int])

  override def nullSafeEval(r: Any, c: Any, f: Any): Any = compute(r, c, f)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b, c) => NativeCodegen.callCompute(ctx, ev, this, dataType, s"$a, $b, $c"))
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WavEncodeExpr =
    copy(first = f, second = s, third = t)
}

object WavEncodeExpr {
  def encode(sampleRate: Int, channels: Int, frames: Int): Array[Byte] = {
    require(sampleRate >= 1000 && sampleRate <= 192000, s"bad rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channels $channels")
    require(frames >= 0 && frames <= (1 << 22), s"bad frames $frames")
    val pcm = new Array[Byte](frames * channels * 2)
    var i = 0
    while (i < frames) {
      var c = 0
      while (c < channels) {
        // deterministic 16-bit sample: odd-multiplier integer mix of (i, c)
        val s = (((i * 2654435761L + c * 40503L) & 0xffffL) - 32768L).toShort
        val off = (i * channels + c) * 2
        pcm(off) = (s & 0xff).toByte // little-endian PCM
        pcm(off + 1) = ((s >> 8) & 0xff).toByte
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /*signed=*/ true, /*bigEndian=*/ false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, frames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    finally ais.close()
    out.toByteArray
  }
}

/** audio bytes → struct(sample_rate, channels, frames, format) via a
  * HEADER-ONLY `AudioSystem.getAudioFileFormat` read (never decodes
  * samples); null when no registered reader recognizes the payload. */
case class WavHeaderExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("format", StringType, nullable = false)))
  override def nullable: Boolean = true

  def compute(input: Any): Any =
    WavHeaderExpr.header(input.asInstanceOf[Array[Byte]]) match {
      case Some((rate, ch, frames, fmt)) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](rate, ch, frames, UTF8String.fromString(fmt)))
      case None => null
    }

  override def nullSafeEval(input: Any): Any = compute(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => NativeCodegen.callCompute(ctx, ev, this, dataType, c))
  override protected def withNewChildInternal(c: Expression): WavHeaderExpr =
    copy(child = c)
}

object WavHeaderExpr {
  /** Header fields (rate, channels, frames, lowercase type), or None when
    * unrecognized/corrupt — the ImageDimsExpr contract. */
  def header(bytes: Array[Byte]): Option[(Int, Int, Long, String)] = {
    if (bytes == null || bytes.length == 0) return None
    try {
      // ByteArrayInputStream supports mark/reset, which getAudioFileFormat
      // requires; the call parses headers only, never sample data
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      val f = aff.getFormat
      Some((math.round(f.getSampleRate), f.getChannels,
        aff.getFrameLength.toLong, aff.getType.getExtension.toLowerCase))
    } catch {
      // UnsupportedAudioFileException on unknown magic; JDK parsers can
      // also throw unchecked on crafted headers — corrupt payloads must
      // yield None, never kill the task
      case scala.util.control.NonFatal(_) => None
    }
  }
}
