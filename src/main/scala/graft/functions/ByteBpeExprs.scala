package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The GPT-2 byte↔unicode bijection (Radford et al. 2019; the
  * `bytes_to_unicode` construction from the public GPT-2 release):
  * every one of the 256 byte values maps to a DISTINCT printable BMP
  * code point — bytes that already print ('!'..'~', '¡'..'¬', '®'..'ÿ')
  * map to themselves, the other 68 (controls, space, DEL, soft hyphen…)
  * shift up to 256+n. Byte-level BPE runs its merge alphabet over these
  * mapped characters, which makes every symbol a plain string (so the
  * whole word-table/merge machinery is shared with character BPE) while
  * keeping the byte stream losslessly recoverable. Notably the space
  * byte 0x20 maps AWAY from ' ' (to U+0120 'Ġ'), so space-joined piece
  * renderings are unambiguous. */
object ByteCodec {
  /** byte value (0..255) → mapped code point, as 1-char strings. */
  val byteToStr: Array[String] = {
    val self = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val arr = new Array[String](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (self(b)) arr(b) = b.toChar.toString
      else { arr(b) = (256 + n).toChar.toString; n += 1 }
      b += 1
    }
    arr
  }

  /** mapped code point → byte value, or -1 for chars outside the table. */
  private val charToByte: Array[Int] = {
    val arr = Array.fill(324)(-1) // max mapped cp = 256 + 67 = 323
    var b = 0
    while (b < 256) { arr(byteToStr(b).charAt(0).toInt) = b; b += 1 }
    arr
  }

  /** UTF-8 bytes of `s`, each mapped to its table character. */
  def map(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToStr(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  /** Inverse of [[map]]; null when `s` contains a char outside the
    * 324-entry table (i.e. not a [[map]] output). */
  def unmap(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      if (c >= 324) return null
      val b = charToByte(c)
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }
}

/** `byte_map(s)` — [[ByteCodec.map]] as a codegen'd native expression:
  * the byte-level-BPE pre-pass that turns a raw string into its mapped
  * byte-character rendering. Row-local, no shuffle. */
case class ByteMap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "byte_map"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_map needs string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(ByteCodec.map(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  graft.functions.ByteCodec.map($a.toString()));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `byte_unmap(s)` — [[ByteCodec.unmap]]: mapped byte-characters back to
  * the UTF-8 string they encode. NULL for strings that are not a
  * [[ByteMap]] image (a char outside the 256-entry table). */
case class ByteUnmap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_unmap"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_unmap needs string, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = ByteCodec.unmap(input.asInstanceOf[UTF8String].toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("unmapped")
      s"""
         |String $r = graft.functions.ByteCodec.unmap($a.toString());
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  org.apache.spark.unsafe.types.UTF8String.fromString($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteBpeF {
  def byteMap(s: Column): Column = Bridge.column(ByteMap(Bridge.expression(s)))
  def byteUnmap(s: Column): Column = Bridge.column(ByteUnmap(Bridge.expression(s)))
}
