package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** `image_hash64(payload)` — a 64-bit perceptual image hash (dHash /
  * aHash / DCT pHash, see [[graft.llm.Multimodal]]) as ONE codegen'd
  * native expression over a binary column: decode + downscale + hash
  * per row, NULL for undecodable bytes. Native (not mapPartitions) so
  * the hash composes inside whole-stage codegen — the streaming ingest
  * filter probes it row-locally, and the batch [[graft.llm.Multimodal
  * .imageHashes]] pass stays one fused projection. */
case class ImageHash64(child: Expression, method: String)
    extends UnaryExpression {
  require(ImageHashOps.methods(method),
    s"image_hash64: unknown method $method")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_hash64 needs binary, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    ImageHashOps.hash(input.asInstanceOf[Array[Byte]], method)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("imageHashMethod", method,
      classOf[String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("sig")
      s"""
         |java.lang.Long $r = graft.functions.ImageHashOps.hash($a, $m);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageHashOps {
  val methods: Set[String] = Set("dhash", "ahash", "phash")

  /** Boxed so codegen can carry the undecodable-payload NULL. */
  def hash(payload: Array[Byte], method: String): java.lang.Long = {
    val bits = method match {
      case "dhash" => graft.llm.Multimodal.dHashBits(payload)
      case "ahash" => graft.llm.Multimodal.aHashBits(payload)
      case _       => graft.llm.Multimodal.pHashBits(payload)
    }
    bits.map(java.lang.Long.valueOf).orNull
  }
}

object ImageHashF {
  def imageHash64(payload: Column, method: String = "dhash"): Column =
    Bridge.column(ImageHash64(Bridge.expression(payload), method))
}
