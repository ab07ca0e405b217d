package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Lowercase-hex MD5 as a native Catalyst expression with a PER-THREAD
 * reusable `MessageDigest` — bit-identical to Spark's `md5` (and to
 * DuckDB's, which every md5-based oracle relies on), minus the
 * per-row provider lookup.
 *
 * Why not the builtin: Spark's `Md5` delegates to commons-codec
 * `DigestUtils.md5Hex`, which calls `MessageDigest.getInstance` per
 * ROW — a `java.security` provider-table lookup that contends across
 * executor threads, the same pathology as the `aes_encrypt` per-row
 * `Cipher.getInstance` ([[AesGcm]]). Measured on dsir_sample's
 * per-NGRAM md5 at 32 threads (TimeOne, sf0.1): summed task time
 * flips bimodally between ~15 s and ~100 s run-to-run with identical
 * work — the slow mode is threads convoying on the provider lookup —
 * while at 8 threads the slow mode disappears. One digest per thread
 * (reset per row) removes the shared lookup entirely.
 */
object Md5Fast {
  /** Drop-in for `org.apache.spark.sql.functions.md5(c)` over string
    * input: same lowercase-hex output, per-thread digest kernel. */
  def md5_fast(c: Column): Column =
    ColumnBridge.column(Md5FastExpr(ColumnBridge.expression(c)))

  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private val Hex = "0123456789abcdef".getBytes("US-ASCII")

  /** Lowercase-hex md5 of `bytes` on the calling thread's own digest —
    * the per-row kernel, also called from generated code. */
  def hex(bytes: Array[Byte]): UTF8String = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** `md5(string)` with the [[Md5Fast]] per-thread kernel; codegen stays
  * inside whole-stage (one static call, no fallback). */
case class Md5FastExpr(child: Expression) extends UnaryExpression {
  // string-input only by construction (every call site passes a string
  // column); no coercion layer needed
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_md5 needs a string input, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_md5"

  override def nullSafeEval(input: Any): Any =
    Md5Fast.hex(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Fast.hex($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5FastExpr =
    copy(child = newChild)
}
