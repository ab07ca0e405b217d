package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}

import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/**
 * AES-GCM payload crypto as native Catalyst expressions — the message
 * crypto kernel behind [[graft.operators.Produce.encryptValue]]
 * (reference MessageCrypto, SURVEY §2.2).
 *
 * Why not Spark's built-in `aes_encrypt`: its implementation calls
 * `Cipher.getInstance` per ROW — a JCE provider lookup that contends
 * across executor threads. Measured on this workload (TimeOne,
 * crypto_roundtrip): per-row task time ROSE ~6× going from a
 * single-task 1× scan to 32 concurrent tasks at 10× data (0.6 s →
 * 36 s summed task time for 10× rows) — a superlinear stage in a
 * linear kernel, which is exactly what a 1000-executor cluster cannot
 * ship. This kernel holds ONE `Cipher` per thread (ThreadLocal) and
 * re-`init`s it per row, eliminating the shared lookup entirely.
 *
 * IV discipline (GCM's one hard requirement is IV uniqueness per key):
 * each THREAD draws 12 random bytes from its own `SecureRandom` at
 * first use — a 4-byte fixed field plus an 8-byte counter whose
 * STARTING VALUE is also random — and increments the counter per row.
 * Two IV sequences (any two threads, any two JVMs, any two restarts)
 * collide only if their 32-bit fixed fields match AND their 64-bit
 * counter windows overlap: ~2n/2^96 per pair for n rows per thread,
 * vs the 2^-32 a per-JVM fixed field alone would give across a
 * 1000-executor fleet (where pairwise 2^-32 odds accumulate to
 * near-certainty over a year of restarts). Per-row cost is one long
 * increment on thread-local state — no cross-thread CAS at all. The
 * IV is PREPENDED to the ciphertext, Spark's own GCM layout, so
 * `aes_decrypt` reads this output and [[AesGcmDecryptExpr]] reads
 * `aes_encrypt`'s.
 */
object AesGcm {
  def aes_gcm_encrypt(value: Column, key: Column): Column =
    ColumnBridge.column(AesGcmEncryptExpr(
      ColumnBridge.expression(value), ColumnBridge.expression(key)))
  def aes_gcm_decrypt(value: Column, key: Column): Column =
    ColumnBridge.column(AesGcmDecryptExpr(
      ColumnBridge.expression(value), ColumnBridge.expression(key)))

  private val ciphers: ThreadLocal[Cipher] =
    ThreadLocal.withInitial(() => Cipher.getInstance("AES/GCM/NoPadding"))

  /** Per-thread IV state: 96 random bits at init, low 64 increment per row. */
  private final class IvState {
    private val rng = new java.security.SecureRandom()
    val fixedField: Int = rng.nextInt()
    var counter: Long = rng.nextLong()
  }
  private val ivState: ThreadLocal[IvState] =
    ThreadLocal.withInitial(() => new IvState)

  private def nextIv(): Array[Byte] = {
    val st = ivState.get()
    val iv = new Array[Byte](12)
    val c = st.counter
    st.counter = c + 1
    iv(0) = (st.fixedField >>> 24).toByte
    iv(1) = (st.fixedField >>> 16).toByte
    iv(2) = (st.fixedField >>> 8).toByte
    iv(3) = st.fixedField.toByte
    var i = 0
    while (i < 8) { iv(4 + i) = (c >>> (56 - 8 * i)).toByte; i += 1 }
    iv
  }

  /** Test seam: the calling thread's next IV without encrypting. */
  private[graft] def peekIv(): Array[Byte] = {
    val st = ivState.get()
    val saved = st.counter
    val iv = nextIv()
    ivState.get().counter = saved
    iv
  }

  private[graft] def encrypt(v: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val cipher = ciphers.get()
    val iv = nextIv()
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, iv))
    val ct = cipher.doFinal(v)
    val out = new Array[Byte](12 + ct.length)
    System.arraycopy(iv, 0, out, 0, 12)
    System.arraycopy(ct, 0, out, 12, ct.length)
    out
  }

  private[functions] def decrypt(v: Array[Byte], key: Array[Byte]): Array[Byte] = {
    require(v.length > 12, s"GCM ciphertext too short (${v.length} bytes)")
    val cipher = ciphers.get()
    cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, v, 0, 12))
    cipher.doFinal(v, 12, v.length - 12)
  }
}

case class AesGcmEncryptExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any, k: Any): Any =
    AesGcm.encrypt(v.asInstanceOf[Array[Byte]], keyBytes(k))
  private def keyBytes(k: Any): Array[Byte] = k match {
    case b: Array[Byte] => b
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "aes_gcm_encrypt"
}

case class AesGcmDecryptExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override protected def nullSafeEval(v: Any, k: Any): Any =
    AesGcm.decrypt(v.asInstanceOf[Array[Byte]], keyBytes(k))
  private def keyBytes(k: Any): Array[Byte] = k match {
    case b: Array[Byte] => b
    case s: org.apache.spark.unsafe.types.UTF8String => s.getBytes
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "aes_gcm_decrypt"
}
