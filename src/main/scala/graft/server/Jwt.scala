package graft.server

import java.security.{KeyPair, KeyPairGenerator, Signature}
import java.util.Base64

/** Minimal RS512 JWT (header.payload.signature, base64url) — the
  * reference authenticates with an RS512-signed JWT for the root user
  * (reference: handlers/AuthenticateHandler.go:28-110,
  * handlers/BaseHandler.go:61-93). Pure-JDK RSA; no external deps.
  */
final class Jwt(keys: KeyPair) {

  private val enc = Base64.getUrlEncoder.withoutPadding()
  private val dec = Base64.getUrlDecoder

  private def b64(s: Array[Byte]): String = enc.encodeToString(s)

  def sign(subject: String, ttlSeconds: Long = 3600,
           nowSeconds: Long = System.currentTimeMillis() / 1000): String = {
    val header = """{"alg":"RS512","typ":"JWT"}"""
    // JSON-escape the subject: today's only subject is the constant "root",
    // but a raw interpolation would let a future caller inject payload claims
    val sub = graft.io.TextFormats.toJson(subject)
    val payload = s"""{"sub":$sub,"iat":$nowSeconds,"exp":${nowSeconds + ttlSeconds}}"""
    val signingInput = b64(header.getBytes("UTF-8")) + "." + b64(payload.getBytes("UTF-8"))
    val sig = Signature.getInstance("SHA512withRSA")
    sig.initSign(keys.getPrivate)
    sig.update(signingInput.getBytes("UTF-8"))
    signingInput + "." + b64(sig.sign())
  }

  /** Returns the subject when the token verifies and is unexpired. */
  def verify(token: String,
             nowSeconds: Long = System.currentTimeMillis() / 1000): Option[String] = {
    token.split('.') match {
      case Array(h, p, s) =>
        val sig = Signature.getInstance("SHA512withRSA")
        sig.initVerify(keys.getPublic)
        sig.update((h + "." + p).getBytes("UTF-8"))
        val ok = try sig.verify(dec.decode(s)) catch { case _: Exception => false }
        if (!ok) None
        else {
          val payload = new String(dec.decode(p), "UTF-8")
          val sub = """"sub"\s*:\s*"([^"]*)"""".r.findFirstMatchIn(payload).map(_.group(1))
          val exp = """"exp"\s*:\s*(\d+)""".r.findFirstMatchIn(payload).map(_.group(1).toLong)
          if (exp.exists(_ >= nowSeconds)) sub else None
        }
      case _ => None
    }
  }
}

object Jwt {
  def generate(): Jwt = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    new Jwt(kpg.generateKeyPair())
  }
}
