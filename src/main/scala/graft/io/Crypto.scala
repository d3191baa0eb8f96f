package graft.io

import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{IvParameterSpec, PBEKeySpec, SecretKeySpec}
import java.security.SecureRandom

/** Whole-stream encryption for `.enc` inputs/outputs.
  *
  * Cipher matches the reference: AES-256-CFB with a random IV prepended to
  * the ciphertext (reference: util/DecryptBytes.go:16-40,
  * util/CreateCipher.go:19-33). KDF substitution: the reference derives the
  * key with argon2id; no argon2 implementation exists in the JDK or on the
  * offline classpath, so the key here is PBKDF2-HMAC-SHA256 (600k
  * iterations). Same interface and stream format, DIFFERENT key derivation
  * — ciphertexts are NOT interchangeable with the reference's.
  */
object Crypto {

  private val Iterations = 600000
  private val KeyBits = 256
  private val IvLen = 16

  def deriveKey(passphrase: String, salt: String): SecretKeySpec = {
    val skf = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val spec = new PBEKeySpec(passphrase.toCharArray,
      salt.getBytes("UTF-8"), Iterations, KeyBits)
    new SecretKeySpec(skf.generateSecret(spec).getEncoded, "AES")
  }

  /** IV (16 bytes) ++ AES-256-CFB ciphertext. */
  def encrypt(plaintext: Array[Byte], passphrase: String, salt: String): Array[Byte] = {
    val iv = new Array[Byte](IvLen)
    new SecureRandom().nextBytes(iv)
    val c = Cipher.getInstance("AES/CFB/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, deriveKey(passphrase, salt), new IvParameterSpec(iv))
    iv ++ c.doFinal(plaintext)
  }

  def decrypt(data: Array[Byte], passphrase: String, salt: String): Array[Byte] = {
    require(data.length >= IvLen, "ciphertext too short")
    val iv = new IvParameterSpec(data.take(IvLen))
    val c = Cipher.getInstance("AES/CFB/NoPadding")
    c.init(Cipher.DECRYPT_MODE, deriveKey(passphrase, salt), iv)
    c.doFinal(data.drop(IvLen))
  }
}

/** COLUMN-level protection via Spark's native `aes_encrypt`/`aes_decrypt`
  * expressions — the distributed, codegen-resident path for shipping a
  * dataset with its PII columns sealed while everything else stays
  * queryable (the whole-stream [[Crypto]] seals the FILE; this seals a
  * column). Two modes:
  *  - `GCM` (default): authenticated, random IV per value — the secure
  *    choice; ciphertexts differ across runs, so protected values are
  *    NOT joinable or comparable.
  *  - `ECB`: DETERMINISTIC — equal plaintexts seal to equal tokens, so
  *    protected columns still group/join (pseudonymization). The classic
  *    ECB caveat applies (equality leaks); that leak IS the feature
  *    here, use GCM when it isn't.
  * Key: 16/24/32-byte string (AES-128/192/256). The protected column is
  * base64 text, NULL-safe. */
object ColumnCrypto {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  private def keyOk(key: String): Unit =
    require(Set(16, 24, 32)(key.getBytes("UTF-8").length),
      "ColumnCrypto: key must be 16/24/32 bytes")

  def protect(c: Column, key: String, mode: String = "GCM"): Column = {
    keyOk(key)
    base64(aes_encrypt(c.cast("string"), lit(key), lit(mode)))
  }

  def reveal(c: Column, key: String, mode: String = "GCM"): Column = {
    keyOk(key)
    aes_decrypt(unbase64(c), lit(key), lit(mode)).cast("string")
  }
}
