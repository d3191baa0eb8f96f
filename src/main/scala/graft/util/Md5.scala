package graft.util

/** Shared MD5-hex digest for cache keys, fingerprints, and sidecar
  * stamps — one implementation instead of a hand-rolled
  * MessageDigest-and-hex dance at every call site. */
object Md5 {
  def hex(parts: IterableOnce[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    parts.iterator.foreach(p => md.update(p.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }

  def hex(s: String): String = hex(Seq(s))
}
