package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** sha256 helpers matching the reference's hashing conventions
  * (`handlers/base.py:53-58`, `fake_provider.py:83-85,170-173`).
  */
object Digests {
  /** Lowercase hex sha256 of the UTF-8 bytes (Python `hexdigest()`). */
  def sha256Hex(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** `int(sha256(key).hexdigest()[:8], 16)` (`fake_provider.py:85`). */
  def seedOf(key: String): Long =
    java.lang.Long.parseLong(sha256Hex(key).substring(0, 8), 16)
}
