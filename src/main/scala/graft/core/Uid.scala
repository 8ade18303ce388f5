package graft.core

import java.security.SecureRandom
import scala.util.Random

/** Random 25-char base-36 identifiers, case-insensitive-safe.
  *
  * Matches the reference's id space (graphydb.py:137-167: 36^25 ≈ 8.1e38,
  * uniqueness assumed, never checked). A seedable generator exists so tests
  * and oracle fixtures are reproducible.
  */
object Uid {
  val Alphabet = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  val Length = 25

  private val secure = new SecureRandom()

  /** Cryptographically-random uid (production path). */
  def random(): String = {
    val sb = new StringBuilder(Length)
    var i = 0
    while (i < Length) { sb.append(Alphabet.charAt(secure.nextInt(36))); i += 1 }
    sb.toString
  }

  /** Deterministic uid stream for tests / fixtures. */
  final class Seeded(seed: Long) {
    private val rng = new Random(seed)
    def next(): String = {
      val sb = new StringBuilder(Length)
      var i = 0
      while (i < Length) { sb.append(Alphabet.charAt(rng.nextInt(36))); i += 1 }
      sb.toString
    }
  }

  def isUid(s: String): Boolean =
    s != null && s.length == Length && s.forall(c => Alphabet.indexOf(c) >= 0)
}
