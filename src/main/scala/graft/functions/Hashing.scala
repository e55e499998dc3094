package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Engine-portable deterministic hashing.
  *
  * MinHash / SimHash / fingerprint results must hash-match a DuckDB oracle,
  * so the base string hash has to be computable identically in both
  * engines. md5 is; xxhash64/murmur are engine-specific. We take the first
  * 15 hex digits (60 bits — fits a signed int64, always non-negative).
  *
  * The affine rehash family works in a 31-bit field so a*h+b stays under
  * 2^62 — no overflow in either engine's int64 arithmetic.
  */
object Hashing {
  final val Mersenne31 = 2147483647L // 2^31 - 1, prime

  /** 60-bit hash of a string column via md5 hex. */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB twin of [[md5Long]]. */
  def sqlMd5Long(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  /** Fold into the 31-bit field. */
  def h31(c: Column): Column = md5Long(c) % Mersenne31
  def sqlH31(expr: String): String = s"(${sqlMd5Long(expr)} % $Mersenne31)"

  /** i-th affine rehash of a 31-bit value: (a_i * h + b_i) mod p.
    * Coefficients come from a fixed splitmix-style sequence so the Spark
    * side and the generated oracle SQL share one source of truth. */
  def affineCoeffs(n: Int): Seq[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(n) {
      val a = java.lang.Math.floorMod(next(), Mersenne31 - 1) + 1 // 1..p-1
      val b = java.lang.Math.floorMod(next(), Mersenne31)
      (a, b)
    }
  }

  def affine(h: Column, a: Long, b: Long): Column =
    (h * lit(a) + lit(b)) % Mersenne31

  def sqlAffine(expr: String, a: Long, b: Long): String =
    s"((($expr) * $a + $b) % $Mersenne31)"
}
