package org.apache.spark.sql.graftext

import java.security.MessageDigest

/** The repo's standard externally-replicable 48-bit hash: the first 12
  * hex chars of an MD5 digest as an unsigned long — what DuckDB
  * replicates with `('0x' || substr(md5(x), 1, 12))::BIGINT`. ONE
  * definition, shared by every expression that participates in that
  * oracle contract ([[WinnowedFingerprints]], [[KmvDistinctSketch]],
  * the split-bucketing SQL), so the JVM and SQL sides can't drift
  * apart independently. */
private[graftext] object Md548 {

  // one digest per executor thread — MessageDigest is not thread-safe
  // and getInstance per value would dominate hot loops
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** A reset, thread-owned MD5 instance for incremental hashing. */
  def digest(): MessageDigest = {
    val d = mdLocal.get()
    d.reset()
    d
  }

  /** First 6 digest bytes, big-endian, as an unsigned 48-bit long —
    * exactly the `substr(md5, 1, 12)` hex prefix. */
  def fold48(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)

  /** md5-48 of one byte string. */
  def hashBytes(b: Array[Byte]): Long = fold48(digest().digest(b))
}
