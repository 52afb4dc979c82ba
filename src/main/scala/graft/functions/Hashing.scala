package graft.functions

/** Shared deterministic 64-bit hash primitives (engine-internal
  * identities — no external oracle depends on the constants). */
object Hashing {

  /** FNV-1a over raw bytes. */
  def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64-style combine of an accumulator with a value. */
  def mix(acc: Long, v: Long): Long = {
    var z = acc ^ (v + 0x9e3779b97f4a7c15L + (acc << 6) + (acc >>> 2))
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
