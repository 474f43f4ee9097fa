package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the two engine-local hash algorithms the q22 oracle SQL
  * replays in DuckDB (round 11: promoting q22 from rows-only to
  * hash-checked): scala's MurmurHash3.stringHash (the MinhashSigner
  * base hash) and Spark's Murmur3_x86_32 long/int chain (the LSH
  * bucket hash). The constants here were derived independently from
  * the public murmur3 x86_32 algorithm; if either library ever
  * changed, this spec — and the q22 oracle — would both move. */
class MurmurReplaySpec extends AnyFunSuite {

  private def u(i: Int): Long = i.toLong & 0xffffffffL

  test("scala MurmurHash3.stringHash matches the independent replay " +
      "constants (ASCII, both MinhashSigner seeds)") {
    import scala.util.hashing.MurmurHash3
    assert(u(MurmurHash3.stringHash("abc", 0x12345678)) === 2746459911L)
    assert(u(MurmurHash3.stringHash("abc", 0x9abcdef0)) === 704689323L)
    assert(u(MurmurHash3.stringHash("the quick brown", 0x12345678)) ===
      2137102793L)
    assert(u(MurmurHash3.stringHash("the quick brown", 0x9abcdef0)) ===
      2814947627L)
    assert(u(MurmurHash3.stringHash("a", 0x12345678)) === 855248337L)
    assert(u(MurmurHash3.stringHash("a", 0x9abcdef0)) === 1522533291L)
  }

  test("Spark Murmur3_x86_32 hashLong/hashInt reference values " +
      "(the LSH bucket fold)") {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32
    assert(u(Murmur3_x86_32.hashLong(12345L, 42)) === 1416086240L)
    assert(u(Murmur3_x86_32.hashLong(0L, 42)) === 2624043101L)
    assert(u(Murmur3_x86_32.hashInt(3, 7)) === 3471288749L)
  }
}
