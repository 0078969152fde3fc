package graft.server

/** Minimal BLAKE3 (single-chunk inputs, ≤ 1024 bytes), implemented from the
  * public specification (Aumasson, Neves, O'Hearn, Wilcox-O'Hearn — "BLAKE3:
  * one function, fast everywhere", IACR 2020; CC0 reference spec).
  *
  * Why it exists: the reference's wire protocol identifies secret keys and
  * sessions by `blake3(key)` (`/root/reference/src/database.rs:988,1290`), so
  * a byte-compatible server needs the same 32-byte digest. Every hashed value
  * on this wire is a 32-byte key — far under one 1024-byte chunk — so the
  * chunk-tree layer (parents, counters > 0) is deliberately out of scope and
  * guarded by a require.
  */
object Blake3 {
  private val IV = Array(
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19)
  // message word permutation applied between rounds (spec table 2)
  private val Perm = Array(2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
  private val ChunkStart = 1
  private val ChunkEnd = 2
  private val Root = 8

  /** 32-byte BLAKE3 digest of a ≤ 1024-byte input. */
  def hash(input: Array[Byte]): Array[Byte] = {
    require(input.length <= 1024,
      s"single-chunk Blake3 supports <= 1024 bytes, got ${input.length}")
    val blocks: Seq[Array[Byte]] =
      if (input.isEmpty) Seq(Array.emptyByteArray) else input.grouped(64).toSeq
    var h = IV.clone()
    for ((blk, i) <- blocks.zipWithIndex) {
      var flags = 0
      if (i == 0) flags |= ChunkStart
      if (i == blocks.length - 1) flags |= ChunkEnd | Root
      h = compress(h, words(blk), blk.length, flags).take(8)
    }
    val out = new Array[Byte](32)
    for (i <- 0 until 8; b <- 0 until 4)
      out(i * 4 + b) = (h(i) >>> (8 * b)).toByte // little-endian words
    out
  }

  def hex(bytes: Array[Byte]): String = bytes.map(b => f"$b%02x").mkString

  /** 16 little-endian message words from a ≤ 64-byte block (zero-padded). */
  private def words(block: Array[Byte]): Array[Int] = {
    val m = new Array[Int](16)
    for (i <- block.indices) m(i >> 2) |= (block(i) & 0xff) << ((i & 3) * 8)
    m
  }

  /** The compression function (chunk counter fixed at 0 — single chunk). */
  private def compress(h: Array[Int], mIn: Array[Int],
                       blockLen: Int, flags: Int): Array[Int] = {
    val v = new Array[Int](16)
    Array.copy(h, 0, v, 0, 8)
    Array.copy(IV, 0, v, 8, 4)
    v(12) = 0; v(13) = 0 // counter lo/hi
    v(14) = blockLen; v(15) = flags
    var m = mIn
    var r = 0
    while (r < 7) {
      g(v, 0, 4, 8, 12, m(0), m(1)); g(v, 1, 5, 9, 13, m(2), m(3))
      g(v, 2, 6, 10, 14, m(4), m(5)); g(v, 3, 7, 11, 15, m(6), m(7))
      g(v, 0, 5, 10, 15, m(8), m(9)); g(v, 1, 6, 11, 12, m(10), m(11))
      g(v, 2, 7, 8, 13, m(12), m(13)); g(v, 3, 4, 9, 14, m(14), m(15))
      if (r < 6) m = Perm.map(m)
      r += 1
    }
    val out = new Array[Int](16)
    for (i <- 0 until 8) { out(i) = v(i) ^ v(i + 8); out(i + 8) = v(i + 8) ^ h(i) }
    out
  }

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int,
                mx: Int, my: Int): Unit = {
    v(a) = v(a) + v(b) + mx
    v(d) = Integer.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + my
    v(d) = Integer.rotateRight(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 7)
  }
}
