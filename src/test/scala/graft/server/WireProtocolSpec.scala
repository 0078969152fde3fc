package graft.server

import graft.TestSpark
import graft.aql.Engine
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

/** Reference wire-protocol parity: a client stub speaking the byte format of
  * `/root/reference/src/database.rs` (blake3 key ids, AES-256-GCM
  * nonce‖ciphertext payloads, 8-byte BE length framing, `{"?","!"}` response
  * JSON) round-trips a handshake and an encrypted query.
  */
class WireProtocolSpec extends AnyFunSuite with BeforeAndAfterAll {
  private lazy val spark = TestSpark.spark
  private var server: AqlServer = _
  private var port: Int = _
  private var dbDir: java.nio.file.Path = _
  private val client = HttpClient.newHttpClient()

  override def beforeAll(): Unit = {
    dbDir = java.nio.file.Files.createTempDirectory("graft-wire-spec")
    server = new AqlServer(new Engine(spark, dbDir.toString))
    port = server.start()
  }
  override def afterAll(): Unit = server.stop()

  // --- blake3 (public spec test vectors) ---------------------------------

  test("blake3: official empty-input vector") {
    assert(Blake3.hex(Blake3.hash(Array.emptyByteArray)) ==
      "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
  }

  test("blake3: 'abc' vector") {
    assert(Blake3.hex(Blake3.hash("abc".getBytes(UTF_8))) ==
      "6437b3ac38465133ffb63b75273a8db548c558465d79db03fd359c6cd5bd9d85")
  }

  test("blake3: multi-block single-chunk input (spans the 64-byte boundary)") {
    // 100 bytes of the official i % 251 pattern — two blocks in one chunk
    val input = Array.tabulate[Byte](100)(i => (i % 251).toByte)
    val h = Blake3.hash(input)
    assert(h.length == 32)
    // deterministic + differs from the 99-byte prefix (regression canary)
    assert(Blake3.hex(h) == Blake3.hex(Blake3.hash(input)))
    assert(Blake3.hex(h) != Blake3.hex(Blake3.hash(input.take(99))))
  }

  // --- client stub -------------------------------------------------------

  private def firstKey: Array[Byte] = {
    val keys = new WireKeys(dbDir, 10) // same file the server provisioned
    assert(keys.byHash.nonEmpty)
    keys.byHash.values.head
  }

  private def send(method: String, body: Array[Byte]): Array[Byte] = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
      .method(method, HttpRequest.BodyPublishers.ofByteArray(body)).build()
    client.send(req, HttpResponse.BodyHandlers.ofByteArray()).body()
  }

  private def handshake(key: Array[Byte]): Array[Byte] = {
    val resp = send("GET", Blake3.hash(key))
    assert(resp.nonEmpty && resp(0) == 1, "handshake rejected")
    val sessionId = WireCrypto.decrypt(resp.drop(1), key)
      .getOrElse(fail("handshake payload did not decrypt"))
    // the reference issues the secret key itself as the session id
    // (database.rs:987: `let session_id = secret_key.clone()`)
    assert(sessionId.sameElements(key))
    sessionId
  }

  private def query(key: Array[Byte], command: String, args: Seq[String] = Nil): String = {
    val json = s"""{"command":${jstr(command)},"arguments":[${args.map(jstr).mkString(",")}]}"""
    val payload = Blake3.hash(key) ++ WireCrypto.encrypt(json.getBytes(UTF_8), key)
    val resp = send("POST", payload)
    assert(resp.length > 8, s"error frame: ${resp.toSeq}")
    val len = java.nio.ByteBuffer.wrap(resp.take(8)).getLong
    assert(len == resp.length - 8, "length framing mismatch")
    new String(WireCrypto.decrypt(resp.drop(8), key)
      .getOrElse(fail("response did not decrypt")), UTF_8)
  }

  private def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // --- protocol tests ----------------------------------------------------

  test("handshake: known key hash gets an encrypted session id; unknown gets 0x00") {
    handshake(firstKey)
    val bogus = new Array[Byte](32)
    assert(send("GET", bogus).toSeq == Seq[Byte](0))
    assert(send("GET", Array[Byte](1, 2, 3)).toSeq == Seq[Byte](0)) // wrong length
  }

  test("encrypted DDL/DML/query round trip in reference framing") {
    val key = firstKey
    handshake(key)
    assert(query(key, "CREATE CONTAINER wires ['id','label'] [INT, SMALL-STRING]")
      .contains("\"!\":1"))
    assert(query(key, "CREATE ROW ['id','label'] [7,'enc'] ON wires").contains("\"!\":1"))
    assert(query(key, "COMMIT wires").contains("\"!\":1"))
    val resp = query(key, "SEARCH ['label'] ON wires WHERE id = ?", Seq("7"))
    assert(resp.contains("\"!\":1"), resp)
    // content ("?") carries the engine's result json, itself a JSON string
    assert(resp.contains("\\\"rows\\\":[[\\\"enc\\\"]]"), resp)
  }

  test("engine errors come back success=0 in the same encrypted framing") {
    val key = firstKey
    handshake(key)
    val resp = query(key, "SEARCH [] ON no_such_container")
    assert(resp.contains("\"!\":0"), resp)
  }

  test("tampered ciphertext and unknown session both get the 8-zero-byte error frame") {
    val key = firstKey
    handshake(key)
    val good = Blake3.hash(key) ++
      WireCrypto.encrypt("""{"command":"COMMIT","arguments":[]}""".getBytes(UTF_8), key)
    good(good.length - 1) = (good(good.length - 1) ^ 1).toByte // flip a tag bit
    assert(send("POST", good).toSeq == new Array[Byte](8).toSeq)
    val strangerHash = new Array[Byte](32) // never handshaked
    assert(send("POST", strangerHash ++ Array[Byte](1, 2, 3, 4)).toSeq ==
      new Array[Byte](8).toSeq)
  }

  test("wire protocol is path-blind like the reference (incl. JSON-route prefixes)") {
    val key = firstKey
    handshake(key)
    // the reference ignores the request path entirely; only the EXACT
    // /health /session /query paths are the JSON carve-out — a
    // prefix-sharing path like /queryx must still hit the wire handler
    for (path <- Seq("/anything/at/all", "/queryx", "/sessions2")) {
      val json = """{"command":"SEARCH ['label'] ON wires WHERE id = 7","arguments":[]}"""
      val payload = Blake3.hash(key) ++ WireCrypto.encrypt(json.getBytes(UTF_8), key)
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .method("POST", HttpRequest.BodyPublishers.ofByteArray(payload)).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofByteArray()).body()
      assert(resp.length > 8, s"$path did not reach the wire handler")
      val plain = new String(WireCrypto.decrypt(resp.drop(8), key).get, UTF_8)
      assert(plain.contains("\"!\":1"), s"$path: $plain")
    }
  }

  test("two-port model: handshake on connections_port authorizes queries " +
    "on data_port (shared sessions, path-blind dispatch on both)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-two-port")
    val two = new AqlServer(new Engine(spark, dir.toString), connectionsPort = 0)
    val dataPort = two.start()
    val connPort = two.connectionsBoundPort
    assert(connPort > 0 && connPort != dataPort)
    try {
      def sendTo(p: Int, method: String, body: Array[Byte]): Array[Byte] = {
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/"))
          .method(method, HttpRequest.BodyPublishers.ofByteArray(body)).build()
        client.send(req, HttpResponse.BodyHandlers.ofByteArray()).body()
      }
      val key = new WireKeys(dir, 10).byHash.values.head
      // handshake ONLY on the connections port
      val hs = sendTo(connPort, "GET", Blake3.hash(key))
      assert(hs.nonEmpty && hs(0) == 1, "handshake rejected on connections port")
      // the session it established authorizes a query on the DATA port
      val json = """{"command":"CREATE CONTAINER twoport ['id'] [INT]","arguments":[]}"""
      val payload = Blake3.hash(key) ++ WireCrypto.encrypt(json.getBytes(UTF_8), key)
      val resp = sendTo(dataPort, "POST", payload)
      assert(resp.length > 8, s"error frame on data port: ${resp.toSeq}")
      val plain = new String(WireCrypto.decrypt(resp.drop(8), key).get, UTF_8)
      assert(plain.contains("\"!\":1"), plain)
      // and the connections listener is wire-only: no JSON routes there
      val health = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:$connPort/health")).GET().build()
      val hresp = client.send(health, HttpResponse.BodyHandlers.ofByteArray())
      assert(hresp.body().headOption.contains(0: Byte),
        "connections-port /health should hit the path-blind wire handshake, not JSON")
    } finally two.stop()
  }

  test("wire_encryption: false disables the binary protocol") {
    val dir = java.nio.file.Files.createTempDirectory("graft-wire-off")
    java.nio.file.Files.writeString(dir.resolve("settings.yaml"),
      "wire_encryption: false\n")
    val off = new AqlServer(new Engine(spark, dir.toString))
    val p = off.start()
    try {
      val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p/"))
        .method("GET", HttpRequest.BodyPublishers.ofByteArray(new Array[Byte](32))).build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 404)
      // and no key file is provisioned when the wire layer never starts
      assert(!java.nio.file.Files.exists(dir.resolve(".graft-keys")))
    } finally off.stop()
  }

  // --- cross-implementation cipher interop --------------------------------
  // The reference binary cannot be built in this container (cargo's crate
  // registry is unreachable offline; verified: `cargo build` fails
  // resolving ahash/aes-gcm). The strongest offline interop proof is
  // cross-validation against an INDEPENDENT implementation of the
  // reference's cipher: the reference uses the aes-gcm crate
  // (database.rs:1048-1080), which implements NIST SP 800-38D — so frames
  // produced by a from-the-spec GCM built here out of raw AES-ECB blocks
  // plus hand-rolled GHASH/CTR must be byte-accepted by WireCrypto, and
  // WireCrypto's frames must reproduce bit-exactly under it. That rules
  // out every framing/layout error interop could catch (nonce placement,
  // tag position/length, counter start, GHASH padding), independent of
  // the JCE GCM code path WireCrypto uses.

  /** AES-256-GCM from the NIST SP 800-38D definition: GHASH in GF(2^128)
    * and CTR mode over single AES-ECB block calls — shares only the raw
    * AES block cipher with WireCrypto's AES/GCM/NoPadding transformation.
    */
  private object SpecGcm {
    import javax.crypto.Cipher
    import javax.crypto.spec.SecretKeySpec
    private def aesBlock(key: Array[Byte], block: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/ECB/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
      c.doFinal(block)
    }
    private def toBig(b: Array[Byte]): BigInt = BigInt(1, b)
    private def toBlock(x: BigInt): Array[Byte] = {
      val raw = x.toByteArray.dropWhile(_ == 0)
      Array.fill[Byte](16 - raw.length)(0) ++ raw
    }
    private val R = BigInt("e1", 16) << 120
    /** GF(2^128) multiply, SP 800-38D algorithm 1 (MSB-first bits). */
    private def gfMul(x: BigInt, y: BigInt): BigInt = {
      var z = BigInt(0); var v = x
      var i = 0
      while (i < 128) {
        if (y.testBit(127 - i)) z ^= v
        v = if (v.testBit(0)) (v >> 1) ^ R else v >> 1
        i += 1
      }
      z
    }
    private def ghash(h: BigInt, blocks: Array[Byte]): BigInt = {
      var y = BigInt(0)
      blocks.grouped(16).foreach { blk =>
        val padded = blk ++ Array.fill[Byte](16 - blk.length)(0)
        y = gfMul(y ^ toBig(padded), h)
      }
      y
    }
    /** Returns ciphertext ‖ 16-byte tag (empty AAD, 12-byte nonce — the
      * reference wire layer's exact parameters). */
    def encrypt(key: Array[Byte], nonce: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      require(nonce.length == 12)
      val h = toBig(aesBlock(key, new Array[Byte](16)))
      val j0 = nonce ++ Array[Byte](0, 0, 0, 1)
      def ctrBlock(i: Long): Array[Byte] = { // J0 with its 32-bit tail + i
        val b = java.nio.ByteBuffer.allocate(16).put(nonce)
        b.putInt(((1 + i) & 0xffffffffL).toInt).array()
      }
      val ct = plain.grouped(16).zipWithIndex.flatMap { case (blk, i) =>
        aesBlock(key, ctrBlock(i + 1)).take(blk.length)
          .zip(blk).map { case (k, p) => (k ^ p).toByte }
      }.toArray
      val lens = java.nio.ByteBuffer.allocate(16)
        .putLong(0L).putLong(ct.length * 8L).array() // [len(A)]64 ‖ [len(C)]64
      val s = gfMul(ghash(h, ct) ^ toBig(lens), h)
      val tag = aesBlock(key, j0).zip(toBlock(s)).map { case (a, b) => (a ^ b).toByte }
      ct ++ tag
    }
  }

  test("WireCrypto frames reproduce bit-exactly under a from-the-spec GCM " +
    "(the reference's cipher, independently implemented)") {
    val key = Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)
    for (plain <- Seq("", "x", "{\"command\":\"COMMIT\",\"arguments\":[]}",
        "A" * 100)) { // empty, sub-block, multi-block, 6+ blocks
      val framed = WireCrypto.encrypt(plain.getBytes(UTF_8), key)
      val nonce = framed.take(WireCrypto.NonceLen)
      // layout per database.rs:1048-1080: nonce ‖ ciphertext ‖ 16-byte tag,
      // ciphertext as long as the plaintext
      assert(framed.length == WireCrypto.NonceLen + plain.length + 16)
      val expected = SpecGcm.encrypt(key, nonce, plain.getBytes(UTF_8))
      assert(framed.drop(WireCrypto.NonceLen).sameElements(expected),
        s"GCM bytes diverge from the spec construction for '$plain'")
    }
  }

  test("frames built by the independent GCM are byte-accepted by WireCrypto " +
    "(and a tag flip is rejected) — offline stand-in for reference interop") {
    val key = Array.tabulate[Byte](32)(i => (i * 13 + 1).toByte)
    val nonce = Array.tabulate[Byte](12)(i => (i + 100).toByte)
    val plain = """{"command":"SEARCH [] ON wires","arguments":[]}""".getBytes(UTF_8)
    val foreign = nonce ++ SpecGcm.encrypt(key, nonce, plain)
    assert(WireCrypto.decrypt(foreign, key).exists(_.sameElements(plain)))
    foreign(foreign.length - 1) = (foreign(foreign.length - 1) ^ 1).toByte
    assert(WireCrypto.decrypt(foreign, key).isEmpty)
  }

  test("key file is reference-format YAML (base64 list) and reloads identically") {
    val f = dbDir.resolve(".graft-keys")
    assert(java.nio.file.Files.isRegularFile(f))
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size() == 10) // settings default secret_key_count
    lines.forEach { l =>
      assert(l.startsWith("- "))
      assert(java.util.Base64.getDecoder.decode(l.drop(2)).length == 32)
    }
    val reload = new WireKeys(dbDir, 3) // count ignored when file exists
    assert(reload.byHash.size == 10)
  }
}
