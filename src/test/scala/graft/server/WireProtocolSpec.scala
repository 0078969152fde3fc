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
