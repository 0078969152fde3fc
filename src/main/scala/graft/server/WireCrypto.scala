package graft.server

import java.nio.file.{Files, Path}
import java.security.SecureRandom
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}
import scala.jdk.CollectionConverters._

/** AES-256-GCM payload framing, byte-compatible with the reference's wire
  * layer (`/root/reference/src/database.rs:1048-1080`): every encrypted
  * payload is `12-byte random nonce ‖ GCM ciphertext+16-byte tag` under a
  * 32-byte session key.
  */
object WireCrypto {
  val NonceLen = 12
  val KeyLen = 32
  private val rng = new SecureRandom()

  def encrypt(plain: Array[Byte], key: Array[Byte]): Array[Byte] = {
    val nonce = new Array[Byte](NonceLen)
    rng.synchronized(rng.nextBytes(nonce))
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"),
      new GCMParameterSpec(128, nonce))
    nonce ++ c.doFinal(plain)
  }

  /** None on any framing/authentication failure (the reference maps both to
    * its zero-length error response, `database.rs:1129-1134`).
    */
  def decrypt(framed: Array[Byte], key: Array[Byte]): Option[Array[Byte]] =
    if (framed.length < NonceLen) None
    else try {
      val c = Cipher.getInstance("AES/GCM/NoPadding")
      c.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"),
        new GCMParameterSpec(128, framed, 0, NonceLen))
      Some(c.doFinal(framed, NonceLen, framed.length - NonceLen))
    } catch { case _: java.security.GeneralSecurityException => None }
}

/** Pre-shared wire keys, reference format (`database.rs:1274-1321`): a YAML
  * list of base64-encoded 32-byte AES keys (`- <b64>` lines), generated on
  * first boot (`secret_key_count` of them) and addressed by `blake3(key)`.
  * The reference stores them at `$HOME/TytoDB/.tytodb-keys`; here the file
  * lives inside the database root as `.graft-keys` (same format, relocated
  * alongside the rest of the catalog).
  */
final class WireKeys(dbDir: Path, count: Int) {
  val file: Path = dbDir.resolve(".graft-keys")

  /** blake3-hex(key) → key bytes. */
  val byHash: Map[String, Array[Byte]] = {
    val keys: Seq[Array[Byte]] =
      if (Files.isRegularFile(file)) {
        Files.readAllLines(file).asScala.toSeq
          .map(_.trim).filter(_.startsWith("- "))
          .map(l => java.util.Base64.getDecoder.decode(l.drop(2).trim))
      } else {
        val rng = new SecureRandom()
        val fresh = Seq.fill(math.max(1, count)) {
          val k = new Array[Byte](WireCrypto.KeyLen); rng.nextBytes(k); k
        }
        Files.createDirectories(dbDir)
        Files.writeString(file,
          fresh.map(k => "- " + java.util.Base64.getEncoder.encodeToString(k))
            .mkString("", "\n", "\n"))
        // key material: owner-only, like ssh keys (POSIX only; best-effort)
        try Files.setPosixFilePermissions(file,
          java.nio.file.attribute.PosixFilePermissions.fromString("rw-------"))
        catch { case _: UnsupportedOperationException => () }
        fresh
      }
    keys.map(k => Blake3.hex(Blake3.hash(k)) -> k).toMap
  }
}
