package graft.catalog

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Metadata for AQL-declared materialized views (`CREATE VIEW v (SEARCH
  * …)`): the definition is persisted as the SEARCH statement's AQL text —
  * re-parsed on every REFRESH, so the stored form is the user-facing
  * contract, inspectable with a text editor. The view's DATA is an
  * ordinary container named `v` (versioned, time-travelable, SEARCHable);
  * this file is what marks that container as view-maintained, and the
  * sibling checkpoint carries the [[ChangeTail]] position its refreshes
  * consume from.
  */
object Views {
  private def metaFile(cat: Catalog, v: String): Path =
    cat.catalogDir.resolve(s"$v.viewdef")

  /** The refresh tail's checkpoint location. */
  def ckptFile(cat: Catalog, v: String): Path =
    cat.catalogDir.resolve(s"$v.viewckpt")

  def exists(cat: Catalog, v: String): Boolean = Files.exists(metaFile(cat, v))

  /** Persist a definition: atomic tmp+move (the catalog's metadata-write
    * idiom — a crash mid-write must never leave a truncated viewdef that
    * wedges REFRESH), with move-without-replace supplying the
    * double-create-fails-loudly contract. */
  def save(cat: Catalog, v: String, searchAql: String): Unit = {
    val dest = metaFile(cat, v)
    // POSIX rename replaces silently, so the double-create check is
    // explicit (view DDL is statement-serialized by the server layer,
    // like the reference's whole-DB lock, so no TOCTOU in practice)
    if (Files.exists(dest))
      throw new java.nio.file.FileAlreadyExistsException(dest.toString)
    val tmp = dest.resolveSibling(
      s"${dest.getFileName}.tmp-${ProcessHandle.current.pid}-${System.nanoTime()}")
    Files.writeString(tmp, searchAql)
    Files.move(tmp, dest, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def load(cat: Catalog, v: String): String = {
    require(exists(cat, v), s"Unknown view '$v'")
    Files.readString(metaFile(cat, v))
  }

  def drop(cat: Catalog, v: String): Unit = {
    require(exists(cat, v), s"Unknown view '$v'")
    Files.delete(metaFile(cat, v))
    Files.deleteIfExists(ckptFile(cat, v))
  }

  def list(cat: Catalog): Seq[String] =
    scala.util.Using.resource(Files.list(cat.catalogDir)) { stream =>
      stream.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".viewdef")).map(_.stripSuffix(".viewdef"))
        .toSeq.sorted
    }
}
