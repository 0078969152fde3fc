package graft.catalog

import graft.aql.AlbaType
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Container catalog: container ↔ Parquet-directory mapping with schema
  * persistence (replaces the reference's `containers.yaml` registry +
  * per-file binary schema headers, `/root/reference/src/database.rs:124-128,
  * 161-250`).
  *
  * Layout under `root`:
  *   catalog/<name>.schema   one line per column: `name<TAB>ALBA-TYPE`
  *   data/<name>/            the container's Parquet data
  *
  * Deleting/creating are metadata operations; data commits are atomic
  * directory swaps (write to `data/<name>.tmp-<nonce>`, then rename) so a
  * reader never observes a half-written container — the Spark-native
  * replacement for the reference's staged-MVCC + file-truncate commit
  * (`src/container.rs:248-342`).
  *
  * Scale note: at 100 TB a container is a partitioned Parquet dataset;
  * the swap becomes a metastore pointer flip (or Delta/Iceberg commit).
  * The catalog abstraction is unchanged.
  */
final class Catalog(val spark: SparkSession, rootDir: String) {
  private val root: Path = Paths.get(rootDir)
  private val catDir = root.resolve("catalog")
  private val dataDir = root.resolve("data")
  Files.createDirectories(catDir)
  Files.createDirectories(dataDir)

  final case class ContainerDef(name: String, columns: List[(String, AlbaType)]) {
    def schema: StructType =
      StructType(columns.map { case (n, t) => StructField(n, t.spark, nullable = true) })
    /** First column = implicit primary key (reference convention I6,
      * SURVEY.md §2.7). */
    def primaryKey: String = columns.head._1
  }

  private def schemaFile(name: String) = catDir.resolve(s"$name.schema")
  def dataPath(name: String): Path = dataDir.resolve(name)

  def exists(name: String): Boolean = Files.exists(schemaFile(name))

  def list(): Seq[String] =
    Files.list(catDir).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".schema"))
      .map(_.stripSuffix(".schema")).toSeq.sorted

  def create(name: String, columns: List[(String, AlbaType)]): ContainerDef = {
    require(!exists(name), s"Container '$name' already exists")
    require(name.matches("[A-Za-z0-9_][A-Za-z0-9_.-]*"), s"Invalid container name '$name'")
    val text = columns.map { case (n, t) => s"$n\t${t.name}" }.mkString("\n")
    Files.writeString(schemaFile(name), text)
    ContainerDef(name, columns)
  }

  def get(name: String): ContainerDef = {
    require(exists(name), s"Unknown container '$name'")
    val columns = Files.readString(schemaFile(name)).split("\n").toList
      .filter(_.nonEmpty).map { line =>
        val Array(n, t) = line.split("\t", 2)
        n -> AlbaType.of(t)
      }
    ContainerDef(name, columns)
  }

  def drop(name: String): Unit = {
    require(exists(name), s"Unknown container '$name'")
    Files.delete(schemaFile(name))
    deleteRecursively(dataPath(name))
  }

  /** Committed rows of a container (empty DataFrame if never committed). */
  def read(name: String): DataFrame = {
    val d = get(name)
    if (Files.exists(dataPath(name)))
      spark.read.schema(d.schema).parquet(dataPath(name).toString)
    else
      spark.createDataFrame(new java.util.ArrayList[Row](), d.schema)
  }

  /** Atomically replace a container's data with `df` (copy-on-write swap). */
  def overwrite(name: String, df: DataFrame): Unit = {
    val target = dataPath(name)
    val tmp = dataDir.resolve(s"$name.tmp-${System.nanoTime()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val old = dataDir.resolve(s"$name.old-${System.nanoTime()}")
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    if (Files.exists(old)) deleteRecursively(old)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
}
