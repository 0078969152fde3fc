package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FileStreamSource requires a directory; the driver fixtures are single
  * parquet files. Stage a symlink dir per fixture (no data copy, removed
  * on JVM exit) — in production the source would be the append-only table
  * directory itself.
  */
object StreamStaging {
  def readFileStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val file = java.nio.file.Paths.get(path)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream-stage")
    val link = streamDir.resolve(file.getFileName)
    java.nio.file.Files.createSymbolicLink(link, file)
    link.toFile.deleteOnExit()
    streamDir.toFile.deleteOnExit()
    spark.readStream.schema(schema).parquet(streamDir.toString)
  }
}
