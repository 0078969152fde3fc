package graft.catalog

import graft.TestSpark
import graft.aql.{Engine, ParseException}
import graft.server.AqlServer
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Settings surface parity with the reference's `settings.yaml`
  * (`/root/reference/src/database.rs:14-30` defaults, `:290-345` load +
  * self-healing normalization).
  */
class SettingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("first boot writes the default settings file (database.rs:298-302)") {
    val dir = Files.createTempDirectory("graft-settings")
    val s = Settings.load(dir)
    assert(s == Settings.default)
    assert(Files.isRegularFile(dir.resolve(Settings.FileName)))
    // second load reads the file it wrote
    assert(Settings.load(dir) == Settings.default)
  }

  test("flat yaml parse: comments, unknown keys, malformed values") {
    val dir = Files.createTempDirectory("graft-settings")
    Files.writeString(dir.resolve(Settings.FileName),
      """max_columns: 12   # inline comment
        |auto_commit: true
        |ip: 0.0.0.0
        |safety_level: strict
        |max_connections: not-a-number
        |""".stripMargin)
    val s = Settings.load(dir)
    assert(s.maxColumns == 12 && s.autoCommit && s.ip == "0.0.0.0")
    assert(s.maxConnections == Settings.default.maxConnections) // malformed -> default
    assert(s.minColumns == 1) // absent -> default
  }

  test("self-healing normalization (database.rs:312-335)") {
    assert(Settings(maxColumns = 0).normalized.maxColumns == 10)
    assert(Settings(maxColumns = 5, minColumns = 9).normalized.minColumns == 1)
    // equality included, as in the reference's `max_columns <= min_columns`
    assert(Settings(maxColumns = 5, minColumns = 5).normalized.minColumns == 1)
    assert(Settings(memoryLimit = 7).normalized.memoryLimit == 1048576L)
    assert(Settings(maxConnections = -2).normalized.maxConnections == 1)
    assert(Settings(indexProbeCap = 0).normalized.indexProbeCap == 8192)
  }

  test("index_probe_cap round-trips through yaml") {
    val dir = Files.createTempDirectory("graft-settings-ixc")
    Files.writeString(dir.resolve(Settings.FileName), "index_probe_cap: 4\n")
    assert(Settings.load(dir).indexProbeCap == 4)
  }

  test("rebuild_ivf_after_commits round-trips; negatives normalize to off") {
    val dir = Files.createTempDirectory("graft-settings-rbi")
    Files.writeString(dir.resolve(Settings.FileName),
      "rebuild_ivf_after_commits: 6\n")
    assert(Settings.load(dir).rebuildIvfAfterCommits == 6)
    assert(Settings(rebuildIvfAfterCommits = -3).normalized.rebuildIvfAfterCommits == 0)
    assert(Settings.default.rebuildIvfAfterCommits == 0, "opt-in: off by default")
  }

  test("'#' inside a value is data, not a comment (YAML rule)") {
    val dir = Files.createTempDirectory("graft-settings-hash")
    Files.writeString(dir.resolve(Settings.FileName),
      "auth_token: s3#cret\nmax_columns: 12 # trailing comment\n")
    val s = Settings.load(dir)
    assert(s.authToken == "s3#cret")
    assert(s.maxColumns == 12)
  }

  test("engine honors auto_commit and max_columns from settings.yaml") {
    val dir = Files.createTempDirectory("graft-settings-eng")
    Files.writeString(dir.resolve(Settings.FileName),
      "max_columns: 3\nauto_commit: true\n")
    val eng = new Engine(spark, dir.toString)
    assert(eng.tx.autoCommit)
    intercept[ParseException](
      eng.execute("CREATE CONTAINER wide ['a','b','c','d'] [INT, INT, INT, INT]"))
    eng.execute("CREATE CONTAINER ok ['a','b','c'] [INT, INT, INT]")
    // auto_commit applied the insert without an explicit COMMIT
    eng.execute("CREATE ROW ['a'] [1] ON ok")
    assert(eng.catalog.read("ok").count() == 1)
  }

  test("server boots from the settings file (ip + port + pool)") {
    val dir = Files.createTempDirectory("graft-settings-srv")
    Files.writeString(dir.resolve(Settings.FileName),
      "data_port: 0\nmax_connections: 4\n") // 0 = ephemeral for the spec
    val eng = new Engine(spark, dir.toString)
    val server = new AqlServer(eng)
    val port = server.startFromSettings()
    try {
      val url = new java.net.URI(s"http://127.0.0.1:$port/health").toURL
      val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      conn.disconnect()
    } finally server.stop()
  }
}
