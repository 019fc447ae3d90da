package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Config-source parity (`Startup.cs:35-40`, `GeoDatabaseSetting.cs:12-17`):
  * env + optional file assembly, file winning, and the exact connection
  * string shape. */
class SettingsSpec extends AnyFunSuite {

  test("connection string mirrors the reference's key order") {
    val s = Settings.DbSetting("db.example", "5433", "open_ftth", "projector", "secret")
    assert(s.postgresConnectionString ===
      "Host=db.example;Port=5433;Username=projector;Password=secret;Database=open_ftth")
    assert(s.jdbcUrl === "jdbc:postgresql://db.example:5433/open_ftth")
  }

  test("env vars load by SECTION__KEY; defaults fill gaps") {
    val env = Map(
      "GEODATABASE__HOST" -> "h1",
      "GEODATABASE__PORT" -> "15432",
      "GEODATABASE__USERNAME" -> "u1",
      "EVENTSTOREDATABASE__HOST" -> "h2")
    val geo = Settings.geoDatabase(env)
    assert(geo.host === "h1" && geo.port === "15432" && geo.username === "u1")
    assert(geo.database === "graft") // default
    val es = Settings.eventStore(env)
    assert(es.host === "h2" && es.port === "5432")
  }

  test("settings file overrides env (the reference registers the file last)") {
    val f = Files.createTempFile("graft-settings", ".properties")
    Files.writeString(f,
      """geodatabase.host=file-host
        |geodatabase.password=file-pass
        |""".stripMargin)
    val env = Map("GEODATABASE__HOST" -> "env-host", "GEODATABASE__DATABASE" -> "env-db")
    val s = Settings.geoDatabase(env, Some(f))
    assert(s.host === "file-host") // file wins
    assert(s.password === "file-pass")
    assert(s.database === "env-db") // env still applies where file silent
  }
}
