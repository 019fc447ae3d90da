package graft.sinks

import java.nio.file.{Files, Path}

/** Typed connection-settings assembly, mirroring the reference's config
  * sources and URL building (`Startup.cs:35-40`: environment variables
  * plus an optional settings file, the FILE registered last and therefore
  * winning; `Settings/GeoDatabaseSetting.cs:12-17` /
  * `EventStoreDatabaseSetting.cs`: Host/Port/Database/Username/Password →
  * connection string).
  *
  * Key conventions:
  *   - environment: `<SECTION>__<KEY>` upper-cased (the .NET section
  *     separator), e.g. `GEODATABASE__HOST`;
  *   - properties file: `<section>.<key>` lower-cased, e.g.
  *     `geodatabase.host`.
  */
object Settings {

  final case class DbSetting(host: String, port: String, database: String,
      username: String, password: String) {

    /** The reference's exact key=value;… form (`GeoDatabaseSetting.cs:12-17`). */
    def postgresConnectionString: String =
      s"Host=$host;Port=$port;Username=$username;Password=$password;Database=$database"

    /** The same setting as a Spark/JDBC URL. */
    def jdbcUrl: String = s"jdbc:postgresql://$host:$port/$database"
  }

  private val fields = Seq("host", "port", "database", "username", "password")

  /** Load one section. Missing keys fall back to `default`; file values
    * override environment values (the reference registers the file source
    * after the env source, `Startup.cs:37-39`). */
  def load(section: String, env: Map[String, String] = sys.env,
      file: Option[Path] = None,
      default: DbSetting = DbSetting("localhost", "5432", "graft", "postgres", "")): DbSetting = {
    val fromEnv = fields.flatMap { f =>
      env.get(s"${section.toUpperCase}__${f.toUpperCase}").map(f -> _)
    }.toMap
    val fromFile = file.filter(Files.exists(_)).map { p =>
      val props = new java.util.Properties()
      val in = Files.newInputStream(p)
      try props.load(in) finally in.close()
      fields.flatMap { f =>
        Option(props.getProperty(s"${section.toLowerCase}.$f")).map(f -> _)
      }.toMap
    }.getOrElse(Map.empty)
    val merged = fromEnv ++ fromFile
    DbSetting(
      merged.getOrElse("host", default.host),
      merged.getOrElse("port", default.port),
      merged.getOrElse("database", default.database),
      merged.getOrElse("username", default.username),
      merged.getOrElse("password", default.password))
  }

  /** Convenience: both sections the reference configures. */
  def eventStore(env: Map[String, String] = sys.env, file: Option[Path] = None): DbSetting =
    load("eventStoreDatabase", env, file)
  def geoDatabase(env: Map[String, String] = sys.env, file: Option[Path] = None): DbSetting =
    load("geoDatabase", env, file)
}
