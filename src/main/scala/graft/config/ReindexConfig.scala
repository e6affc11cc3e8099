package graft.config

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import java.nio.file.{Files, Paths}
import scala.util.Try

/** Configuration plane for the reindex pipeline (reference O14).
  *
  * Field set, defaults, and validation bounds mirror the reference's
  * config (/root/reference/config/config.go:14-27 fields, :73-84
  * defaults, :51-68 validation): chunkSize ∈ [10, 100000], workers ∈
  * [1, availableProcessors], password and solrUrl required.
  *
  * Deliberate divergences from reference HEAD (see SURVEY.md §0.1):
  *  - `query` is genuinely configurable (reference bug B2: the Go field
  *    is unexported so user config is silently ignored).
  *  - the resume predicate splice is case-insensitive on the
  *    "not deleted" anchor (bug B3: case-sensitive replace never fires
  *    against the default query's "NOT deleted").
  *  - resume keeps the inclusive `id >= startId` of the reference code
  *    (B4, documented as exclusive; inclusive is safe for an idempotent
  *    upsert sink and matches the code as written).
  */
final case class ReindexConfig(
    dbHost: String = "localhost",
    dbPort: Int = 5432,
    dbName: String = "shrindex",
    dbUser: String = "shrindex",
    password: String = "",
    query: String = ReindexConfig.DefaultQuery,
    startId: String = "",
    solrUrl: String = "",
    chunkSize: Int = 20000,
    workers: Int = math.max(Runtime.getRuntime.availableProcessors - 1, 1),
    authorities: Boolean = true,
    redisUrl: String = "redis://localhost:6379/0",
    /** Engine extension (not in the reference config): when set, read
      * documents from this parquet/NDJSON path instead of Postgres —
      * the zero-egress test path uses it.  Unknown to the reference,
      * whose loader would ignore it (same forward-compat stance here).
      */
    sourcePath: String = "",
    /** Engine extension: verbatim JDBC URL overriding the Postgres DSN
      * derived from dbHost/dbPort/dbName — lets the partitioned scan
      * run against any JDBC database (tests use embedded Derby).
      */
    jdbcUrlOverride: String = ""
) {

  /** JDBC URL for the Spark reader (reference DatabaseUrl,
    * config/config.go:41-43, adapted from the lib/pq DSN form).
    */
  def jdbcUrl: String =
    if (jdbcUrlOverride.nonEmpty) jdbcUrlOverride
    else s"jdbc:postgresql://$dbHost:$dbPort/$dbName"

  /** Whether the target speaks Postgres SQL — gates Postgres-only
    * expressions like `hashtext()` in the partitioning subquery.
    */
  def isPostgres: Boolean = jdbcUrl.startsWith("jdbc:postgresql:")

  /** Redacted form for logs (reference config/config.go:45-47). */
  def display: String = this.copy(password = "*****").toString

  /** Whether a resume point is configured (reference HasParameters,
    * config/config.go:36-38).
    */
  def hasStartId: Boolean = startId.nonEmpty

  /** The effective SQL text with the resume predicate spliced in.
    *
    * Reference QueryString (config/config.go:29-34) splices
    * `id >= :startId` by replacing the literal "not deleted"; we keep
    * the anchor-based splice for query compatibility but match it
    * case-insensitively (fixes B3) and emit a plain SQL literal rather
    * than a named parameter (B5: the reference's named-arg call is
    * broken anyway).  Ids compare lexicographically ("asciibetically",
    * reference README.md:77-78) — the quoting preserves that.
    */
  def queryString: String =
    if (!hasStartId) query
    else {
      val anchor = "(?i)not\\s+deleted".r
      val lit = startId.replace("'", "''")
      anchor.findFirstMatchIn(query) match {
        case Some(m) =>
          query.substring(0, m.end) + s" AND id >= '$lit'" + query.substring(m.end)
        case None => // no anchor: wrap (reference would silently not resume)
          // `AS` is mandatory for derived-table aliases on some targets
          // (Derby); Postgres accepts it too
          s"SELECT * FROM ($query) AS graft_q WHERE id >= '$lit'"
      }
    }

  private def redisUrlValid: Boolean =
    Try {
      val u = java.net.URI.create(redisUrl)
      u.getScheme == "redis" && u.getHost != null &&
        // digits-only AND parseable: isDigit alone admits overflow,
        // toIntOption alone admits signs ('-1' would slip through to a
        // runtime SELECT error) — both are CONFIG errors, not preflight
        Option(u.getPath).filter(_.length > 1).map(_.stripPrefix("/"))
          .forall(p => p.forall(_.isDigit) && p.toIntOption.isDefined)
    }.getOrElse(false)

  /** Bounds validation (reference Validate, config/config.go:51-68).
    * A malformed redisUrl with authorities enabled is a CONFIG error
    * (exit 2), distinct from an unreachable store (preflight, exit 1).
    */
  def validate: Either[String, ReindexConfig] =
    if (chunkSize < 10 || chunkSize > 100000)
      Left(s"chunkSize must be between 10 and 100000, got $chunkSize")
    else if (workers < 1)
      Left(s"workers must be >= 1, got $workers")
    else if (workers > Runtime.getRuntime.availableProcessors)
      Left(s"workers must be <= ${Runtime.getRuntime.availableProcessors}, got $workers")
    else if (password.isEmpty)
      Left("password is required")
    else if (solrUrl.isEmpty)
      Left("solrUrl is required")
    else if (authorities && !redisUrlValid)
      Left(s"invalid redisUrl (expected redis://host[:port][/db]): $redisUrl")
    else Right(this)
}

object ReindexConfig {
  /** Reference default query (config/config.go:78). */
  val DefaultQuery: String =
    "select id, txn_id, owner, content from documents WHERE NOT deleted ORDER BY id ASC"

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  /** Load config JSON over defaults then validate (reference
    * LoadConfig, config/config.go:72-108).  Callers pass argv: the
    * first *argument* (not the program name) is the config path,
    * falling back to ./config.json (reference :89-92, README.md:48-51).
    */
  def load(args: Seq[String] = Nil): Either[String, ReindexConfig] = {
    val path = args.headOption.getOrElse("config.json")
    for {
      text <- Try(Files.readString(Paths.get(path))).toEither.left
        .map(e => s"cannot read config $path: ${e.getMessage}")
      conf <- parse(text)
      ok <- conf.validate
    } yield ok
  }

  /** Parse a JSON object over the defaults.  Unknown keys are ignored
    * (reference json.Unmarshal behavior); types must match.
    */
  def parse(json: String): Either[String, ReindexConfig] =
    Try {
      val node = mapper.readTree(json)
      var c = ReindexConfig()
      def str(k: String)(f: String => ReindexConfig): Unit =
        if (node.has(k)) c = f(node.get(k).asText)
      def int(k: String)(f: Int => ReindexConfig): Unit =
        if (node.has(k)) c = f(node.get(k).asInt)
      def bool(k: String)(f: Boolean => ReindexConfig): Unit =
        if (node.has(k)) c = f(node.get(k).asBoolean)
      str("dbHost")(v => c.copy(dbHost = v))
      int("dbPort")(v => c.copy(dbPort = v))
      str("dbName")(v => c.copy(dbName = v))
      str("dbUser")(v => c.copy(dbUser = v))
      str("password")(v => c.copy(password = v))
      str("query")(v => c.copy(query = v))
      str("startId")(v => c.copy(startId = v))
      str("solrUrl")(v => c.copy(solrUrl = v))
      int("chunkSize")(v => c.copy(chunkSize = v))
      int("workers")(v => c.copy(workers = v))
      bool("authorities")(v => c.copy(authorities = v))
      str("redisUrl")(v => c.copy(redisUrl = v))
      str("sourcePath")(v => c.copy(sourcePath = v))
      str("jdbcUrl")(v => c.copy(jdbcUrlOverride = v))
      c
    }.toEither.left.map(e => s"bad config JSON: ${e.getMessage}")
}
