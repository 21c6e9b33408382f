package graft.etl

/** The reference's HTTP extract error contract
  * (/root/reference/api_client.py:48-89), modeled as a pure, transport-
  * free policy so the four branches are spec-testable without a network
  * (this container has none — a real deployment plugs an actual client
  * into `get`):
  *
  *   - 200          → parse the body
  *   - 404          → the EMPTY result, immediately (no data is not a
  *                    failure — the reference maps it to an empty MRData
  *                    envelope, api_client.py:67-70)
  *   - other 4xx    → fatal immediately, never retried (the caller's
  *                    request is wrong; retrying cannot fix it,
  *                    api_client.py:71-73)
  *   - 5xx, timeout,
  *     transport    → retry with exponential backoff `delay ** attempt`
  *                    (api_client.py:60-64,75-84); exhausting
  *                    `maxAttempts` raises the terminal error
  *
  * `Fatal` surfaces as [[Pipeline.FatalExtractException]] so a
  * [[Pipeline.withRetry]]-wrapped extract built on this layer keeps the
  * no-retry discrimination end to end.
  */
object HttpExtract {

  /** The reference's retry schedule `API_RETRY_DELAY ** attempt` (base 2,
    * 100 ms units) — the ONE definition every layer defaults to.
    */
  val defaultBackoff: Int => Long = a => 100L * math.round(math.pow(2, a))

  /** One response from the transport — what a fake (or a real client)
    * hands the policy per attempt.
    */
  sealed trait Response
  /** 2xx with a body. */
  final case class Ok(body: String) extends Response
  /** Any non-2xx HTTP status. */
  final case class Status(code: Int, message: String = "") extends Response
  /** Timeout or transport failure — no status line ever arrived. */
  final case class Failed(message: String) extends Response

  /** Terminal failure after retries were exhausted (the reference's
    * JolpicaAPIError on the retry paths).
    */
  final case class ExhaustedException(message: String) extends RuntimeException(message)

  /** Run one logical request under the contract. `get` is invoked once
    * per attempt (a fake scripts a response sequence; a real client
    * issues the HTTP call). `parse` maps a 2xx body to the result;
    * `empty` is the 404 mapping. `sleep`/`backoffMs` are injectable so
    * specs record the backoff schedule instead of waiting it out;
    * the default backoff is the reference's `API_RETRY_DELAY ** attempt`
    * shape (base 2, in units of 100 ms).
    */
  def request[A](
      get: () => Response,
      parse: String => A,
      empty: => A,
      maxAttempts: Int = 3,
      backoffMs: Int => Long = defaultBackoff,
      sleep: Long => Unit = Thread.sleep): A = {
    require(maxAttempts >= 1, "maxAttempts must be at least 1")
    var attempt = 0
    while (true) {
      val retryable: Option[String] = get() match {
        case Ok(body) => return parse(body)
        case Status(404, _) => return empty
        case Status(code, msg) if code >= 400 && code < 500 =>
          throw Pipeline.FatalExtractException(s"client error $code: $msg")
        case Status(code, msg) => Some(s"server error $code: $msg")
        case Failed(msg) => Some(s"request failed: $msg")
      }
      attempt += 1
      if (attempt >= maxAttempts)
        throw ExhaustedException(s"${retryable.get} (after $maxAttempts attempts)")
      // the reference sleeps delay ** attempt with attempt COUNTING FROM 0
      // (api_client.py:63 — first retry waits delay^0), so the k-th retry
      // sleeps backoffMs(k - 1)
      sleep(backoffMs(attempt - 1))
    }
    throw new IllegalStateException("unreachable")
  }

  /** A [[Pipeline.Extract]] whose per-run fetch obeys the contract:
    * `fetch` produces the raw payload under retry/404/4xx discrimination,
    * then `load` turns it into the extract's DataFrame (`None` = the 404
    * empty-result branch — the loader decides what "empty" means for its
    * schema, as the reference's loaders do with the empty MRData).
    */
  def extract(
      fetch: Option[Long] => () => Response,
      load: (org.apache.spark.sql.SparkSession, Option[String]) => org.apache.spark.sql.DataFrame,
      maxAttempts: Int = 3,
      backoffMs: Int => Long = defaultBackoff,
      sleep: Long => Unit = Thread.sleep): Pipeline.Extract =
    (spark, since) =>
      request[org.apache.spark.sql.DataFrame](
        fetch(since),
        body => load(spark, Some(body)),
        load(spark, None),
        maxAttempts, backoffMs, sleep)

  /** The reference's `test_connection` (api_client.py:173-185): issue one
    * cheap probe request under the full contract and report reachability
    * as a Boolean — `true` when the probe parses (or maps to the 404
    * empty result, which proves the endpoint answered), `false` on any
    * terminal failure (retries exhausted, or a fatal 4xx — the reference
    * catches its JolpicaAPIError and returns False rather than raising).
    */
  def testConnection(
      get: () => Response,
      maxAttempts: Int = 3,
      backoffMs: Int => Long = defaultBackoff,
      sleep: Long => Unit = Thread.sleep): Boolean =
    try {
      request[Boolean](get, _ => true, true, maxAttempts, backoffMs, sleep)
    } catch {
      case _: ExhaustedException => false
      case _: Pipeline.FatalExtractException => false
    }
}

/** Typed per-endpoint accessors — the reference's named wrappers over its
  * generic request (api_client.py:94-166: race/qualifying/sprint results
  * and the two standings endpoints with their optional-round overload).
  * Each method resolves the reference's exact endpoint path and runs ONE
  * request under the full [[HttpExtract.request]] contract, returning
  * `Some(body)` on 2xx and `None` on the 404 empty branch. `transport`
  * is path → response (a fake scripts it; a real client issues the GET),
  * so a ported caller keeps the reference's call sites
  * (`client.raceResults(2024, 5)`) while the retry/4xx/404 policy stays
  * in one place.
  */
final class EndpointClient(
    transport: String => HttpExtract.Response,
    maxAttempts: Int = 3,
    backoffMs: Int => Long = HttpExtract.defaultBackoff,
    sleep: Long => Unit = Thread.sleep) {
  import HttpExtract._

  private def getOpt(path: String): Option[String] =
    request[Option[String]](() => transport(path), Some(_), None,
      maxAttempts, backoffMs, sleep)

  /** api_client.py:94-106 — `/{year}/{round}/results.json`. */
  def raceResults(year: Int, round: Int): Option[String] =
    getOpt(EndpointClient.raceResultsPath(year, round))

  /** api_client.py:108-118 — `/{year}/{round}/qualifying.json`. */
  def qualifyingResults(year: Int, round: Int): Option[String] =
    getOpt(EndpointClient.qualifyingResultsPath(year, round))

  /** api_client.py:120-131 — `/{year}/{round}/sprint.json` (404 → None,
    * the no-sprint-at-this-round case).
    */
  def sprintResults(year: Int, round: Int): Option[String] =
    getOpt(EndpointClient.sprintResultsPath(year, round))

  /** api_client.py:137-151 — round-scoped or season-final standings. */
  def driverStandings(year: Int, round: Option[Int] = None): Option[String] =
    getOpt(EndpointClient.driverStandingsPath(year, round))

  /** api_client.py:153-166 — round-scoped or season-final standings. */
  def constructorStandings(year: Int, round: Option[Int] = None): Option[String] =
    getOpt(EndpointClient.constructorStandingsPath(year, round))

  /** api_client.py:173-185 — one cheap seasons probe, Boolean verdict. */
  def testConnection(): Boolean =
    HttpExtract.testConnection(() => transport(EndpointClient.seasonsPath(1)),
      maxAttempts, backoffMs, sleep)

  /** api_client.py:167-171 (`get_raw_zip`, step 1 of 2) — GET the dumps
    * index and resolve `delayed_dumps.csv.download_url`, the URL of the
    * delayed CSV dump zip. The FETCH of that URL stays caller-side: the
    * zip is a file input, and [[graft.sources.CsvSource.fromZip]] owns
    * the zip→DataFrame half — so the typed surface is
    * `client.rawZipUrl() → download → CsvSource.fromZip`, the
    * reference's two-step flow with the transport seam between the
    * steps. 404 → None (no dump published); a well-formed index without
    * the expected field fails LOUDLY naming the missing path rather than
    * returning a null URL.
    */
  def rawZipUrl(): Option[String] =
    getOpt(EndpointClient.dumpsIndexPath).map(EndpointClient.dumpDownloadUrl)
}

object EndpointClient {
  def raceResultsPath(year: Int, round: Int): String = s"/$year/$round/results.json"
  def qualifyingResultsPath(year: Int, round: Int): String = s"/$year/$round/qualifying.json"
  def sprintResultsPath(year: Int, round: Int): String = s"/$year/$round/sprint.json"
  def driverStandingsPath(year: Int, round: Option[Int] = None): String =
    round.map(r => s"/$year/$r/driverStandings.json").getOrElse(s"/$year/driverStandings.json")
  def constructorStandingsPath(year: Int, round: Option[Int] = None): String =
    round.map(r => s"/$year/$r/constructorStandings.json").getOrElse(s"/$year/constructorStandings.json")
  def seasonsPath(limit: Int): String = s"/seasons.json?limit=$limit"

  /** The dumps index (api_client.py:168). In the reference this is an
    * ABSOLUTE url (it bypasses the client's base_url); under the
    * transport seam the path keeps the reference's full form and the
    * transport decides how to issue it.
    */
  val dumpsIndexPath: String = "/data/dumps/download/"

  /** Extract `delayed_dumps.csv.download_url` from the dumps index body
    * (api_client.py:169) — Jackson (on Spark's own classpath), no
    * hand-rolled JSON. Missing fields fail loudly with the full path.
    */
  def dumpDownloadUrl(indexBody: String): String = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(indexBody)
      .path("delayed_dumps").path("csv").path("download_url")
    require(node.isTextual,
      "dumps index has no delayed_dumps.csv.download_url field — " +
        s"cannot resolve the raw zip (body starts: ${indexBody.take(120)})")
    node.asText()
  }
}
