package graft.normalize

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Name-resolution ("NameRes") client + grounding operator (SURVEY §2.8
  * N10).
  *
  * Reference: call_name_resolution (orion/normalization.py:551-601) — a GET
  * to `{NAMERES_URL}/lookup` with params {string, biolink_type,
  * autocomplete: false}, keeping the FIRST hit of the response array; on
  * connection error / timeout / non-200 it retries twice (5 s apart) and
  * then yields an `api_error` record instead of a hit. Its one production
  * caller grounds LitCoin entity names when the bagel cache misses
  * (parsers/LitCoin/src/loadLitCoin.py:481-496).
  *
  * Spark-first: the reference resolves one name at a time from the driver
  * loop; here the DISTINCT (name, biolink_type) pairs are resolved inside
  * mapPartitions — N executors × independent lookups, the same shape as
  * Normalizer.nodeMapFromService (N1). The HTTP layer sits behind the
  * serializable [[LookupService]] seam: production wraps [[HttpLookup]];
  * tests and this zero-egress sandbox use fixture-backed lookups.
  */
object NameRes {

  /** One resolution outcome: a hit, a clean miss, or the api_error
    * sentinel after exhausted retries (:596-601). */
  final case class Grounding(name: String, biolinkType: String,
                             curie: String, label: String, score: Double,
                             apiError: String)

  final case class Hit(curie: String, label: String, score: Double)

  /** Single-lookup seam. Right(Some) = first hit, Right(None) = resolved
    * but empty, Left(msg) = transport/API failure (retryable). */
  trait LookupService extends Serializable {
    def lookup(name: String, biolinkType: String): Either[String, Option[Hit]]
  }

  /** Production lookup over java.net.http — GET /lookup with the
    * reference's exact parameter shape (:558-567). */
  final class HttpLookup(baseUrl: String, timeoutSeconds: Long = 45)
      extends LookupService {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    override def lookup(name: String, biolinkType: String): Either[String, Option[Hit]] = {
      val enc = (s: String) => java.net.URLEncoder.encode(s, "UTF-8")
      val url = s"${baseUrl.stripSuffix("/")}/lookup?string=${enc(name)}" +
        s"&biolink_type=${enc(Option(biolinkType).getOrElse(""))}&autocomplete=false"
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
          .header("accept", "application/json").GET().build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() != 200)
          Left(s"Non-200 result from name resolution (url: $url). Status code: ${resp.statusCode()}.")
        else {
          val arr = mapper.readTree(resp.body())
          if (arr == null || !arr.isArray || arr.size() == 0) Right(None)
          else {
            val h = arr.get(0)
            Right(Some(Hit(h.path("curie").asText(null), h.path("label").asText(null),
              h.path("score").asDouble(0.0))))
          }
        }
      } catch {
        case e: Exception => Left(s"Error calling name resolution (url: $url). Error: $e.")
      }
    }
  }

  /** call_name_resolution's retry contract: up to `retries` re-attempts on
    * failure, then the api_error sentinel (:586-601). sleepMs is
    * injectable so tests don't wait the reference's 5 s. */
  def resolveOne(service: LookupService, name: String, biolinkType: String,
                 retries: Int = 2, sleepMs: Long = 5000): Grounding = {
    var attempt = 0
    var lastError = ""
    while (attempt <= retries) {
      service.lookup(name, biolinkType) match {
        case Right(Some(h)) => return Grounding(name, biolinkType, h.curie, h.label, h.score, null)
        case Right(None) => return Grounding(name, biolinkType, null, null, 0.0, null)
        case Left(err) =>
          lastError = err
          attempt += 1
          if (attempt <= retries && sleepMs > 0) Thread.sleep(sleepMs)
      }
    }
    Grounding(name, biolinkType, null, null, 0.0, lastError)
  }

  /** Distributed grounding: distinct (name, biolink_type) pairs resolved
    * per-partition. Output columns: name, biolink_type, curie, label,
    * score, api_error — null curie + null api_error = clean miss. */
  def ground(df: DataFrame, nameCol: String, typeCol: String,
             service: LookupService, retries: Int = 2,
             sleepMs: Long = 5000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(nameCol).cast("string").as("name"),
        coalesce(col(typeCol).cast("string"), lit("")).as("biolinkType"))
      .filter(col("name").isNotNull)
      .distinct()
      .as[(String, String)]
      .mapPartitions(_.map { case (n, t) => resolveOne(service, n, t, retries, sleepMs) })
      .toDF()
      .select(col("name"), col("biolinkType").as("biolink_type"), col("curie"),
        col("label"), col("score"), col("apiError").as("api_error"))
  }
}
