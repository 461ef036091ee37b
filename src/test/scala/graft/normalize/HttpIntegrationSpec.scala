package graft.normalize

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.BeforeAndAfterAll
import graft.SparkSpec
import graft.pipeline.GraphRegistry

/** Real-HTTP integration coverage for the three production clients that are
  * otherwise seam-tested: NameRes.HttpLookup, GraphRegistry.HttpTransport,
  * and Normalizer.HttpNodeNorm (+ nodeMapFromService end to end). A local
  * com.sun.net.httpserver.HttpServer plays the service — no egress — and
  * request counters assert the REFERENCE retry contracts, not just the
  * happy path: name-res retries twice then yields api_error
  * (orion/normalization.py:586-601); node-norm retries the urllib3
  * status_forcelist with exponential backoff (:379-387); the registry
  * splits 404-vs-error without retrying (orion/graph_registry.py:25-40).
  */
class HttpIntegrationSpec extends SparkSpec with BeforeAndAfterAll {

  private var server: HttpServer = _
  private def baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}"

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def handle(path: String)(h: HttpExchange => Unit): Unit =
    server.createContext(path, (ex: HttpExchange) => h(ex))

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    super.afterAll()
  }

  // ---- NameRes.HttpLookup -------------------------------------------------

  test("name-res 200 with hits: first hit wins; params match the reference shape") {
    val seenQuery = new java.util.concurrent.atomic.AtomicReference[String]()
    handle("/ok/lookup") { ex =>
      seenQuery.set(ex.getRequestURI.getRawQuery)
      respond(ex, 200,
        """[{"curie":"MONDO:0005148","label":"type 2 diabetes","score":812.5},
           {"curie":"MONDO:9999","label":"worse hit","score":1.0}]""")
    }
    val g = NameRes.resolveOne(new NameRes.HttpLookup(s"$baseUrl/ok"),
      "type 2 diabetes", "biolink:Disease", retries = 2, sleepMs = 0)
    assert(g.curie == "MONDO:0005148" && g.label == "type 2 diabetes" && g.score == 812.5)
    assert(g.apiError == null)
    // GET param shape from orion/normalization.py:558-567
    assert(seenQuery.get.contains("string=type+2+diabetes"))
    assert(seenQuery.get.contains("biolink_type=biolink%3ADisease"))
    assert(seenQuery.get.contains("autocomplete=false"))
  }

  test("name-res 200 empty array: clean miss, no retry") {
    val n = new AtomicInteger()
    handle("/empty/lookup") { ex => n.incrementAndGet(); respond(ex, 200, "[]") }
    val g = NameRes.resolveOne(new NameRes.HttpLookup(s"$baseUrl/empty"),
      "unknowable", "", retries = 2, sleepMs = 0)
    assert(g.curie == null && g.apiError == null)
    assert(n.get == 1)
  }

  test("name-res non-200: two retries then the api_error sentinel (normalization.py:586-601)") {
    val n = new AtomicInteger()
    handle("/err/lookup") { ex => n.incrementAndGet(); respond(ex, 500, "boom") }
    val g = NameRes.resolveOne(new NameRes.HttpLookup(s"$baseUrl/err"),
      "anything", "", retries = 2, sleepMs = 0)
    assert(n.get == 3) // initial attempt + 2 retries
    assert(g.curie == null && g.apiError != null && g.apiError.contains("Status code: 500"))
  }

  test("name-res flaky service: failure then success within the retry budget") {
    val n = new AtomicInteger()
    handle("/flaky/lookup") { ex =>
      if (n.incrementAndGet() <= 2) respond(ex, 503, "warming up")
      else respond(ex, 200, """[{"curie":"CHEBI:15365","label":"aspirin","score":9.0}]""")
    }
    val g = NameRes.resolveOne(new NameRes.HttpLookup(s"$baseUrl/flaky"),
      "aspirin", "biolink:ChemicalEntity", retries = 2, sleepMs = 0)
    assert(n.get == 3 && g.curie == "CHEBI:15365" && g.apiError == null)
  }

  test("name-res timeout: slow handler trips the client timeout into api_error") {
    handle("/slow/lookup") { ex => Thread.sleep(3000); respond(ex, 200, "[]") }
    val g = NameRes.resolveOne(new NameRes.HttpLookup(s"$baseUrl/slow", timeoutSeconds = 1),
      "molasses", "", retries = 0, sleepMs = 0)
    assert(g.curie == null && g.apiError != null && g.apiError.contains("Error calling name resolution"))
  }

  // ---- GraphRegistry.HttpTransport ---------------------------------------

  test("registry transport: 200 body, 404 None, other codes raise (graph_registry.py:25-40)") {
    val n = new AtomicInteger()
    handle("/reg/versions/Graph_A") { ex =>
      n.incrementAndGet()
      respond(ex, 200, """[{"version":"1.0.0","build_version":"abc123","release_date":"2026-01-01","latest":true}]""")
    }
    handle("/reg/versions/Gone") { ex => respond(ex, 404, "not found") }
    handle("/reg/versions/Broken") { ex => respond(ex, 500, "oops") }
    val t = new GraphRegistry.HttpTransport(s"$baseUrl/reg")
    assert(t.get("/versions/Graph_A").exists(_.contains("abc123")))
    assert(t.get("/versions/Gone").isEmpty)
    val err = intercept[GraphRegistry.RegistryError](t.get("/versions/Broken"))
    assert(err.getMessage.contains("HTTP 500"))
    // and through the Client: versions parse + per-client cache — the two
    // client calls below must add exactly ONE request over the wire
    val before = n.get
    val client = new GraphRegistry.Client(t)
    assert(client.getVersions("Graph_A").head.buildVersion == "abc123")
    assert(client.releaseVersionForBuildVersion("Graph_A", "abc123").contains("1.0.0"))
    assert(n.get == before + 1)
  }

  test("registry transport download: streams to a temp file then atomic-moves") {
    handle("/reg/files/nodes.jsonl.gz") { ex => respond(ex, 200, "payload-bytes-here") }
    handle("/reg/files/missing.gz") { ex => respond(ex, 404, "") }
    val t = new GraphRegistry.HttpTransport(baseUrl)
    val dest = java.nio.file.Files.createTempDirectory("dl").resolve("sub/nodes.jsonl.gz")
    t.download(s"$baseUrl/reg/files/nodes.jsonl.gz", dest)
    assert(java.nio.file.Files.readString(dest) == "payload-bytes-here")
    assert(!java.nio.file.Files.exists(dest.resolveSibling("nodes.jsonl.gz.tmp")))
    val err = intercept[GraphRegistry.RegistryError](
      t.download(s"$baseUrl/reg/files/missing.gz", dest))
    assert(err.getMessage.contains("HTTP 404"))
  }

  test("registry transport: unreachable host raises RegistryError, not a raw IOException") {
    // a port from the ephemeral range with nothing listening
    val dead = new GraphRegistry.HttpTransport("http://127.0.0.1:1", timeoutSeconds = 1)
    val err = intercept[GraphRegistry.RegistryError](dead.get("/versions/x"))
    assert(err.getMessage.contains("Could not reach graph registry"))
  }

  // ---- Normalizer.HttpNodeNorm + nodeMapFromService -----------------------

  /** get_normalized_nodes response: POISON curies resolve to null (the
    * service's unresolved shape), everything else to a NORM: identity. */
  private def nodeNormBody(curies: Seq[String]): String =
    curies.map { c =>
      if (c.startsWith("POISON")) s""""$c":null"""
      else s""""$c":{"id":{"identifier":"NORM:$c","label":"label-$c"},""" +
        s""""type":["biolink:Gene"],""" +
        s""""equivalent_identifiers":[{"identifier":"$c"},{"identifier":"NORM:$c"}],""" +
        s""""information_content":42.5}"""
    }.mkString("{", ",", "}")

  private def postedCuries(ex: HttpExchange): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(ex.getRequestBody.readAllBytes())
    import scala.jdk.CollectionConverters._
    root.path("curies").elements().asScala.map(_.asText()).toSeq
  }

  test("node-norm POST: reference body shape, parsed entries, unresolved curies omitted") {
    val seenBody = new java.util.concurrent.atomic.AtomicReference[String]()
    handle("/nn1/get_normalized_nodes") { ex =>
      val raw = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      seenBody.set(raw)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val curies = {
        import scala.jdk.CollectionConverters._
        mapper.readTree(raw).path("curies").elements().asScala.map(_.asText()).toSeq
      }
      respond(ex, 200, nodeNormBody(curies))
    }
    val svc = new Normalizer.HttpNodeNorm(s"$baseUrl/nn1", conflation = true, backoffBaseMs = 0)
    val out = svc(Seq("HGNC:1", "HGNC:2", "POISON:x"))
    assert(out.keySet == Set("HGNC:1", "HGNC:2")) // null entry omitted
    assert(out("HGNC:1").norm_id == "NORM:HGNC:1")
    assert(out("HGNC:1").information_content.contains(42.5))
    // body shape from orion/normalization.py:136-144
    assert(seenBody.get.contains("\"conflate\":true"))
    assert(seenBody.get.contains("\"drug_chemical_conflate\":true"))
    assert(seenBody.get.contains("\"description\":false"))
  }

  test("node-norm retry: 503s consume the forcelist budget with backoff, then succeed") {
    val n = new AtomicInteger()
    handle("/nn2/get_normalized_nodes") { ex =>
      if (n.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, nodeNormBody(postedCuries(ex)))
    }
    val svc = new Normalizer.HttpNodeNorm(s"$baseUrl/nn2", retries = 5, backoffBaseMs = 0)
    assert(svc(Seq("HGNC:9")).contains("HGNC:9"))
    assert(n.get == 3)
  }

  test("node-norm: non-forcelist status fails fast; exhausted forcelist raises") {
    val n400 = new AtomicInteger()
    handle("/nn3/get_normalized_nodes") { ex => n400.incrementAndGet(); respond(ex, 400, "bad") }
    val svc3 = new Normalizer.HttpNodeNorm(s"$baseUrl/nn3", retries = 5, backoffBaseMs = 0)
    intercept[RuntimeException](svc3(Seq("X:1")))
    assert(n400.get == 1) // 400 is not in the forcelist → no retry

    val n500 = new AtomicInteger()
    handle("/nn4/get_normalized_nodes") { ex => n500.incrementAndGet(); respond(ex, 500, "down") }
    val svc4 = new Normalizer.HttpNodeNorm(s"$baseUrl/nn4", retries = 2, backoffBaseMs = 0)
    intercept[Normalizer.RetryableNormFailure](svc4(Seq("X:1")))
    assert(n500.get == 3) // initial + 2 retries
  }

  test("nodeMapFromService over live HTTP: distributed partitions normalize end to end") {
    import spark.implicits._
    handle("/nn5/get_normalized_nodes") { ex =>
      respond(ex, 200, nodeNormBody(postedCuries(ex)))
    }
    val curies = (1 to 40).map(i => s"HGNC:$i").toDF("id").repartition(4)
    val svc = new Normalizer.HttpNodeNorm(s"$baseUrl/nn5", backoffBaseMs = 0)
    val map = Normalizer.nodeMapFromService(curies, svc, batchSize = 7)
    assert(map.count() == 40)
    val r = map.filter(org.apache.spark.sql.functions.col("orig_id") === "HGNC:7").head()
    assert(r.getAs[String]("norm_id") == "NORM:HGNC:7")
    assert(r.getSeq[String](r.fieldIndex("category")).toList == List("biolink:Gene"))
  }

  test("nodeMapFromService halving isolates a poison batch over live HTTP") {
    import spark.implicits._
    val requests = new AtomicInteger()
    handle("/nn6/get_normalized_nodes") { ex =>
      requests.incrementAndGet()
      val curies = postedCuries(ex)
      if (curies.exists(_.startsWith("POISON"))) respond(ex, 500, "poisoned batch")
      else respond(ex, 200, nodeNormBody(curies))
    }
    val ids = ((1 to 9).map(i => s"OK:$i") :+ "POISON:1").toDF("id").coalesce(1)
    val svc = new Normalizer.HttpNodeNorm(s"$baseUrl/nn6", retries = 0, backoffBaseMs = 0)
    val out = Normalizer.nodeMapFromService(ids, svc, batchSize = 10)
      .select("orig_id").collect().map(_.getString(0)).toSet
    assert(out == (1 to 9).map(i => s"OK:$i").toSet) // poison fails alone
    assert(requests.get > 1) // halving actually re-requested subsets
  }
}
