package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.{Files, Path}

/** GraphRegistry client against an in-memory transport serving fixture
  * JSON — the version cache, build→release mapping, manifest
  * inconsistency, the three file-URL fallbacks, and the fetchBundle
  * integration with SourceResolution's seam. */
class GraphRegistrySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Records GETs; serves canned bodies; "downloads" by writing the url. */
  private class FakeTransport(routes: Map[String, String]) extends GraphRegistry.Transport {
    val gets = scala.collection.mutable.ArrayBuffer[String]()
    val downloads = scala.collection.mutable.ArrayBuffer[(String, Path)]()
    override def get(path: String): Option[String] = { gets += path; routes.get(path) }
    override def download(url: String, dest: Path): Unit = {
      downloads += (url -> dest)
      Option(dest.getParent).foreach(Files.createDirectories(_))
      Files.writeString(dest, url)
    }
  }

  private val versionsJson =
    """[{"version":"v2.0","build_version":"bv-2","release_date":"2026-02-01","latest":true},
        {"version":"v1.0","build_version":"bv-1","release_date":"2025-06-01","latest":false}]"""

  test("versions are fetched once per client and mapped build->release") {
    val t = new FakeTransport(Map("/versions/robokop" -> versionsJson))
    val c = new GraphRegistry.Client(t)
    assert(c.getVersions("robokop").map(_.version) === Seq("v2.0", "v1.0"))
    assert(c.getVersions("robokop").head.latest)
    assert(c.releaseVersionForBuildVersion("robokop", "bv-1") === Some("v1.0"))
    assert(c.releaseVersionForBuildVersion("robokop", "bv-9") === None)
    assert(t.gets.count(_ == "/versions/robokop") === 1) // cached
    // unknown graph: 404 -> empty list, not an error
    assert(new GraphRegistry.Client(new FakeTransport(Map.empty)).getVersions("nope").isEmpty)
  }

  test("missing file manifest for a resolved version is an error, metadata 404 is None") {
    val t = new FakeTransport(Map("/graph_metadata/g" -> """{"x":1}"""))
    val c = new GraphRegistry.Client(t)
    assert(c.getGraphMetadata("g").isDefined)
    assert(c.getGraphMetadata("g", Some("v9")) === None)
    intercept[GraphRegistry.RegistryError] { c.listFiles("g", "v9") }
    val bad = new GraphRegistry.Client(new FakeTransport(Map("/versions/g" -> "not json")))
    intercept[GraphRegistry.RegistryError] { bad.getVersions("g") }
  }

  test("file-url resolution: direct entry, derived directory, legacy directory") {
    val c = new GraphRegistry.Client(new FakeTransport(Map.empty))
    def meta(urls: String*) = mapper.readTree(
      s"""{"distribution":[${urls.map(u => s"""{"contentUrl":"$u"}""").mkString(",")}]}""")
    // 1: an entry pointing directly at the file wins
    assert(c.resolveFileUrl(meta("http://x/g/v1/nodes.jsonl.gz", "http://x/g/v1/edges.jsonl.gz"),
      "edges.jsonl.gz") === Some("http://x/g/v1/edges.jsonl.gz"))
    // 2: unlisted file (schema.json) shares the bundle directory
    assert(c.resolveFileUrl(meta("http://x/g/v1/nodes.jsonl.gz"), "schema.json") ===
      Some("http://x/g/v1/schema.json"))
    // 3: legacy single directory-style entry
    assert(c.resolveFileUrl(meta("http://x/g/v1/"), "nodes.jsonl.gz") ===
      Some("http://x/g/v1/nodes.jsonl.gz"))
    // no distribution at all
    assert(c.resolveFileUrl(mapper.readTree("{}"), "nodes.jsonl.gz") === None)
  }

  test("fetchBundle downloads the bundle triple for a published build_version") {
    val dest = Files.createTempDirectory("reg-").toString
    val metaJson = """{"distribution":[{"contentUrl":"http://x/g/v1/nodes.jsonl.gz"}]}"""
    val t = new FakeTransport(Map(
      "/versions/g" -> """[{"version":"v1","build_version":"bv","latest":true}]""",
      "/graph_metadata/g/v1" -> metaJson))
    val c = new GraphRegistry.Client(t)
    assert(c.fetchBundle("g", "bv", dest))
    assert(t.downloads.map(_._1) === Seq(
      "http://x/g/v1/nodes.jsonl.gz", "http://x/g/v1/edges.jsonl.gz",
      "http://x/g/v1/graph-metadata.json"))
    assert(Files.exists(java.nio.file.Paths.get(dest, "graph-metadata.json")))
    // unpublished build_version: a miss, not an error (resolution falls
    // through to produce)
    assert(!c.fetchBundle("g", "bv-unknown", dest))
  }
}
