package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Graph registry client (SURVEY §2.9 O4).
  *
  * Reference: orion/graph_registry.py:17-133 — a REST client over
  * `/versions/{id}`, `/graph_metadata/{id}[/{release}]`,
  * `/files/{id}/{release}` plus per-file download-URL resolution from the
  * DCAT distribution entries. The HTTP layer sits behind a [[Transport]]
  * seam (same pattern as Neo4jTools.CommandRunner and the fetch seam):
  * production uses [[HttpTransport]] (java.net.http, streaming download via
  * a temp file + atomic move, mirroring graph_registry.py:106-133); tests
  * use an in-memory transport serving fixture JSON — this engine runs with
  * zero egress, so the live endpoint is exercised only by contract.
  *
  * All client logic — the per-client versions cache (:38-50), the
  * build_version → release_version mapping (:52-58), the 404-vs-error
  * split (:25-40), the missing-manifest inconsistency (:67-79), and the
  * three file-URL fallbacks (direct entry, shared bundle directory,
  * legacy directory-style contentUrl, :80-104) — is pure and covered by
  * GraphRegistrySpec.
  */
object GraphRegistry {

  final case class RegistryError(message: String, cause: Throwable = null)
    extends RuntimeException(message, cause)

  /** GET seam: Some(body) on 200, None on 404, RegistryError otherwise. */
  trait Transport {
    def get(path: String): Option[String]
    def download(url: String, dest: Path): Unit
  }

  /** Production transport over java.net.http. */
  final class HttpTransport(baseUrl: String, timeoutSeconds: Long = 30) extends Transport {
    private val base = baseUrl.stripSuffix("/")
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

    private def send(url: String): java.net.http.HttpResponse[java.io.InputStream] = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
        .header("accept", "application/json").GET().build()
      try client.send(req, java.net.http.HttpResponse.BodyHandlers.ofInputStream())
      catch { case e: Exception => throw RegistryError(s"Could not reach graph registry at $url: $e", e) }
    }

    override def get(path: String): Option[String] = {
      val resp = send(s"$base$path")
      resp.statusCode() match {
        case 200 => Some(new String(resp.body().readAllBytes(), "UTF-8"))
        case 404 => resp.body().close(); None
        case code =>
          resp.body().close() // don't leak the pooled connection on errors
          throw RegistryError(s"Request to $base$path returned HTTP $code")
      }
    }

    override def download(url: String, dest: Path): Unit = {
      val resp = send(url)
      if (resp.statusCode() != 200) {
        resp.body().close()
        throw RegistryError(s"Download of $url returned HTTP ${resp.statusCode()}")
      }
      Option(dest.getParent).foreach(Files.createDirectories(_))
      val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
      val in = resp.body()
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING) finally in.close()
      Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
    }
  }

  final case class VersionRecord(version: String, buildVersion: String,
                                 releaseDate: String, latest: Boolean)
  final case class FileEntry(filePath: String, fileSizeBytes: Long)

  final class Client(transport: Transport) extends SourceResolution.RegistryClient {
    private val mapper = new ObjectMapper()
    private val versionsCache = scala.collection.mutable.Map[String, Seq[VersionRecord]]()

    private def getJson(path: String): Option[JsonNode] =
      transport.get(path).map { body =>
        try mapper.readTree(body)
        catch { case e: Exception =>
          throw RegistryError(s"Response from $path was not valid JSON: $e", e) }
      }

    /** Version records for a graph, cached for the client's lifetime
      * (graph_registry.py:42-50). */
    def getVersions(graphId: String): Seq[VersionRecord] =
      versionsCache.getOrElseUpdate(graphId,
        getJson(s"/versions/$graphId").map { arr =>
          (0 until arr.size()).map { i =>
            val n = arr.get(i)
            VersionRecord(
              Option(n.get("version")).map(_.asText).getOrElse(""),
              Option(n.get("build_version")).map(_.asText).getOrElse(""),
              Option(n.get("release_date")).map(_.asText).getOrElse(""),
              Option(n.get("latest")).exists(_.asBoolean))
          }
        }.getOrElse(Seq.empty))

    /** build_version → release_version via the cached records (:52-58). */
    def releaseVersionForBuildVersion(graphId: String, buildVersion: String): Option[String] =
      getVersions(graphId).find(_.buildVersion == buildVersion).map(_.version)

    /** graph_metadata for a release, or the latest when unversioned; None
      * when the graph/version isn't published (:60-66). */
    def getGraphMetadata(graphId: String, releaseVersion: Option[String] = None): Option[JsonNode] =
      releaseVersion match {
        case Some(v) => getJson(s"/graph_metadata/$graphId/$v")
        case None => getJson(s"/graph_metadata/$graphId")
      }

    /** File manifest; a missing manifest for a resolved version is a
      * registry inconsistency → error, not an empty list (:67-79). */
    def listFiles(graphId: String, releaseVersion: String): Seq[FileEntry] =
      getJson(s"/files/$graphId/$releaseVersion") match {
        case None => throw RegistryError(
          s"Registry lists no file manifest for $graphId/$releaseVersion.")
        case Some(arr) => (0 until arr.size()).map { i =>
          val n = arr.get(i)
          FileEntry(Option(n.get("file_path")).map(_.asText).getOrElse(""),
            Option(n.get("file_size_bytes")).map(_.asLong).getOrElse(0L))
        }
      }

    /** Download URL for one bundle file from the distribution entries, with
      * the reference's three fallbacks (:80-104): an entry naming the file,
      * the bundle directory derived from any listed file, and a legacy
      * directory-style contentUrl. */
    def resolveFileUrl(graphMetadata: JsonNode, filename: String): Option[String] = {
      val dist = Option(graphMetadata.get("distribution")).filterNot(_.isNull).toSeq
        .flatMap(d => (0 until d.size()).map(d.get))
      val contentUrls = dist.flatMap(e => Option(e.get("contentUrl"))
        .filterNot(_.isNull).map(_.asText)).filter(_.nonEmpty)
      def dirOf(u: String): String = {
        val i = u.lastIndexOf('/')
        if (i < 0) u else u.substring(0, i) // python rsplit('/',1)[0] semantics
      }
      contentUrls.find(_.split('/').last == filename)
        .orElse(contentUrls.find(!_.endsWith("/")).map(u => s"${dirOf(u)}/$filename"))
        .orElse(contentUrls.find(_.endsWith("/")).map(_ + filename))
    }

    def downloadFile(graphId: String, filename: String, destinationPath: String,
                     graphMetadata: JsonNode): String = {
      val url = resolveFileUrl(graphMetadata, filename).getOrElse(throw RegistryError(
        s"No distribution.contentUrl found for $graphId; cannot resolve download URL for $filename."))
      transport.download(url, Paths.get(destinationPath))
      destinationPath
    }

    /** SourceResolution seam: map the build_version to its release, fetch
      * metadata, download the bundle triple into destDir. False (not an
      * exception) when the graph/version isn't published — resolution then
      * falls through to `produce`, like the reference's lookup miss. */
    override def fetchBundle(graphId: String, buildVersion: String, destDir: String): Boolean =
      releaseVersionForBuildVersion(graphId, buildVersion) match {
        case None => false
        case Some(release) => getGraphMetadata(graphId, Some(release)) match {
          case None => false
          case Some(meta) =>
            val files = Seq("nodes.jsonl.gz", "edges.jsonl.gz", "graph-metadata.json")
            files.foreach(f => downloadFile(graphId, f, s"$destDir/$f", meta))
            true
        }
      }
  }
}
