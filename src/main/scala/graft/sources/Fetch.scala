package graft.sources

import java.io.{File, FileOutputStream}
import java.net.URL

/** S7 — HTTP/FTP artifact fetching (ref orion/utils.py:197-258
  * pull_via_http and the session-gated/retry variants :260-353).
  *
  * Semantics mirrored: skip when the destination already exists (builds
  * are idempotent per source version), stream in blocks, destination name
  * defaults to the URL's last path segment, failures raise after
  * exhausting retries with exponential backoff.
  *
  * `file://` URLs go through the exact same code path, which is how the
  * zero-egress tests (and local mirrors at scale) exercise it. Fetching
  * is driver-side by design — download once, then the distributed scan
  * reads the staged artifact; for many-source fan-out see
  * Archives.stageArchives for the per-task pattern. */
object Fetch {

  final case class FetchError(url: String, cause: Throwable)
    extends RuntimeException(s"pull failed. URL: $url", cause)

  /** Fetch `url` into `dataDir`, returning bytes read (0 when the file was
    * already present, like the reference's short-circuit). */
  def pullViaUrl(url: String, dataDir: String, savedFileName: Option[String] = None,
                 retries: Int = 3, backoffMs: Long = 500): Long = {
    val name = savedFileName.getOrElse(url.split('/').last)
    val dest = new File(dataDir, name)
    if (dest.exists()) return 0L
    dest.getParentFile.mkdirs()

    var attempt = 0
    while (true) {
      try {
        val conn = new URL(url).openConnection()
        conn.setRequestProperty("User-Agent", "graft/1.0")
        val in = conn.getInputStream
        val tmp = new File(dataDir, name + ".part")
        val out = new FileOutputStream(tmp)
        var total = 0L
        try {
          val buf = new Array[Byte](131072)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); total += n; n = in.read(buf) }
        } finally { out.close(); in.close() }
        // atomic publish: a crashed pull never leaves a half-written artifact
        java.nio.file.Files.move(tmp.toPath, dest.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        return total
      } catch {
        case e: Exception =>
          attempt += 1
          if (attempt > retries) throw FetchError(url, e)
          Thread.sleep(backoffMs * (1L << (attempt - 1)))
      }
    }
    0L // unreachable
  }

  /** Fetch a set of (url, fileName) artifacts; returns names actually
    * downloaded (empty = everything was already staged). */
  def pullAll(urls: Seq[(String, String)], dataDir: String): Seq[String] =
    urls.flatMap { case (url, name) =>
      if (pullViaUrl(url, dataDir, Some(name)) > 0) Some(name) else None
    }
}
