package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** S7 fetcher over file:// URLs (same code path as http(s), zero egress). */
class FetchSpec extends SparkSpec {

  test("pull streams to the url's file name, skips when present") {
    val src = Files.createTempDirectory("fetch-src-")
    val data = "col_a\tcol_b\n1\t2\n"
    Files.writeString(src.resolve("source_data.tsv"), data)
    val dest = Files.createTempDirectory("fetch-dst-").toString
    val url = src.resolve("source_data.tsv").toUri.toString

    val n = Fetch.pullViaUrl(url, dest)
    assert(n == data.getBytes.length)
    assert(Files.readString(java.nio.file.Paths.get(dest, "source_data.tsv")) == data)
    // second pull short-circuits (idempotent builds)
    assert(Fetch.pullViaUrl(url, dest) == 0L)
    // no .part files left behind
    assert(!new java.io.File(dest).listFiles().exists(_.getName.endsWith(".part")))
  }

  test("failure raises FetchError after retries") {
    val dest = Files.createTempDirectory("fetch-dst-").toString
    val e = intercept[Fetch.FetchError] {
      Fetch.pullViaUrl("file:///nonexistent/graft/nope.bin", dest, retries = 1, backoffMs = 1)
    }
    assert(e.url.endsWith("nope.bin"))
  }

  test("pullAll reports only newly-downloaded artifacts") {
    val src = Files.createTempDirectory("fetch-src-")
    Files.writeString(src.resolve("a.txt"), "a")
    Files.writeString(src.resolve("b.txt"), "b")
    val dest = Files.createTempDirectory("fetch-dst-").toString
    val urls = Seq(
      src.resolve("a.txt").toUri.toString -> "a.txt",
      src.resolve("b.txt").toUri.toString -> "b.txt")
    assert(Fetch.pullAll(urls, dest).toSet == Set("a.txt", "b.txt"))
    assert(Fetch.pullAll(urls, dest).isEmpty)
  }
}
