package graft.sources

import graft.SparkSpec
import java.io.File

/** S6 archive readers: member listing/extraction across tar.gz, tar, gz;
  * parallel staging (ref orion/utils.py:355-432, loadCTD.py:163-183). */
class ArchivesSpec extends SparkSpec {

  private val res = "src/test/resources/parsers"

  test("listMembers on tgz and tar") {
    val tgz = Archives.listMembers(s"$res/ubergraph/nonredundant-graph-table.tgz")
    assert(tgz.toSet == Set(
      "nonredundant-graph-table/node-labels.tsv",
      "nonredundant-graph-table/edge-labels.tsv",
      "nonredundant-graph-table/edges.tsv"))
    val tar = Archives.listMembers(s"$res/gtex/eqtl.tar")
    assert(tar.size == 2 && tar.forall(_.contains("signif")))
  }

  test("extractMembers stages selected members only") {
    val staging = java.nio.file.Files.createTempDirectory("graft-arch-spec-").toString
    val staged = Archives.extractMembers(
      s"$res/ubergraph/nonredundant-graph-table.tgz", staging,
      _.endsWith("edges.tsv"))
    assert(staged.size == 1)
    val lines = scala.io.Source.fromFile(staged.head).getLines().toSeq
    assert(lines.size == 4 && lines.head == "1\t1\t2")
  }

  test("bare .gz decompresses to the member name") {
    val staging = java.nio.file.Files.createTempDirectory("graft-arch-spec-").toString
    val staged = Archives.extractMembers(s"$res/goa/goa_human.gaf.gz", staging)
    assert(staged.size == 1 && staged.head.endsWith("goa_human.gaf"))
    val lines = scala.io.Source.fromFile(staged.head).getLines().toSeq
    assert(lines.count(_.startsWith("!")) == 2)
  }

  test("zip member extraction") {
    // build a zip on the fly (no zip fixture committed), then read it back
    val dir = java.nio.file.Files.createTempDirectory("graft-zip-spec-")
    val zipPath = new File(dir.toFile, "bundle.zip").getPath
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("data/a.tsv"))
    zos.write("x\t1\n".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("data/b.tsv"))
    zos.write("y\t2\n".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    assert(Archives.listMembers(zipPath).toSet == Set("data/a.tsv", "data/b.tsv"))
    val staged = Archives.extractMembers(zipPath, s"$dir/out", _ == "data/b.tsv")
    assert(staged.size == 1)
    assert(scala.io.Source.fromFile(staged.head).mkString == "y\t2\n")
  }

  test("zip-slip / tar-slip: '../' members refuse to escape the staging dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slip-spec-")
    // crafted zip: a member whose path climbs out of the staging root
    val zipPath = new File(dir.toFile, "evil.zip").getPath
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("../../escaped.txt"))
    zos.write("pwned".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val e1 = intercept[IllegalArgumentException](
      Archives.extractMembers(zipPath, s"$dir/out"))
    assert(e1.getMessage.contains("zip-slip"))
    assert(!new File(dir.toFile.getParentFile, "escaped.txt").exists())
    // crafted tar: same traversal through the tar branch
    val tarPath = new File(dir.toFile, "evil.tar").getPath
    val tos = new org.apache.commons.compress.archivers.tar.TarArchiveOutputStream(
      new java.io.FileOutputStream(tarPath))
    val entry = new org.apache.commons.compress.archivers.tar.TarArchiveEntry("../../escaped2.txt")
    val payload = "pwned".getBytes("UTF-8")
    entry.setSize(payload.length)
    tos.putArchiveEntry(entry); tos.write(payload); tos.closeArchiveEntry(); tos.close()
    val e2 = intercept[IllegalArgumentException](
      Archives.extractMembers(tarPath, s"$dir/out2"))
    assert(e2.getMessage.contains("zip-slip"))
    assert(!new File(dir.toFile.getParentFile, "escaped2.txt").exists())
    // in-root relative segments that RESOLVE inside the staging dir stay fine
    val okZip = new File(dir.toFile, "ok.zip").getPath
    val z2 = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(okZip))
    z2.putNextEntry(new java.util.zip.ZipEntry("sub/../inside.txt"))
    z2.write("fine".getBytes("UTF-8")); z2.closeEntry(); z2.close()
    val staged = Archives.extractMembers(okZip, s"$dir/out3")
    assert(scala.io.Source.fromFile(staged.head).mkString == "fine")
  }

  test("stageArchives extracts many archives in parallel tasks") {
    val stagingRoot = java.nio.file.Files.createTempDirectory("graft-stage-spec-").toString
    val staged = Archives.stageArchives(spark,
      Seq(s"$res/gtex/eqtl.tar", s"$res/gtex/sqtl.tar"), stagingRoot,
      _.contains("signif"))
    assert(staged.size == 3) // 2 eqtl tissues + 1 sqtl tissue
    assert(staged.forall(new File(_).exists()))
  }

  test("readDelimitedMember reads straight out of a tar.gz") {
    val df = Archives.readDelimitedMember(spark,
      s"$res/ctd/CTD_chem_gene_ixns_structured.tar.gz",
      "CTD_chem_gene_ixns_structured.tsv", header = false)
    assert(df.count() == 6) // header line + 5 data rows
  }
}
