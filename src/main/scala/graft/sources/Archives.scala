package graft.sources

import java.io.{BufferedInputStream, File, FileInputStream, FileOutputStream, InputStream}
import java.util.zip.{GZIPInputStream, ZipFile}
import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S6 — archive member extraction (tar / tar.gz / tgz / zip / bare gz).
  *
  * Reference behavior: tar member lookup + extractfile
  * (parsers/CTD/src/loadCTD.py:163-183, parsers/UberGraph/src/loadUG.py:57-80),
  * zip member streaming + split (orion/utils.py:355-432).
  *
  * Spark-first shape: archives are NOT splittable, so members are staged to
  * a directory once and the staged files are read with the normal scan path
  * (pushdown/pruning intact). At scale the unit of parallelism is the
  * archive — many archives fan out via one task per archive (see
  * [[stageArchives]]); a single giant tar is inherently serial in any
  * engine, which is why the reference splits to chunked files too.
  */
object Archives {

  private def isTar(name: String) = name.endsWith(".tar")
  private def isTarGz(name: String) =
    name.endsWith(".tar.gz") || name.endsWith(".tgz")
  private def isZip(name: String) = name.endsWith(".zip")
  private def isGz(name: String) = name.endsWith(".gz") && !isTarGz(name)

  /** List member names (files only) of a tar/tar.gz/zip archive. */
  def listMembers(archive: String): Seq[String] = {
    val f = new File(archive)
    if (isZip(archive)) {
      val zf = new ZipFile(f)
      try {
        val it = zf.entries()
        val out = Seq.newBuilder[String]
        while (it.hasMoreElements) {
          val e = it.nextElement()
          if (!e.isDirectory) out += e.getName
        }
        out.result()
      } finally zf.close()
    } else if (isTar(archive) || isTarGz(archive)) {
      val in = tarStream(f)
      try {
        Iterator.continually(in.getNextEntry)
          .takeWhile(_ != null)
          .collect { case e: TarArchiveEntry if e.isFile => e.getName }
          .toSeq
      } finally in.close()
    } else Seq(f.getName)
  }

  private def tarStream(f: File): TarArchiveInputStream = {
    val raw = new BufferedInputStream(new FileInputStream(f))
    val in = if (isTarGz(f.getName)) new GZIPInputStream(raw) else raw
    new TarArchiveInputStream(in)
  }

  /** Resolve a member name under the staging dir, refusing names that
    * escape it (zip-slip/tar-slip: a crafted `../../` member must never
    * write outside the staging root — archives are untrusted input). */
  private def safeDest(stagingDir: String, member: String): File = {
    val dest = new File(stagingDir, member)
    val root = new File(stagingDir).getCanonicalPath
    val canon = dest.getCanonicalPath
    if (canon != root && !canon.startsWith(root + File.separator))
      throw new IllegalArgumentException(
        s"archive member escapes the staging dir (zip-slip): '$member'")
    new File(canon) // normalized: in-root '..' segments resolved for the write
  }

  private def copy(in: InputStream, dest: File): Unit = {
    dest.getParentFile.mkdirs()
    val out = new FileOutputStream(dest)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally out.close()
  }

  /** Extract members matching `select` into `stagingDir`, preserving member
    * paths; returns the extracted file paths. Bare `.gz` files are
    * decompressed to the same name minus the suffix. */
  def extractMembers(archive: String, stagingDir: String,
                     select: String => Boolean = _ => true): Seq[String] = {
    val staged = Seq.newBuilder[String]
    val f = new File(archive)
    if (isZip(archive)) {
      val zf = new ZipFile(f)
      try {
        val it = zf.entries()
        while (it.hasMoreElements) {
          val e = it.nextElement()
          if (!e.isDirectory && select(e.getName)) {
            val dest = safeDest(stagingDir, e.getName)
            val in = zf.getInputStream(e)
            try copy(in, dest) finally in.close()
            staged += dest.getPath
          }
        }
      } finally zf.close()
    } else if (isTar(archive) || isTarGz(archive)) {
      val in = tarStream(f)
      try {
        var e = in.getNextEntry
        while (e != null) {
          if (e.isFile && select(e.getName)) {
            val dest = safeDest(stagingDir, e.getName)
            copy(in, dest)
            staged += dest.getPath
          }
          e = in.getNextEntry
        }
      } finally in.close()
    } else if (isGz(archive)) {
      val dest = new File(stagingDir, f.getName.stripSuffix(".gz"))
      val in = new GZIPInputStream(new BufferedInputStream(new FileInputStream(f)))
      try copy(in, dest) finally in.close()
      staged += dest.getPath
    } else {
      val dest = new File(stagingDir, f.getName)
      copy(new FileInputStream(f), dest)
      staged += dest.getPath
    }
    staged.result()
  }

  /** Many-archive staging, one task per archive (the scale path: a corpus
    * of per-source tarballs extracts in parallel across executors; each
    * task writes to a shared staging root, e.g. distributed FS). */
  def stageArchives(spark: SparkSession, archives: Seq[String], stagingRoot: String,
                    select: String => Boolean = _ => true): Seq[String] = {
    if (archives.isEmpty) return Nil
    spark.sparkContext
      .parallelize(archives, math.min(archives.size, spark.sparkContext.defaultParallelism))
      .flatMap { a =>
        val sub = new File(stagingRoot, new File(a).getName + ".d")
        extractMembers(a, sub.getPath, select)
      }
      .collect().toSeq
  }

  /** Extract one member and read it as a delimited DataFrame (S3 scan
    * options: header/comment/sep — orion/extractor.py:26-66). */
  def readDelimitedMember(spark: SparkSession, archive: String, member: String,
                          sep: String = "\t", header: Boolean = true,
                          comment: String = "#"): DataFrame = {
    val staging = java.nio.file.Files.createTempDirectory("graft-archive-").toString
    val staged = extractMembers(archive, staging, _ == member)
    require(staged.nonEmpty, s"member $member not found in $archive")
    graft.extract.Extractor.readDelimited(spark, staged.head, sep, header, comment)
  }
}
