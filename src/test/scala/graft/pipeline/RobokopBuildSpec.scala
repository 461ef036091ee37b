package graft.pipeline

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** The composed robokop-style build: eight real parsers through ingest →
  * merge → derived KGs → Neo4j/Memgraph CSVs (the benchmark's pipeline
  * entry). */
class RobokopBuildSpec extends SparkSpec {

  test("eight-source build produces bundle, derived KGs, and CSV exports") {
    val out = Files.createTempDirectory("robokop-build-").toString
    val counts = RobokopBuild.run(spark, "src/test/resources/parsers", out)
    assert(counts.nodes > 0 && counts.edges > 0)
    // derived artifacts exist (redundant expands, collapse preserves count)
    assert(counts.redundant >= counts.edges)
    assert(counts.collapsed == counts.edges)
    // bundle + both CSV exports on disk
    assert(Files.exists(Paths.get(out, "nodes.jsonl")))
    assert(Files.exists(Paths.get(out, "qc-results.json")))
    assert(Files.exists(Paths.get(out, "neo4j-nodes", "_header.csv")))
    assert(Files.exists(Paths.get(out, "neo4j-edges", "_header.csv")))
    assert(Files.exists(Paths.get(out, "memgraph-edges", "_manifest.txt")))
    // every source produced a content-versioned build dir
    RobokopBuild.sources.foreach { case (id, _) =>
      assert(Files.isDirectory(Paths.get(out, "sources", id)), id)
    }
  }

  test("shuffled source order yields identical merged-bundle digests") {
    // the MergeEngineSpec ordinal gate lifted to the composed pipeline:
    // first-truthy-wins merge order must derive from the spec's stable
    // source ordinals, never from submission or scan order
    def buildDigest(order: Seq[(String, String)]): (String, String) = {
      val out = Files.createTempDirectory("robokop-det-").toString
      RobokopBuild.run(spark, "src/test/resources/parsers", out, order)
      def digest(file: String): String = {
        val lines = spark.read.textFile(s"$out/$file").collect().sorted
        val md = java.security.MessageDigest.getInstance("SHA-256")
        lines.foreach(l => md.update((l + "\n").getBytes("UTF-8")))
        md.digest().map("%02x".format(_)).mkString
      }
      (digest("nodes.jsonl"), digest("edges.jsonl"))
    }
    val shuffled = new scala.util.Random(7).shuffle(RobokopBuild.sources)
    assert(shuffled != RobokopBuild.sources, "pick a seed that permutes")
    assert(buildDigest(RobokopBuild.sources) === buildDigest(shuffled))
  }
}
