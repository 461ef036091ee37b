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
}
