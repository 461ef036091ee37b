package graft

import java.nio.file.{Files, Paths}

/** CLI front-door commands (O6), incl. the orion-ingest-shaped `parse`. */
class CliSpec extends SparkSpec {

  test("parse command runs a registered parser to KGX jsonl") {
    val out = Files.createTempDirectory("cli-parse-").toString
    Cli.run(spark, Array("parse", "HGNC", "src/test/resources/parsers/hgnc", out))
    val nodes = spark.read.json(s"$out/source_nodes.jsonl")
    val edges = spark.read.json(s"$out/source_edges.jsonl")
    assert(nodes.count() == 7 && edges.count() == 4)
  }

  test("unknown source and unknown command both fail clearly") {
    intercept[IllegalArgumentException] {
      Cli.run(spark, Array("parse", "NotASource", "/tmp", "/tmp/out"))
    }
    intercept[IllegalArgumentException] { Cli.run(spark, Array("frobnicate")) }
  }
}
