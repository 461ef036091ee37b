package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class GraphCsvSinkSpec extends SparkSpec {

  private def tmpDir(name: String) =
    Files.createTempDirectory(name).toString

  private lazy val nodes = {
    import spark.implicits._
    spark.read.json(Seq(
      """{"id":"N:1","name":"node one","category":["biolink:Gene","biolink:NamedThing"],"information_content":84.5,"flagged":true}""",
      """{"id":"N:2","name":null,"category":["biolink:Disease"],"information_content":12.0,"flagged":false}""").toDS())
  }

  private lazy val edges = {
    import spark.implicits._
    spark.read.json(Seq(
      """{"subject":"N:1","predicate":"biolink:affects","object":"N:2","publications":["PMID:1","PMID:2"]}""",
      """{"subject":"N:2","predicate":"biolink:related_to","object":"N:1","publications":[]}""").toDS())
  }

  test("neo4j node CSV: typed header, U+001F arrays, null name falls back to id") {
    val dir = tmpDir("neo4j_nodes")
    GraphCsvSink.writeNeo4jNodes(nodes, dir)
    val header = Files.readString(Paths.get(dir, "_header.csv")).trim
    assert(header.split("\t").toSet ==
      Set("id:ID", "name:string", "category:LABEL", "information_content:float", "flagged:boolean"))
    val rows = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(rows.size == 2)
    val n1 = rows.find(_.contains("N:1")).get
    assert(n1.contains("biolink:Genebiolink:NamedThing"))
    assert(n1.contains("true"))
    val n2 = rows.find(r => r.contains("N:2")).get
    // name column contains the id fallback
    assert(n2.split("\t").count(_ == "N:2") >= 2)
  }

  test("neo4j edge CSV: START_ID/TYPE/END_ID header") {
    val dir = tmpDir("neo4j_edges")
    GraphCsvSink.writeNeo4jEdges(edges, dir)
    val header = Files.readString(Paths.get(dir, "_header.csv")).trim
    assert(header.split("\t").toSet ==
      Set("subject:START_ID", "predicate:TYPE", "object:END_ID", "publications:string[]"))
  }

  test("memgraph edges split by predicate with manifest") {
    val dir = tmpDir("memgraph_edges")
    GraphCsvSink.writeMemgraphEdges(edges, dir)
    val subdirs = Files.list(Paths.get(dir)).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSet
    assert(subdirs == Set("_predicate_dir=biolink_affects", "_predicate_dir=biolink_related_to"))
    val manifest = Files.readString(Paths.get(dir, "_manifest.txt")).trim.split("\n").toSet
    assert(manifest == Set("biolink_affects", "biolink_related_to"))
  }

  test("createMemgraphDump: named bundle files, idempotent re-run") {
    val dir = tmpDir("memgraph_dump")
    GraphCsvSink.createMemgraphDump(nodes, edges, dir, graphId = "TestGraph",
      releaseVersion = "1.0.0")
    val nodesCsv = Paths.get(dir, "memgraph_TestGraph_1.0.0_nodes.csv")
    val cypher = Paths.get(dir, "memgraph_TestGraph_1.0.0_indexes.cypher")
    val edgesDir = Paths.get(dir, "memgraph_TestGraph_1.0.0_edges.csv")
    assert(Files.exists(nodesCsv) && Files.exists(cypher))
    assert(Files.exists(edgesDir.resolve("_manifest.txt")))
    assert(Files.readString(cypher).contains("CREATE INDEX ON :`biolink:Gene`(id);"))
    // re-run: everything skipped (no exception from overwrite, mtimes stable)
    val before = Files.getLastModifiedTime(cypher)
    GraphCsvSink.createMemgraphDump(nodes, edges, dir, graphId = "TestGraph",
      releaseVersion = "1.0.0")
    assert(Files.getLastModifiedTime(cypher) == before)
  }

  test("writeSingleFile produces one gzip jsonl (KGX bundle compat)") {
    val f = java.nio.file.Files.createTempDirectory("single").resolve("nodes.jsonl.gz").toString
    graft.io.KgxIO.writeSingleFile(nodes, f)
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
    val lines = scala.io.Source.fromInputStream(in).getLines().toSeq
    assert(lines.size == 2)
    assert(lines.forall(_.startsWith("{")))
  }

  test("memgraph index cypher: NamedThing name index + per-label id indexes") {
    val cypher = GraphCsvSink.memgraphIndexCypher(nodes)
    assert(cypher.startsWith("CREATE INDEX ON :`biolink:NamedThing`(name);"))
    assert(cypher.contains("CREATE INDEX ON :`biolink:Disease`(id);"))
    assert(cypher.contains("CREATE INDEX ON :`biolink:Gene`(id);"))
  }
}
