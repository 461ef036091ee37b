package graft.pipeline

import graft.SparkSpec
import graft.normalize.Normalizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

class IngestPipelineSpec extends SparkSpec {

  private def loader(src: String, ids: Range, normalized: Boolean) = new IngestPipeline.SourceLoader {
    val sourceId: String = src
    def parse(s: SparkSession): (DataFrame, DataFrame) = {
      import s.implicits._
      val nodes = s.read.json(ids.map(i =>
        s"""{"id":"RAW:$i","name":"n$i","category":["biolink:NamedThing"]}""").toDS())
      val edges = s.read.json(ids.dropRight(1).map(i =>
        s"""{"subject":"RAW:$i","predicate":"raw:linked","object":"RAW:${i + 1}"}""").toDS())
      (nodes, edges)
    }
    override def nodeNormMap(s: SparkSession): Option[DataFrame] =
      if (!normalized) None
      else Some(Normalizer.nodeMapDf(s, ids.map(i =>
        Normalizer.NodeNormEntry(s"RAW:$i", s"NORM:$i", s"name $i")).toSeq))
    override def predicateNormMap(s: SparkSession): Option[DataFrame] =
      if (!normalized) None
      else Some(Normalizer.predicateMapDf(s,
        Seq(Normalizer.PredicateNormEntry("raw:linked", "biolink:related_to"))))
    override def nodeNormMapDefined: Boolean = normalized
  }

  test("runSource: parse→normalize stages recorded, meta sidecar written") {
    val dir = Files.createTempDirectory("ingest").toString
    val r = IngestPipeline.runSource(spark, loader("TESTSRC", 1 to 5, normalized = true), dir)
    assert(r.stages.map(_.stage) == Seq("parsing", "normalization"))
    assert(r.stages.forall(_.status == "stable"))
    assert(r.nodes.count() == 5)
    assert(r.edges.count() == 4)
    assert(r.edges.select("predicate").distinct().head().getString(0) == "biolink:related_to")
    val meta = Files.readString(
      Paths.get(dir, "TESTSRC", r.buildVersion, "TESTSRC.meta.json"))
    assert(meta.contains("\"build_version\""))
    assert(r.buildVersion.length == 16)
  }

  test("content-hash cache: second run skips all stages and reuses parquet") {
    val dir = Files.createTempDirectory("ingest_cache").toString
    val l = loader("CACHED", 1 to 7, normalized = true)
    val first = IngestPipeline.runSource(spark, l, dir)
    assert(first.stages.map(_.stage) == Seq("parsing", "normalization"))
    val second = IngestPipeline.runSource(spark, l, dir)
    assert(second.stages.map(_.stage) == Seq("cached"))
    assert(second.buildVersion == first.buildVersion)
    assert(second.nodes.count() == first.nodes.count())
    assert(second.edges.count() == first.edges.count())
  }

  test("buildGraph: two sources through spec → merged bundle") {
    val spec = GraphSpec(graphId = "TestGraph", graphName = "Test Graph",
      sources = Seq(GraphSource("A"), GraphSource("B")))
    val out = Files.createTempDirectory("build").toString
    val result = IngestPipeline.buildGraph(spark, spec,
      Map("A" -> loader("A", 1 to 10, normalized = true),
          "B" -> loader("B", 6 to 15, normalized = true)),
      out)
    // NORM ids 1..15 with overlap 6..10 merged
    assert(result.nodeCount == 15)
    assert(Files.exists(Paths.get(out, "graph-metadata.json")))
    assert(Files.exists(Paths.get(out, "sources", "A")))
    assert(Files.exists(Paths.get(out, "sources", "B")))
  }

  test("publish: atomic build→release promotion (O5)") {
    val build = Files.createTempDirectory("build_v").toString
    Files.writeString(Paths.get(build, "nodes.jsonl"), "{}\n")
    Files.createDirectory(Paths.get(build, "sub"))
    Files.writeString(Paths.get(build, "sub", "x.json"), "{}")
    val release = build + "_release"
    GraphBundle.publish(build, release)
    assert(Files.exists(Paths.get(release, "nodes.jsonl")))
    assert(Files.exists(Paths.get(release, "sub", "x.json")))
    assert(!Files.exists(Paths.get(release + ".staging")))
    // re-publish overwrites
    Files.writeString(Paths.get(build, "extra.txt"), "v2")
    GraphBundle.publish(build, release)
    assert(Files.exists(Paths.get(release, "extra.txt")))
  }
}
