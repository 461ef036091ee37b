package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink
import graft.sources.Archives

/** UberGraph graph-table parser.
  *
  * Reference semantics (parsers/UberGraph/src/loadUG.py:47-110,
  * parsers/UberGraph/src/ubergraph.py:34-67):
  *  - a `.tgz` archive holds `<base>/node-labels.tsv` (node id → IRI),
  *    `<base>/edge-labels.tsv` (edge id → IRI) and `<base>/edges.tsv`
  *    (subject-id, predicate-id, object-id) integer triples;
  *  - IRIs compress to curies via prefix maps; rows whose subject, object
  *    or predicate fail to compress are skipped;
  *  - optional subclass-only filter (`rdfs:subClassOf`);
  *  - every surviving edge gets knowledge_assertion / manual_agent.
  *
  * Spark-first: the reference builds driver-side id→curie dicts; here the
  * label tables are DataFrames joined (broadcast — label tables are the
  * small side) onto the triple table, so the whole conversion is three
  * hash joins and scales with the triple count.
  */
object UberGraph {

  val provenance = "infores:ubergraph"
  val subclassPredicate = "rdfs:subClassOf"

  /** IRI → CURIE. Generic OBO PURL pattern plus the explicit web-standard
    * prefixes; the reference chains biolink + OBO + custom converters
    * (ubergraph.py:7-12,69-81) — the OBO pattern subsumes its custom
    * NCBIGene/HGNC/SGD additions. Null when nothing matches (row skipped). */
  def compressIri(iri: Column): Column = {
    val oboPrefix = regexp_extract(iri, "^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$", 1)
    val oboLocal = regexp_extract(iri, "^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$", 2)
    val explicit: Seq[(String, String)] = Seq(
      "http://www.w3.org/2000/01/rdf-schema#" -> "rdfs",
      "http://www.w3.org/2002/07/owl#" -> "owl",
      "http://www.w3.org/1999/02/22-rdf-syntax-ns#" -> "rdf",
      "http://www.w3.org/2004/02/skos/core#" -> "skos",
      "http://purl.org/dc/terms/" -> "dcterms",
      "http://www.geneontology.org/formats/oboInOwl#" -> "oboInOwl")
    val explicitHit = explicit.foldLeft(lit(null).cast("string")) {
      case (acc, (uri, prefix)) =>
        when(iri.startsWith(uri), concat(lit(prefix), lit(":"), substring_index(iri, uri, -1)))
          .otherwise(acc)
    }
    when(oboPrefix =!= "", concat(oboPrefix, lit(":"), oboLocal)).otherwise(explicitHit)
  }

  final case class Tables(nodeCuries: DataFrame, edgeCuries: DataFrame, triples: DataFrame)

  /** Stage the three member TSVs out of the tgz and load them. */
  def readArchive(spark: SparkSession, archivePath: String, graphBase: String): Tables = {
    val staging = java.nio.file.Files.createTempDirectory("graft-ug-").toString
    val wanted = Set(s"$graphBase/node-labels.tsv", s"$graphBase/edge-labels.tsv", s"$graphBase/edges.tsv")
    val staged = Archives.extractMembers(archivePath, staging, wanted.contains)
    require(staged.size == 3, s"expected 3 members in $archivePath, staged: $staged")
    def tsv(name: String, cols: Seq[String]): DataFrame = {
      val df = spark.read.option("sep", "\t").option("header", "false")
        .csv(s"$staging/$graphBase/$name")
      cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) => d.withColumnRenamed(s"_c$i", c) }
    }
    Tables(
      nodeCuries = tsv("node-labels.tsv", Seq("node_id", "iri"))
        .select(col("node_id"), compressIri(col("iri")).as("curie")),
      edgeCuries = tsv("edge-labels.tsv", Seq("edge_id", "iri"))
        .select(col("edge_id"), compressIri(col("iri")).as("curie")),
      triples = tsv("edges.tsv", Seq("s", "p", "o")))
  }

  def parse(spark: SparkSession, archivePath: String, graphBase: String,
            onlySubclassEdges: Boolean = false): ExtractedGraph = {
    val t = readArchive(spark, archivePath, graphBase)
    val nodeMap = broadcast(t.nodeCuries.filter(col("curie").isNotNull))
    val edgeMap = broadcast(t.edgeCuries.filter(col("curie").isNotNull))

    // inner joins drop rows whose endpoint/predicate failed to compress —
    // the reference's `continue` branches (loadUG.py:71-84)
    val resolved = t.triples
      .join(nodeMap.select(col("node_id").as("s"), col("curie").as(Biolink.Subject)), Seq("s"))
      .join(nodeMap.select(col("node_id").as("o"), col("curie").as(Biolink.Object_)), Seq("o"))
      .join(edgeMap.select(col("edge_id").as("p"), col("curie").as(Biolink.Predicate)), Seq("p"))

    val filtered =
      if (onlySubclassEdges) resolved.filter(col(Biolink.Predicate) === subclassPredicate)
      else resolved

    val edges = filtered.select(
      col(Biolink.Subject), col(Biolink.Predicate), col(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))

    ExtractedGraph(nodes, edges)
  }
}
