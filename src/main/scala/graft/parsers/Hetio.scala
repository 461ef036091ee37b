package graft.parsers

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** Hetionet parser — a single bz2 JSON document (nodes, edges,
  * kind_to_abbrev) rather than row-per-line.
  *
  * Reference semantics (parsers/hetio/src/loadHetio.py:14-246):
  *  - node kind → curie prefix (Gene→NCBIGene, Compound→DRUGBANK,
  *    Symptom→MESH, Side Effect→UMLS; Pathway / Pharmacologic Class have
  *    no usable ids → edge dropped; other kinds are already curies);
  *  - predicate: `<abbrev(source kind)><abbrev(edge kind)><abbrev(target
  *    kind)>` looked up in the abbrev→curie table, else a generated
  *    `KIND_abbrev` curie; DpS edges sourced from MEDLINE cooccurrence are
  *    dropped (wrong directionality);
  *  - edges whose source maps to an ignored knowledge source
  *    (infores:bgee) are dropped;
  *  - provenance: first source with a known infores → primary ks +
  *    aggregator [infores:hetionet]; otherwise hetionet itself is primary
  *    and the raw source list rides along as `hetio_source`.
  *
  * Spark-first: multiLine JSON scan; `kind_to_abbrev` is a tiny struct
  * collected once to the driver and folded into literal when-chains; the
  * edge array explodes into a distributed DataFrame — no driver loop over
  * edges.
  */
object Hetio {

  val provenance = "infores:hetionet"
  val knowledgeSourceIgnoreList: Set[String] = Set("infores:bgee")

  val abbrevToCurie: Map[String, String] = Map(
    "AuG" -> "RO:0002450", "CuG" -> "RO:0002450", "DuG" -> "RO:0002450",
    "AdG" -> "RO:0002449", "CdG" -> "RO:0002449", "DdG" -> "RO:0002449",
    "AeG" -> "RO:0002292", "CtD" -> "RO:0002606", "CpD" -> "RO:0003307",
    "CcSE" -> "SEMMEDDB:causes", "DaG" -> "hetio:ASSOCIATES_DaG",
    "GiG" -> "RO:0002435", "GrG" -> "RO:0002448", "CbG" -> "RO:0002436",
    "DpS" -> "RO:0002200", "DlA" -> "RO:0004026", "DrD" -> "SO:similar_to",
    "CrC" -> "SO:similar_to", "GcG" -> "RO:0002610", "GpCC" -> "BFO:0000050",
    "GpMF" -> "RO:0002327", "GpBP" -> "RO:0002331")

  val sourceToProvenance: Map[String, String] = Map(
    "Bgee" -> "infores:bgee",
    "LINCS L1000" -> "infores:lincs",
    "SIDER 4.1" -> "infores:sider",
    "TISSUES" -> "infores:tissues-expression-db",
    "II_literature" -> provenance)

  private def curieFor(kind: Column, id: Column): Column =
    when(kind === "Gene", concat(lit("NCBIGene:"), id))
      .when(kind === "Side Effect", concat(lit("UMLS:"), id))
      .when(kind === "Compound", concat(lit("DRUGBANK:"), id))
      .when(kind === "Symptom", concat(lit("MESH:"), id))
      .when(kind.isin("Pathway", "Pharmacologic Class"), lit(null).cast("string"))
      .otherwise(id)

  private def mapLookup(c: Column, m: Map[String, String]): Column =
    m.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(c === k, lit(v)).otherwise(acc)
    }

  def parse(spark: SparkSession, path: String): ExtractedGraph = {
    val doc = spark.read.option("multiLine", "true").json(path)

    // kind_to_abbrev: a struct with one field per kind — tiny, driver-side
    val abbrevRow = doc.select(col("kind_to_abbrev.*")).head()
    val kindToAbbrev = abbrevRow.schema.fieldNames.zipWithIndex
      .map { case (k, i) => k -> abbrevRow.getString(i) }.toMap

    val e = doc.select(explode(col("edges")).as("e")).select(
      col("e.source_id").getItem(0).as("s_kind"),
      col("e.source_id").getItem(1).as("s_id"),
      col("e.target_id").getItem(0).as("t_kind"),
      col("e.target_id").getItem(1).as("t_id"),
      col("e.kind").as("kind"),
      col("e.data").as("data"))

    // data.source (scalar) or data.sources (array)
    val dataFields = e.select(col("data.*")).schema.fieldNames.toSet
    val sources: Column =
      if (dataFields.contains("sources") && dataFields.contains("source"))
        when(col("data.source").isNotNull, array(col("data.source")))
          .otherwise(coalesce(col("data.sources"), array().cast("array<string>")))
      else if (dataFields.contains("sources")) coalesce(col("data.sources"), array().cast("array<string>"))
      else if (dataFields.contains("source"))
        when(col("data.source").isNotNull, array(col("data.source"))).otherwise(array().cast("array<string>"))
      else array().cast("array<string>")

    val abbrev = concat(
      mapLookup(col("s_kind"), kindToAbbrev),
      mapLookup(col("kind"), kindToAbbrev),
      mapLookup(col("t_kind"), kindToAbbrev))

    val provenances = filter(
      transform(sources, s => mapLookup(s, sourceToProvenance)), _.isNotNull)
    val ignored = exists(provenances, p => p.isin(knowledgeSourceIgnoreList.toSeq: _*))
    val medlineDps = (abbrev === "DpS") && array_contains(sources, "MEDLINE cooccurrence")

    val predicate = coalesce(
      mapLookup(abbrev, abbrevToCurie),
      concat(upper(col("kind")), lit("_"), abbrev))

    val withCuries = e
      .withColumn("_sources", sources)
      .withColumn("_subject", curieFor(col("s_kind"), col("s_id")))
      .withColumn("_object", curieFor(col("t_kind"), col("t_id")))
      .filter(col("_subject").isNotNull && col("_object").isNotNull)
      .filter(!ignored)      // ignored knowledge source → row dropped
      .filter(!medlineDps)   // MEDLINE-cooccurrence DpS → dropped
      .withColumn("_pks", try_element_at(provenances, lit(1))) // null when no known source (ANSI-safe)

    val edges = withCuries.select(
      col("_subject").as(Biolink.Subject),
      predicate.as(Biolink.Predicate),
      col("_object").as(Biolink.Object_),
      coalesce(col("_pks"), lit(provenance)).as(Biolink.PrimaryKnowledgeSource),
      when(col("_pks").isNotNull, array(lit(provenance)))
        .otherwise(lit(null).cast("array<string>")).as(Biolink.AggregatorKnowledgeSources),
      when(col("_pks").isNull && size(col("_sources")) > 0, col("_sources"))
        .otherwise(lit(null).cast("array<string>")).as("hetio_source"),
      lit(Biolink.NotProvided).as(Biolink.KnowledgeLevel),
      lit(Biolink.NotProvided).as(Biolink.AgentType))

    val nodes = edges.select(col(Biolink.Subject).as("id"))
      .unionByName(edges.select(col(Biolink.Object_).as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))

    ExtractedGraph(nodes, edges)
  }
}
