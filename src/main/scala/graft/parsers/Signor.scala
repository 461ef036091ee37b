package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** SIGNOR 3.0 causal-interaction parser.
  *
  * Reference (parsers/SIGNOR/src/loadSIGNOR.py:18-481 +
  * signor_mechanism_predicate_mapping.py):
  *  - node ids: UNIPROT/PUBCHEM/RNAcentral/DRUGBANK databases get curie
  *    prefixes (PUBCHEM sheds its CID: prefix, UniProt sheds -PRO_
  *    region suffixes which become part qualifiers); SIGNOR-database
  *    entities resolve through the phenotype/stimulus catalogs to a GO
  *    term mined from their description, and rows whose endpoints can't
  *    resolve are dropped;
  *  - each row emits: a mechanism edge when the mechanism column is
  *    non-empty (predicate + qualifiers looked up from the EFFECT string
  *    through the PTM table then the mechanism map, mirroring the
  *    reference's argument plumbing), plus one edge per entry of the
  *    effect mapping (up/down-regulation shapes fan out to an RO:0002448
  *    edge and sometimes a second biolink:affects edge), plus a
  *    biolink:related_to fallback when neither applies;
  *  - cell-type/tissue ';'-lists split edges — one edge copy per
  *    anatomical context entry;
  *  - base properties: PMID publication, description, species context
  *    (taxon unless empty/-1), subject/object part qualifiers.
  */
object Signor {

  val provenance = "infores:signor"

  /** PTM effect → object direction (signor_mechanism_predicate_mapping.py:3-29). */
  val ptmDirection: Map[String, String] = Map(
    "acetylation" -> "increased", "ADP-ribosylation" -> "increased",
    "carboxylation" -> "increased", "deacetylation" -> "decreased",
    "degradation" -> "increased", "deglycosylation" -> "decreased",
    "demethylation" -> "decreased", "dephosphorylation" -> "decreased",
    "desumoylation" -> "decreased", "deubiquitination" -> "decreased",
    "glycosylation" -> "increased", "hydroxylation" -> "increased",
    "lipidation" -> "increased", "methylation" -> "increased",
    "monoubiquitination" -> "increased", "neddylation" -> "increased",
    "oxidation" -> "increased", "palmitoylation" -> "increased",
    "phosphorylation" -> "increased", "polyubiquitination" -> "increased",
    "s-nitrosylation" -> "increased", "sumoylation" -> "increased",
    "trimethylation" -> "increased", "tyrosination" -> "increased",
    "ubiquitination" -> "increased")

  /** Edge template: predicate + qualifier columns. */
  private case class Template(predicate: String, qualifiedPredicate: String = null,
                              directionQ: String = null, aspectQ: String = null,
                              mechanismQ: String = null)

  /** Non-PTM mechanism map (signor_mechanism_predicate_mapping.py:31-131).
    * Entries with no predicate fall through to biolink:related_to with the
    * listed qualifiers (mirroring mechanism_map.get(...).get("predicate",
    * related_to)). */
  private val mechanismMap: Map[String, Template] = Map(
    "binding" -> Template("RO:0002436"),
    "catalytic activity" -> Template("RO:0002327"),
    "chemical activation" -> Template("biolink:affects", qualifiedPredicate = "RO:0003303",
      mechanismQ = "chemical activation"),
    "chemical inhibition" -> Template("biolink:affects", qualifiedPredicate = "RO:0003303",
      mechanismQ = "chemical inhibition"),
    "chemical modification" -> Template("biolink:affects", qualifiedPredicate = "RO:0003303",
      aspectQ = "chemical modification"),
    "destabilization" -> Template("biolink:affects", qualifiedPredicate = "RO:0003303",
      directionQ = "decreased", aspectQ = "stability"),
    "gtpase - activating protein" -> Template("biolink:related_to"),
    "guanine nucleotide exchange factor" -> Template("biolink:related_to",
      mechanismQ = "guanyl_nucleotide_exchange"),
    "post transcriptional modification" -> Template("biolink:affects",
      qualifiedPredicate = "RO:0003303", aspectQ = "post transcriptional modification"),
    "post translational modification" -> Template("biolink:affects",
      qualifiedPredicate = "RO:0003303", aspectQ = "post translation modification"),
    "precursor of" -> Template("biolink:related_to"),
    "relocalization" -> Template("biolink:affects", qualifiedPredicate = "RO:0003303",
      aspectQ = "relocation"),
    "small molecule catalysis" -> Template("RO:0002327"),
    "transcriptional regulation" -> Template("biolink:affects",
      qualifiedPredicate = "RO:0003303", mechanismQ = "transcriptional_regulation"),
    "translation regulation" -> Template("biolink:affects", aspectQ = "translation"))

  /** Effect → edge templates (signor_mechanism_predicate_mapping.py:134-231). */
  private val effectMapping: Map[String, Seq[Template]] = {
    def reg(dir: String, aspect: String = null) =
      Template("RO:0002448", directionQ = dir, aspectQ = aspect)
    def affects(dir: String, aspect: String) =
      Template("biolink:affects", qualifiedPredicate = "RO:0003303",
        directionQ = dir, aspectQ = aspect)
    Map(
      "form complex" -> Seq(Template("biolink:in_complex_with"), Template("RO:0002436")),
      "down-regulates" -> Seq(reg("downregulates")),
      "down-regulates activity" -> Seq(reg("downregulates", "activity")),
      "down-regulates quantity" -> Seq(reg("downregulates", "abundance")),
      "down-regulates quantity by destabilization" ->
        Seq(reg("downregulates", "abundance"), affects("decreased", "stability")),
      "down-regulates quantity by repression" ->
        Seq(reg("downregulates", "abundance"), affects("decreased", "expression")),
      "up-regulates" -> Seq(reg("upregulates")),
      "up-regulates activity" -> Seq(reg("upregulates", "activity")),
      "up-regulates quantity" -> Seq(reg("upregulates", "abundance")),
      "up-regulates quantity by stabilization" ->
        Seq(reg("upregulates", "abundance"), affects("increased", "stability")),
      "up-regulates quantity by expression" ->
        Seq(reg("upregulates", "abundance"), affects("increased", "expression")))
  }

  /** database/id → curie (loadSIGNOR.py:281-301). */
  private def fixedCurie(db: Column, id: Column): Column =
    when(db === "PUBCHEM",
        concat(lit("PUBCHEM.COMPOUND:"), regexp_replace(id, "^CID:", "")))
      .when(db === "UNIPROT",
        concat(lit("UniProtKB:"), element_at(split(id, "-PRO_"), 1)))
      .when(db === "RNAcentral", concat(lit("RNACENTRAL:"), id))
      .when(db === "DRUGBANK", concat(lit("DRUGBANK:"), id))

  /** SIGNOR-phenotype/stimulus catalog scan: ';'-delimited quoted CSV,
    * GO:NNNNNNN mined from the description column (loadSIGNOR.py:190-214). */
  private def catalog(spark: SparkSession, path: String, section: String): DataFrame =
    spark.read.option("sep", ";").option("quote", "\"").csv(path)
      .filter(col("_c2").isNotNull) // malformed rows skipped
      .select(lit(section).as("cat_type"), col("_c0").as("cat_id"),
        regexp_extract(col("_c2"), "GO:(\\d{7})", 0).as("go_term"))
      .filter(col("go_term") =!= "")
      .dropDuplicates("cat_type", "cat_id")

  private def templateStruct(t: Template): Column = struct(
    lit(t.predicate).cast("string").as("predicate"),
    lit(t.qualifiedPredicate).cast("string").as("qualified_predicate"),
    lit(t.directionQ).cast("string").as("object_direction_qualifier"),
    lit(t.aspectQ).cast("string").as("object_aspect_qualifier"),
    lit(t.mechanismQ).cast("string").as("causal_mechanism_qualifier"),
    lit(null).cast("string").as("ptm_part_qualifier"),
    lit(false).as("ptm_part_override"))

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    val lookup = broadcast(
      catalog(spark, s"$dir/SIGNOR-phenotype.csv", "phenotype")
        .unionByName(catalog(spark, s"$dir/SIGNOR-stimulus.csv", "stimulus")))

    val raw = spark.read.option("sep", "\t").option("header", "true")
      .option("quote", "\"").csv(s"$dir/signor_latest.tsv")
    val c = raw.columns

    val withLookups = raw
      .join(lookup.select(col("cat_type").as("s_type"), col("cat_id").as("s_id"),
          col("go_term").as("subj_go")),
        col(c(1)) === col("s_type") && col(c(2)) === col("s_id"), "left")
      .join(lookup.select(col("cat_type").as("o_type"), col("cat_id").as("o_id"),
          col("go_term").as("obj_go")),
        col(c(5)) === col("o_type") && col(c(6)) === col("o_id"), "left")
      .withColumn("_subject",
        when(col(c(3)) === "SIGNOR", col("subj_go"))
          .otherwise(fixedCurie(col(c(3)), col(c(2)))))
      .withColumn("_object",
        when(col(c(7)) === "SIGNOR", col("obj_go"))
          .otherwise(fixedCurie(col(c(7)), col(c(6)))))
      .filter(col("_subject").isNotNull && col("_object").isNotNull)

    val effect = coalesce(col(c(8)), lit(""))
    val mechanism = coalesce(col(c(9)), lit(""))
    val aaModified = coalesce(col(c(10)), lit(""))

    // mechanism edge template — keyed on the EFFECT string, PTM table first
    val ptmBranch = ptmDirection.foldLeft(lit(null).cast("string")) {
      case (acc, (k, v)) => when(effect === k, lit(v)).otherwise(acc)
    }
    val mechTemplate = when(ptmBranch.isNotNull, struct(
        lit("biolink:affects").as("predicate"),
        lit("RO:0003303").as("qualified_predicate"),
        ptmBranch.as("object_direction_qualifier"),
        effect.as("object_aspect_qualifier"),
        lit(null).cast("string").as("causal_mechanism_qualifier"),
        when(aaModified =!= "", aaModified).as("ptm_part_qualifier"),
        lit(true).as("ptm_part_override")))
      .otherwise(mechanismMap.foldLeft(templateStruct(Template("biolink:related_to"))) {
        case (acc, (k, t)) => when(effect === k, templateStruct(t)).otherwise(acc)
      })

    val effectTemplates = effectMapping.foldLeft(
        array().cast("array<struct<predicate:string,qualified_predicate:string," +
          "object_direction_qualifier:string,object_aspect_qualifier:string," +
          "causal_mechanism_qualifier:string,ptm_part_qualifier:string," +
          "ptm_part_override:boolean>>")) {
      case (acc, (k, ts)) => when(effect === k, array(ts.map(templateStruct): _*)).otherwise(acc)
    }

    val templates =
      when(mechanism =!= "",
        when(size(effectTemplates) > 0, concat(array(mechTemplate), effectTemplates))
          .otherwise(array(mechTemplate)))
      .otherwise(
        when(size(effectTemplates) > 0, effectTemplates)
          .otherwise(array(templateStruct(Template("biolink:related_to")))))

    val cellTypes = filter(split(coalesce(col(c(13)), lit("")), ";"), x => x =!= "")
    val tissueTypes = filter(split(coalesce(col(c(14)), lit("")), ";"), x => x =!= "")
    val contexts = concat(cellTypes, tissueTypes)

    val partQ = (idx: Int) =>
      when(col(c(if (idx == 0) 3 else 7)) === "UNIPROT" &&
          col(c(if (idx == 0) 2 else 6)).contains("-PRO_"),
        element_at(split(col(c(if (idx == 0) 2 else 6)), "-"), 2))

    val exploded = withLookups
      .withColumn("_tpl", explode(templates))
      .withColumn("_anat", explode_outer(when(size(contexts) > 0, contexts)))

    val edges = exploded.select(
      col("_subject").as(Biolink.Subject),
      col("_tpl.predicate").as(Biolink.Predicate),
      col("_object").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(Biolink.KnowledgeAssertion).as(Biolink.KnowledgeLevel),
      lit(Biolink.ManualAgent).as(Biolink.AgentType),
      array(concat(lit("PMID:"), col(c(21)))).as(Biolink.Publications),
      array(col(c(25))).as("description"),
      when(!coalesce(col(c(12)), lit("")).isin("", "-1"),
        concat(lit("NCBITaxon:"), col(c(12)))).as("species_context_qualifier"),
      partQ(0).as("subject_part_qualifier"),
      // a PTM edge's part qualifier (even when absent) overrides the -PRO_
      // suffix one — dict-merge order in get_basic_edge_properties
      when(col("_tpl.ptm_part_override"), col("_tpl.ptm_part_qualifier"))
        .otherwise(partQ(1)).as("object_part_qualifier"),
      col("_tpl.qualified_predicate").as("qualified_predicate"),
      col("_tpl.object_direction_qualifier").as("object_direction_qualifier"),
      col("_tpl.object_aspect_qualifier").as("object_aspect_qualifier"),
      col("_tpl.causal_mechanism_qualifier").as("causal_mechanism_qualifier"),
      col("_anat").as("anatomical_context_qualifier"))

    val nodes = withLookups.select(col("_subject").as("id"))
      .unionByName(withLookups.select(col("_object").as("id")))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"))
    ExtractedGraph(nodes, edges)
  }
}
