package graft.parsers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType
import graft.extract.Extractor.ExtractedGraph
import graft.model.Biolink

/** LitCoin parser — LLM-extracted literature edges grounded through the
  * "bagel" entity-resolution results and a predicate-mapping service.
  *
  * Reference (parsers/LitCoin/src/loadLitCoin.py:123-506): each jsonl row
  * is one LLM-extracted assertion from one abstract. Grounding calls two
  * services at parse time; both are consumed here through their on-disk
  * response caches — the same seam the reference itself uses for bagel
  * (bagel_cache.json, loadLitCoin.py:572-585) — so the parse stays
  * deterministic and network-free:
  *  - entity grounding: an inline `bagelized_subject`/`bagelized_object`
  *    single-entry object wins ("NA" drops the row); otherwise the row's
  *    (abstract_id, entity name) is looked up in bagel_cache.json and the
  *    best match picked by synonym-type rank (exact > narrow > broad >
  *    related), then min(name_res_rank, sapbert_rank) (bagel.py:75-108);
  *  - predicate mapping: pred_mappings.jsonl rows
  *    {subject, object, relationship → predicate, negated} stand in for
  *    the mapping service's top_choice; unmapped rows drop
  *    (loadLitCoin.py:78-120,276-289).
  * Rows missing their abstract (joined on pmid) or any required LLM field
  * drop. Each surviving row emits the grounded edge (llm_* provenance
  * props, abstract title/text, publications) plus a PMID node and two
  * IAO:0000142 (mentions) edges to the endpoints.
  *
  * The LitCoinBagelService variant differs only in which backend filled
  * the bagel cache — the parse is identical. */
object LitCoin {

  val provenance = "infores:litcoin"
  val mentionsPredicate = "IAO:0000142"

  private val bagelEntryType = DataType.fromDDL(
    "map<string, struct<name: string, synonym_type: string>>")
  private val bagelCacheType = DataType.fromDDL(
    "map<string, struct<abstract: string, terms: map<string, map<string, " +
      "struct<name: string, synonym_type: string, name_res_rank: int, sapbert_rank: int>>>>>")
  private val abstractsType = DataType.fromDDL(
    "map<string, struct<pmid: string, title: string, abstract: string, journal_name: string>>")

  private def wholeFile(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)

  /** bagel result set → best match (bagel.py:75-108): synonym-type tier,
    * then min(name_res_rank, sapbert_rank); ties break on curie. */
  private def bestMatch(results: Column): Column = {
    val tiers = map_from_arrays(
      array(lit("exact"), lit("narrow"), lit("broad"), lit("related")),
      array(lit(0), lit(1), lit(2), lit(3)))
    val ranked = transform(
      filter(map_entries(results),
        e => map_contains_key(tiers, e.getField("value").getField("synonym_type"))),
      e => struct(
        element_at(tiers, e.getField("value").getField("synonym_type")).as("tier"),
        least(coalesce(e.getField("value").getField("name_res_rank"), lit(1000)),
          coalesce(e.getField("value").getField("sapbert_rank"), lit(1000))).as("rank"),
        e.getField("key").as("id"),
        e.getField("value").getField("name").as("name"),
        e.getField("value").getField("synonym_type").as("synonym_type")))
    when(results.isNotNull && !map_contains_key(results, "error") && size(ranked) > 0,
      element_at(array_sort(ranked), 1))
  }

  def parse(spark: SparkSession, dir: String): ExtractedGraph = {
    val abstracts = broadcast(wholeFile(spark, s"$dir/abstracts_CompAndHeal.json")
      .select(explode(from_json(col("value"), abstractsType)))
      .select(col("value.pmid").as("ab_pmid"), col("value.title").as("ab_title"),
        col("value.abstract").as("ab_text"), col("value.journal_name").as("ab_journal"))
      .dropDuplicates("ab_pmid"))

    // bagel cache → (abstract_id, entity_name) → best match
    val cachePath = new java.io.File(s"$dir/bagel_cache.json")
    val bagelCache =
      if (!cachePath.exists) {
        spark.emptyDataFrame
          .withColumn("bc_abstract", lit(null).cast("string"))
          .withColumn("bc_entity", lit(null).cast("string"))
          .withColumn("bc_match", lit(null).cast(
            "struct<tier:int,rank:int,id:string,name:string,synonym_type:string>"))
      } else broadcast(wholeFile(spark, cachePath.getPath)
        .select(explode(from_json(col("value"), bagelCacheType)).as(Seq("bc_abstract", "entry")))
        .select(col("bc_abstract"), explode(col("entry.terms")).as(Seq("bc_entity", "results")))
        .select(col("bc_abstract"), col("bc_entity"), bestMatch(col("results")).as("bc_match"))
        .filter(col("bc_match").isNotNull))

    val predMappings = broadcast(spark.read.json(s"$dir/pred_mappings.jsonl")
      .select(col("subject").as("pm_subject"), col("object").as("pm_object"),
        col("relationship").as("pm_relationship"),
        col("predicate").as("pm_predicate"), col("negated").as("pm_negated")))

    val lines = spark.read.text(s"$dir/litcoin_latest.jsonl")
      .filter(length(trim(col("value"))) > 0)
    def jstr(field: String): Column = get_json_object(col("value"), s"$$.$field")

    val llmProps = Seq("abstract_id", "abstract_span", "assertion_id", "assertion_span",
      "subject", "subject_type", "subject_qualifier", "object", "object_type",
      "object_qualifier", "relationship", "statement_qualifier")

    val parsed = lines.select(Seq(
      jstr("abstract_id").as("abstract_id"),
      jstr("subject").as("subject_name"),
      jstr("object").as("object_name"),
      jstr("relationship").as("relationship"),
      jstr("bagelized_subject").as("bagel_subj_raw"),
      jstr("bagelized_object").as("bagel_obj_raw"),
      from_json(jstr("bagelized_subject"), bagelEntryType).as("bagel_subj"),
      from_json(jstr("bagelized_object"), bagelEntryType).as("bagel_obj")) ++
      llmProps.map(p => jstr(p).as(s"llm_$p")): _*)
      // required-field gate (loadLitCoin.py:60-66,375-387)
      .filter(col("llm_subject").isNotNull && col("llm_subject_type").isNotNull &&
        col("llm_object").isNotNull && col("llm_object_type").isNotNull &&
        col("llm_relationship").isNotNull)
      // an explicit "NA" grounding drops the row
      .filter(coalesce(col("bagel_subj_raw"), lit("")) =!= "NA" &&
        coalesce(col("bagel_obj_raw"), lit("")) =!= "NA")

    // inline bagelized entry (popitem → last entry) beats the cache lookup
    def inlineEntry(m: Column): Column = {
      val e = element_at(map_entries(m), -1)
      when(m.isNotNull && size(map_entries(m)) > 0, struct(
        e.getField("key").as("id"),
        e.getField("value").getField("name").as("name"),
        e.getField("value").getField("synonym_type").as("synonym_type")))
    }
    def cacheMatch(c: Column): Column = struct(
      c.getField("id").as("id"), c.getField("name").as("name"),
      c.getField("synonym_type").as("synonym_type"))

    val grounded = parsed
      .join(abstracts, col("abstract_id") === col("ab_pmid"))
      .join(bagelCache.withColumnsRenamed(Map(
          "bc_abstract" -> "s_ab", "bc_entity" -> "s_ent", "bc_match" -> "s_match")),
        col("abstract_id") === col("s_ab") && col("subject_name") === col("s_ent"), "left")
      .join(bagelCache.withColumnsRenamed(Map(
          "bc_abstract" -> "o_ab", "bc_entity" -> "o_ent", "bc_match" -> "o_match")),
        col("abstract_id") === col("o_ab") && col("object_name") === col("o_ent"), "left")
      .withColumn("subj",
        coalesce(inlineEntry(col("bagel_subj")), cacheMatch(col("s_match"))))
      .withColumn("obj",
        coalesce(inlineEntry(col("bagel_obj")), cacheMatch(col("o_match"))))
      .filter(col("subj.id").isNotNull && col("obj.id").isNotNull)
      .join(predMappings,
        col("subject_name") === col("pm_subject") && col("object_name") === col("pm_object") &&
          col("relationship") === col("pm_relationship"))
      .withColumn("pubmed_id", concat(lit("PMID:"), col("abstract_id")))
      .localCheckpoint()

    val assertionEdges = grounded.select(Seq(
      col("subj.id").as(Biolink.Subject),
      col("pm_predicate").as(Biolink.Predicate),
      col("obj.id").as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      array(col("pubmed_id")).as(Biolink.Publications),
      col("pm_negated").as(Biolink.Negated),
      col("subj.synonym_type").as("subject_bagel_syn_type"),
      col("obj.synonym_type").as("object_bagel_syn_type"),
      col("ab_title").as("abstract_title"),
      col("ab_text").as("abstract_text")) ++
      llmProps.map(p => col(s"llm_$p")): _*)

    def mention(target: Column) = grounded.select(Seq(
      col("pubmed_id").as(Biolink.Subject),
      lit(mentionsPredicate).as(Biolink.Predicate),
      target.as(Biolink.Object_),
      lit(provenance).as(Biolink.PrimaryKnowledgeSource),
      lit(null).cast("array<string>").as(Biolink.Publications),
      lit(null).cast("boolean").as(Biolink.Negated),
      lit(null).cast("string").as("subject_bagel_syn_type"),
      lit(null).cast("string").as("object_bagel_syn_type"),
      lit(null).cast("string").as("abstract_title"),
      lit(null).cast("string").as("abstract_text")) ++
      llmProps.map(p => lit(null).cast("string").as(s"llm_$p")): _*)
    val edges = assertionEdges
      .unionByName(mention(col("subj.id")))
      .unionByName(mention(col("obj.id")))

    val entityNodes = grounded.select(col("subj.id").as("id"), col("subj.name").as("name"))
      .unionByName(grounded.select(col("obj.id").as("id"), col("obj.name").as("name")))
      .dropDuplicates("id")
      .select(col("id"), col("name"), array(lit(Biolink.NamedThing)).as("category"),
        lit(null).cast("string").as("abstract_text"),
        lit(null).cast("string").as("journal"))
    val pubmedNodes = grounded
      .select(col("pubmed_id").as("id"), col("ab_text"), col("ab_journal"))
      .dropDuplicates("id")
      .select(col("id"), lit(null).cast("string").as("name"),
        array(lit(Biolink.NamedThing)).as("category"),
        col("ab_text").as("abstract_text"), col("ab_journal").as("journal"))
    ExtractedGraph(entityNodes.unionByName(pubmedNodes), edges)
  }
}
