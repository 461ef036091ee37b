package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.parsers.{CtdChemGene, Hgnc, UberGraph}

/** Parser-pipeline queries over the checked-in source fixtures: the Spark
  * side parses the REAL archives (tar.gz / tgz — exercising the S6 path),
  * the DuckDB oracle re-derives the same edges from the sibling text
  * fixtures, so both the archive readers and the parse semantics sit
  * behind the hash-exact gate.
  *
  * The fixture paths are absolute (the fixtures are part of the repo, not
  * the scale-factor testdata) — the sfDir argument is ignored.
  */
object ParserQueries {

  type Q = (SparkSession, String) => DataFrame

  private val res = sys.env.getOrElse("SPARK_GRAFT_FIXTURES",
    new java.io.File("src/test/resources/parsers").getAbsolutePath)

  /** HGNC gene→family membership edges with publication counts. */
  private val q43: Q = (s, _) => {
    Hgnc.parse(s, s"$res/hgnc/hgnc_complete_set.txt").edges
      .select(col("subject"), col("predicate"), col("object"),
        when(col("publications").isNull, 0).otherwise(size(col("publications")))
          .cast("long").as("n_pubs"))
      .orderBy(col("subject"), col("object"))
  }

  private val q43Sql =
    s"""SELECT hgnc_id AS subject, 'RO:0002350' AS predicate,
              'HGNC.FAMILY:' || gid AS object,
              CAST(CASE WHEN pubmed_id IS NULL OR pubmed_id = '' THEN 0
                   ELSE len(string_split(pubmed_id, '|')) END AS BIGINT) AS n_pubs
       FROM (SELECT hgnc_id, pubmed_id, unnest(string_split(gene_group_id, '|')) AS gid
             FROM read_csv('$res/hgnc/hgnc_complete_set.txt', delim='\t', header=true, all_varchar=true)
             WHERE gene_group_id IS NOT NULL AND gene_group_id <> '')
       ORDER BY subject, object"""

  /** CTD chem-gene edges out of the tar.gz with the evidence gates. */
  private val q44: Q = (s, _) => {
    CtdChemGene.parse(s, s"$res/ctd/CTD_chem_gene_ixns_structured.tar.gz",
        "CTD_chem_gene_ixns_structured.tsv").edges
      .select(col("subject"), col("predicate"), col("object"), col("taxon"),
        size(col("publications")).cast("long").as("n_pubs"))
      .orderBy(col("subject"), col("predicate"), col("object"))
  }

  private val q44Sql = {
    val needs3 = Seq(
      "affects expression of", "increases expression of", "decreases expression of",
      "affects methylation of", "increases methylation of", "decreases methylation of",
      "affects molecular modification of", "increases molecular modification of",
      "decreases molecular modification of").map(s => s"'$s'").mkString(", ")
    val needs2 = Seq("affects splicing of", "increases splicing of", "decreases splicing of")
      .map(s => s"'$s'").mkString(", ")
    s"""WITH raw AS (
         SELECT * FROM read_csv('$res/ctd/CTD_chem_gene_ixns_structured.tsv',
                                delim='\t', header=true, all_varchar=true)),
       good AS (
         SELECT *, len(string_split(PMID, '|')) AS n_pubs FROM raw
         WHERE NOT (coalesce(chemicalID,'') || coalesce(chem_label,'') || coalesce(interaction,'')
                    || coalesce(direction,'') || coalesce(geneID,'') || coalesce(gene_label,'')
                    || coalesce(form,'') || coalesce(taxonID,'') || coalesce(PMID,'') LIKE '%?%')
           AND NOT (len(string_split(PMID, '|')) < 3 AND interaction IN ($needs3))
           AND NOT (len(string_split(PMID, '|')) < 2 AND interaction IN ($needs2))),
       mapped AS (
         SELECT CASE WHEN direction = '->' THEN upper(chemicalID) ELSE upper(geneID) END AS subject,
                CASE regexp_replace('CTD:' || interaction, '[/ ^]', '_', 'g')
                  WHEN 'CTD:decreases_molecular_interaction_with' THEN 'CTD:decreases_molecular_interaction'
                  WHEN 'CTD:increases_molecular_interaction_with' THEN 'CTD:increases_molecular_interaction'
                  WHEN 'CTD:ameliorates' THEN 'biolink:treats_or_applied_or_studied_to_treat'
                  ELSE regexp_replace('CTD:' || interaction, '[/ ^]', '_', 'g') END AS predicate,
                CASE WHEN direction = '->' THEN upper(geneID) ELSE upper(chemicalID) END AS object,
                'NCBITaxon:' || string_split(taxonID, ':')[-1] AS taxon,
                CAST(n_pubs AS BIGINT) AS n_pubs
         FROM good)
       SELECT * FROM mapped ORDER BY subject, predicate, object"""
  }

  /** UberGraph triples resolved through the label tables in the tgz. */
  private val q45: Q = (s, _) => {
    UberGraph.parse(s, s"$res/ubergraph/nonredundant-graph-table.tgz",
        "nonredundant-graph-table").edges
      .select(col("subject"), col("predicate"), col("object"))
      .orderBy(col("subject"), col("predicate"), col("object"))
  }

  private val q45Sql = {
    val base = s"$res/ubergraph/nonredundant-graph-table"
    s"""WITH compress AS (
         SELECT 'n' AS kind, column0 AS id,
                CASE WHEN regexp_matches(column1, '^http://purl\\.obolibrary\\.org/obo/[A-Za-z0-9]+_[^/]+$$')
                     THEN regexp_extract(column1, '^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$$', 1)
                          || ':' || regexp_extract(column1, '^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$$', 2)
                     WHEN column1 LIKE 'http://www.w3.org/2000/01/rdf-schema#%'
                     THEN 'rdfs:' || replace(column1, 'http://www.w3.org/2000/01/rdf-schema#', '')
                     ELSE NULL END AS curie
         FROM read_csv('$base/node-labels.tsv', delim='\t', header=false, all_varchar=true)
         UNION ALL
         SELECT 'e', column0,
                CASE WHEN regexp_matches(column1, '^http://purl\\.obolibrary\\.org/obo/[A-Za-z0-9]+_[^/]+$$')
                     THEN regexp_extract(column1, '^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$$', 1)
                          || ':' || regexp_extract(column1, '^http://purl\\.obolibrary\\.org/obo/([A-Za-z0-9]+)_([^/]+)$$', 2)
                     WHEN column1 LIKE 'http://www.w3.org/2000/01/rdf-schema#%'
                     THEN 'rdfs:' || replace(column1, 'http://www.w3.org/2000/01/rdf-schema#', '')
                     ELSE NULL END
         FROM read_csv('$base/edge-labels.tsv', delim='\t', header=false, all_varchar=true))
       SELECT sn.curie AS subject, pe.curie AS predicate, son.curie AS object
       FROM read_csv('$base/edges.tsv', delim='\t', header=false, all_varchar=true) t
       JOIN compress sn  ON sn.kind = 'n' AND sn.id = t.column0 AND sn.curie IS NOT NULL
       JOIN compress pe  ON pe.kind = 'e' AND pe.id = t.column1 AND pe.curie IS NOT NULL
       JOIN compress son ON son.kind = 'n' AND son.id = t.column2 AND son.curie IS NOT NULL
       ORDER BY subject, predicate, object"""
  }

  /** S1 — the KGX jsonl scan behind the whole ingest plane, oracled:
    * KgxIO.readJsonl (per-file schema inference, gz transparency — the
    * edge file is gzipped) against DuckDB's read_json_auto on the same
    * checked-in fixture. Joins node names onto edges and flattens the
    * nested TRAPI sources array, so inferred arrays, structs, doubles,
    * and absent-field nulls all sit behind the hash. */
  private val q58: Q = (s, _) => {
    val nodes = graft.io.KgxIO.readJsonl(s, Seq(s"$kgxRes/sample_nodes.jsonl"))
    val edges = graft.io.KgxIO.readJsonl(s, Seq(s"$kgxRes/sample_edges.jsonl.gz"))
    val names = nodes.select(col("id"), col("name"))
    edges
      .join(names.withColumnRenamed("id", "subject")
        .withColumnRenamed("name", "subject_name"), Seq("subject"))
      .join(names.withColumnRenamed("id", "object")
        .withColumnRenamed("name", "object_name"), Seq("object"))
      .select(col("subject"), col("predicate"), col("object"),
        col("subject_name"), col("object_name"),
        size(col("sources")).cast("long").as("n_sources"),
        when(col("publications").isNull, 0L)
          .otherwise(size(col("publications"))).cast("long").as("n_pubs"),
        coalesce(col("p_value"), lit(-1.0)).as("p_value"))
      .orderBy(col("subject"), col("predicate"), col("object"))
  }

  // resolved from the working directory (or SPARK_GRAFT_KGX_FIXTURES) at
  // class-load, so the query surface and its DuckDB oracle — which embeds
  // this same absolute path — survive a checkout anywhere
  private val kgxRes = sys.env.getOrElse("SPARK_GRAFT_KGX_FIXTURES",
    new java.io.File("src/test/resources/kgx").getAbsolutePath)

  private val q58Sql =
    s"""WITH n AS (SELECT id, name FROM read_json_auto('$kgxRes/sample_nodes.jsonl')),
       e AS (SELECT * FROM read_json_auto('$kgxRes/sample_edges.jsonl.gz'))
       SELECT e.subject, e.predicate, e.object,
              sn.name AS subject_name, obn.name AS object_name,
              CAST(len(e.sources) AS BIGINT) AS n_sources,
              CAST(CASE WHEN e.publications IS NULL THEN 0
                   ELSE len(e.publications) END AS BIGINT) AS n_pubs,
              CAST(coalesce(e.p_value, -1.0) AS DOUBLE) AS p_value
       FROM e JOIN n sn ON sn.id = e.subject JOIN n obn ON obn.id = e.object
       ORDER BY e.subject, e.predicate, e.object"""

  /** S9 — the annotated-VCF scan oracled on a checked-in SnpEff-style
    * fixture: ANN entries split by ',', fields by '|', effects by '&',
    * multi-gene ids by '-', effect → predicate via the SO map with
    * fallback; a no-ANN row must drop. DuckDB re-derives the same edges
    * with the CASE map generated from the same Scala constant. */
  private val q59: Q = (s, _) => {
    val vcf = s.read.option("sep", "\t").option("comment", "#")
      .schema("CHROM STRING, POS STRING, ID STRING, REF STRING, ALT STRING, " +
        "QUAL STRING, FILTER STRING, INFO STRING")
      .csv(s"$kgxRes/annotated_sample.vcf")
    val (_, edges) = graft.sources.Vcf.annotatedVcfToKgx(vcf)
    edges.select(col("subject"), col("predicate"), col("object"),
        col("snpeff_effect"))
      .orderBy(col("subject"), col("predicate"), col("object"), col("snpeff_effect"))
  }

  private val q59Sql = {
    val cases = graft.sources.Vcf.snpEffSoPredicates.toSeq.sortBy(_._1)
      .map { case (eff, pred) => s"WHEN '$eff' THEN '$pred'" }.mkString(" ")
    s"""WITH raw AS (
         SELECT column2 AS id, column7 AS info
         FROM read_csv('$kgxRes/annotated_sample.vcf', delim='\t',
                       header=false, skip=3, all_varchar=true)),
       a AS (SELECT id, unnest(string_split(regexp_extract(info, 'ANN=([^;]*)', 1), ',')) AS entry
             FROM raw WHERE regexp_extract(info, 'ANN=([^;]*)', 1) <> ''),
       f AS (SELECT id, string_split(entry, '|') AS fl FROM a),
       ef AS (SELECT id, unnest(string_split(fl[2], '&')) AS effect, fl[5] AS genes FROM f),
       g AS (SELECT id, effect, unnest(string_split(genes, '-')) AS gene FROM ef)
       SELECT id AS subject,
              CASE effect $cases
                ELSE '${graft.sources.Vcf.fallbackPredicate}' END AS predicate,
              'ENSEMBL:' || gene AS object, effect AS snpeff_effect
       FROM g ORDER BY subject, predicate, object, snpeff_effect"""
  }

  /** P6 — HGVS conversion oracled: deterministic variants derived from
    * doc_id cover every branch (SNV, ins, single/multi del, '.'-allele
    * dels, symbolic-allele reject, non-numeric chromosome reject,
    * unsupported genome reject, X/Y). The DuckDB twin re-implements the
    * conversion in SQL with the accession CASE generated from the same
    * Scala maps ([[graft.functions.Hgvs.accessionSqlCase]]). */
  private val q60: Q = (s, dir) => {
    import graft.functions.Hgvs
    val m = col("doc_id") % 27
    val a = col("doc_id") % 7
    graft.Tables.documents(s, dir)
      .select(col("doc_id"),
        when(m === 0, "X").when(m === 1, "Y").when(m === 2, "Z")
          .otherwise((m - 2).cast("string")).as("chromosome"),
        (lit(1000L) + col("doc_id")).as("position"),
        when(a === 0, "A").when(a === 1, "AT").when(a === 2, "ATGC")
          .when(a === 3, "AT").when(a === 4, "A").when(a === 5, "ATG")
          .otherwise("AT").as("ref_allele"),
        when(col("doc_id") % 11 === 0, "<DEL>")
          .when(a === 0, "G").when(a === 1, "ATGC").when(a === 2, "AT")
          .when(a === 3, "A").when(a === 4, ".").when(a === 5, ".")
          .otherwise("GC").as("alt_allele"),
        when(col("doc_id") % 4 === 0, "b37").when(col("doc_id") % 4 === 1, "b38")
          .when(col("doc_id") % 4 === 2, "GRCh38").otherwise("hg19").as("genome"))
      .select(col("doc_id"),
        Hgvs.hgvsUdf(col("chromosome"), col("position"),
          col("ref_allele"), col("alt_allele"), col("genome")).as("hgvs"))
      .orderBy(col("doc_id"))
  }

  private val q60Sql = {
    val acc = graft.functions.Hgvs.accessionSqlCase("genome", "chrom_num")
    s"""WITH v AS (
         SELECT doc_id,
           CASE doc_id % 27 WHEN 0 THEN 'X' WHEN 1 THEN 'Y' WHEN 2 THEN 'Z'
                ELSE CAST(doc_id % 27 - 2 AS VARCHAR) END AS chromosome,
           1000 + doc_id AS position,
           CASE doc_id % 7 WHEN 0 THEN 'A' WHEN 1 THEN 'AT' WHEN 2 THEN 'ATGC'
                WHEN 3 THEN 'AT' WHEN 4 THEN 'A' WHEN 5 THEN 'ATG'
                ELSE 'AT' END AS ref_allele,
           CASE WHEN doc_id % 11 = 0 THEN '<DEL>' ELSE
             CASE doc_id % 7 WHEN 0 THEN 'G' WHEN 1 THEN 'ATGC' WHEN 2 THEN 'AT'
                  WHEN 3 THEN 'A' WHEN 4 THEN '.' WHEN 5 THEN '.'
                  ELSE 'GC' END END AS alt_allele,
           CASE doc_id % 4 WHEN 0 THEN 'b37' WHEN 1 THEN 'b38'
                WHEN 2 THEN 'GRCh38' ELSE 'hg19' END AS genome
         FROM documents),
       c AS (
         SELECT *, CASE chromosome WHEN 'X' THEN 23 WHEN 'Y' THEN 24
                     ELSE TRY_CAST(chromosome AS INTEGER) END AS chrom_num,
                length(ref_allele) AS lr, length(alt_allele) AS la
         FROM v),
       r AS (SELECT *, $acc AS ref_chrom FROM c)
       SELECT doc_id,
         CASE
           WHEN chrom_num IS NULL OR ref_chrom IS NULL THEN ''
           WHEN alt_allele LIKE '<%' THEN ''
           WHEN alt_allele = '.' AND lr = 1 THEN ref_chrom || ':g.' || position || 'del'
           WHEN alt_allele = '.' THEN ref_chrom || ':g.' || position || '_' || (position + lr - 1) || 'del'
           WHEN lr = 1 AND la = 1 THEN ref_chrom || ':g.' || position || ref_allele || '>' || alt_allele
           WHEN la > lr AND alt_allele LIKE ref_allele || '%'
             THEN ref_chrom || ':g.' || (position + lr - 1) || '_' || (position + lr)
                  || 'ins' || substring(alt_allele, lr + 1)
           WHEN lr > la AND ref_allele LIKE alt_allele || '%' AND lr - la = 1
             THEN ref_chrom || ':g.' || (position + la) || 'del'
           WHEN lr > la AND ref_allele LIKE alt_allele || '%'
             THEN ref_chrom || ':g.' || (position + la) || '_' || (position + lr - 1) || 'del'
           ELSE '' END AS hgvs
       FROM r ORDER BY doc_id"""
  }

  val defs: Map[String, Q] = Map(
    "q43_hgnc_parse"      -> q43,
    "q44_ctd_chem_gene"   -> q44,
    "q45_ubergraph_parse" -> q45,
    "q58_kgx_jsonl_scan"  -> q58,
    "q59_vcf_scan"        -> q59,
    "q60_hgvs"            -> q60)

  val oracles: Map[String, String] = Map(
    "q43_hgnc_parse"      -> q43Sql,
    "q44_ctd_chem_gene"   -> q44Sql,
    "q45_ubergraph_parse" -> q45Sql,
    "q58_kgx_jsonl_scan"  -> q58Sql,
    "q59_vcf_scan"        -> q59Sql,
    "q60_hgvs"            -> q60Sql)
}
