package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Biolink

/** VCF scan + sequence-variant supplementation plumbing (SURVEY §2.1 S9,
  * §2.8 D5). Reference: orion/supplementation.py:156-262.
  *
  * The SnpEff subprocess itself is driver-side orchestration (a JVM the
  * reference shells out to; not available in this sandbox) — `runSnpEffStub`
  * marks the seam. Everything around it — VCF write from variant nodes,
  * annotated-VCF parse into variant→gene edges — is distributed Spark.
  */
object Vcf {

  /** SnpEff effect → predicate map (ref SNPEFF_SO_PREDICATES :25-52). */
  val snpEffSoPredicates: Map[String, String] = Map(
    "3_prime_UTR_variant" -> "biolink:is_non_coding_variant_of",
    "5_prime_UTR_premature_start_codon_gain_variant" -> "biolink:is_non_coding_variant_of",
    "5_prime_UTR_variant" -> "biolink:is_non_coding_variant_of",
    "conservative_inframe_deletion" -> "SO:0001825",
    "conservative_inframe_insertion" -> "SO:0001823",
    "disruptive_inframe_deletion" -> "SO:0001826",
    "disruptive_inframe_insertion" -> "SO:0001824",
    "downstream_gene_variant" -> "biolink:is_nearby_variant_of",
    "frameshift_variant" -> "SO:0001589",
    "initiator_codon_variant" -> "SO:0001583",
    "intergenic_region" -> "biolink:is_nearby_variant_of",
    "conserved_intergenic_region" -> "biolink:is_nearby_variant_of",
    "intragenic_variant" -> "biolink:is_non_coding_variant_of",
    "intron_variant" -> "biolink:is_non_coding_variant_of",
    "missense_variant" -> "SO:0001583",
    "non_coding_transcript_exon_variant" -> "biolink:is_non_coding_variant_of",
    "non_coding_transcript_variant" -> "biolink:is_non_coding_variant_of",
    "splice_acceptor_variant" -> "SO:0001629",
    "splice_donor_variant" -> "SO:0001629",
    "splice_region_variant" -> "SO:0001629",
    "start_lost" -> "SO:0001589",
    "start_retained_variant" -> "SO:0001819",
    "stop_gained" -> "SO:0002054",
    "stop_lost" -> "SO:0001589",
    "synonymous_variant" -> "SO:0001819",
    "upstream_gene_variant" -> "biolink:is_nearby_variant_of")

  val fallbackPredicate = "biolink:genetically_associated_with"
  val snpEffProvenance = "infores:snpeff"

  /** D5a — variant nodes → VCF lines (ref create_vcf_from_variant_nodes
    * :227-262): robokop_variant_id `HGVS:...|chrom|pos|...|ref|alt` becomes
    * a VCF row; empty alleles get the N-padding treatment. */
  def variantNodesToVcf(nodes: DataFrame): DataFrame = {
    val p = split(split(col("robokop_variant_id"), ":", 2).getItem(1), "\\|")
    nodes
      .filter(array_contains(col("category"), "biolink:SequenceVariant"))
      .filter(col("robokop_variant_id").isNotNull)
      .select(col("id"), p.getItem(1).as("chrom"),
        p.getItem(2).cast("long").as("pos"),
        p.getItem(4).as("ref"), p.getItem(5).as("alt"))
      .select(
        col("chrom").as("CHROM"),
        when(col("ref") === "" || col("alt") === "", col("pos"))
          .otherwise(col("pos") + 1).cast("string").as("POS"),
        col("id").as("ID"),
        when(col("ref") === "", "N")
          .when(col("alt") === "", concat(lit("N"), col("ref")))
          .otherwise(col("ref")).as("REF"),
        when(col("ref") === "", concat(lit("N"), col("alt")))
          .when(col("alt") === "", "N")
          .otherwise(col("alt")).as("ALT"),
        lit("").as("QUAL"), lit("PASS").as("FILTER"), lit("").as("INFO"))
  }

  /** Write a CHROM..INFO frame as ONE headered tab-separated VCF file —
    * the shape the SnpEff subprocess consumes. Single-file is inherent
    * to this seam (the reference hands one path to one subprocess,
    * ref :107-109); the surrounding transforms stay distributed. */
  def writeVcfFile(vcf: DataFrame, file: String): Unit = {
    val tmp = file + ".spark-tmp"
    // SnpEff consumes RAW tab-separated text: CSV quoting/escaping of a
    // field containing a quote would corrupt the file, so quoting is
    // disabled outright and the only characters that could break the
    // line/field framing are stripped defensively first. Exception: the
    // ID column is the join key matching supplemental edges back to
    // variant nodes — rewriting it would silently drop every edge for
    // that variant after the SnpEff round-trip, so a framed id fails the
    // write loudly instead (raise_error evaluates inside the write job:
    // no extra scan)
    val sanitized = vcf.columns.foldLeft(vcf)((df, c) =>
      if (c == "ID")
        df.withColumn(c, when(col(c).rlike("[\\t\\r\\n]"),
          raise_error(concat(
            lit("variant id contains tab/CR/LF framing characters " +
              "(would mutate the supplemental-edge join key): "), col(c))))
          .otherwise(col(c)))
      else df.withColumn(c, regexp_replace(col(c), "[\\t\\r\\n]+", " ")))
    sanitized.coalesce(1).write.mode("overwrite")
      .option("sep", "\t").option("emptyValue", "")
      .option("quote", "\u0000").csv(tmp) // NUL quote char = quoting off
    val dest = new java.io.File(file)
    if (dest.exists()) dest.delete()
    val out = new java.io.FileOutputStream(dest)
    try {
      out.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n".getBytes("UTF-8"))
      new java.io.File(tmp).listFiles().filter(_.getName.startsWith("part-"))
        .foreach(p => java.nio.file.Files.copy(p.toPath, out))
    } finally out.close()
    val dir = new java.io.File(tmp)
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  /** Scan an annotated VCF file back as the CHROM..INFO frame
    * (header/comment lines dropped) — distributed, schema-pinned. */
  def readAnnotatedVcf(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("comment", "#")
      .schema("CHROM STRING, POS STRING, ID STRING, REF STRING, ALT STRING, " +
        "QUAL STRING, FILTER STRING, INFO STRING")
      .csv(path)

  /** D5 END-TO-END orchestration (ref run_supplementation :85-118 +
    * run_snpeff :135-154): variant nodes → `variants.vcf` on disk → the
    * SnpEff jar through the pluggable [[graft.io.Neo4jTools.CommandRunner]]
    * (the subprocess's stdout IS the annotated VCF, exactly the
    * reference's redirect) → `variants_ann.vcf` → distributed scan →
    * supplemental KGX (nodes, edges). A non-zero exit raises with the
    * subprocess stderr, mirroring SupplementationFailedError. */
  def supplement(spark: SparkSession, variantNodes: DataFrame, workDir: String,
                 runner: graft.io.Neo4jTools.CommandRunner,
                 referenceGenome: String = "GRCh38.99",
                 udDistance: Int = 100000): (DataFrame, DataFrame) = {
    new java.io.File(workDir).mkdirs()
    val vcfPath = s"$workDir/variants.vcf"
    writeVcfFile(variantNodesToVcf(variantNodes), vcfPath)
    val annotatedPath = s"$workDir/variants_ann.vcf"
    val res = runner.run(Seq("java", "-Xmx12g", "-jar", "snpEff.jar", "-noStats",
      "-ud", udDistance.toString, referenceGenome, vcfPath), cwd = Some(workDir))
    if (res.exitCode != 0)
      throw new IllegalStateException(
        s"SNPEFF subprocess error (ExitCode ${res.exitCode}): ${res.stderr}")
    java.nio.file.Files.write(java.nio.file.Paths.get(annotatedPath),
      res.stdout.getBytes("UTF-8"))
    annotatedVcfToKgx(readAnnotatedVcf(spark, annotatedPath))
  }

  /** The SnpEff subprocess seam: in production this writes the VCF, invokes
    * `java -Xmx12g -jar snpEff.jar` (ref :135-154) and returns the annotated
    * path. STUB here — annotates every variant with a deterministic fake
    * intron_variant annotation so the downstream parse is exercisable. */
  def runSnpEffStub(vcf: DataFrame): DataFrame =
    vcf.withColumn("INFO", concat(lit("ANN=A|intron_variant|MODIFIER|GENE"),
      abs(xxhash64(col("ID"))) % 1000, lit("|ENSG"),
      lpad((abs(xxhash64(col("ID"))) % 1000).cast("string"), 11, "0"),
      lit("|transcript|T1|protein_coding|1/1|c.1A>G|||||123|")))

  /** S9 — parse an annotated VCF DataFrame (CHROM..INFO columns) into
    * variant→gene edges + gene nodes (ref convert_snpeff_to_kgx :156-221):
    * ANN entries split by ',', fields by '|', effects by '&', gene ids by
    * '-'; effect → predicate via the SO map with fallback. */
  def annotatedVcfToKgx(vcf: DataFrame): (DataFrame, DataFrame) = {
    val predMap = typedLit(snpEffSoPredicates)
    val anns = vcf
      .filter(!col("ID").startsWith("#"))
      .withColumn("_ann", regexp_extract(col("INFO"), "ANN=([^;]*)", 1))
      .filter(col("_ann") =!= "")
      .select(col("ID").as("variant_id"), explode(split(col("_ann"), ",")).as("_a"))
      .withColumn("_f", split(col("_a"), "\\|"))
      .select(col("variant_id"),
        explode(split(col("_f").getItem(1), "&")).as("effect"),
        col("_f").getItem(4).as("_genes"),
        col("_f").getItem(14).as("_distance"))
      .select(col("variant_id"), col("effect"),
        explode(split(col("_genes"), "-")).as("gene_id"),
        col("_distance"))
    val edges = anns.select(
      col("variant_id").as(Biolink.Subject),
      coalesce(element_at(predMap, col("effect")), lit(fallbackPredicate)).as(Biolink.Predicate),
      concat(lit("ENSEMBL:"), col("gene_id")).as(Biolink.Object_),
      lit(snpEffProvenance).as(Biolink.PrimaryKnowledgeSource),
      lit("prediction").as("knowledge_level"),
      lit("computational_model").as("agent_type"),
      col("effect").as("snpeff_effect"),
      when(col("_distance").rlike("^-?[0-9]+$"), col("_distance").cast("long"))
        .as("distance_to_feature"))
    val nodes = edges.select(col(Biolink.Object_).as("id"))
      .distinct()
      .withColumn("name", lit(""))
      .withColumn("category", array(lit(Biolink.NamedThing)))
    (nodes, edges)
  }
}
