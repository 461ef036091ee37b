package graft.pipeline

import java.nio.file.{Files, Paths}

/** Recursive source resolution (SURVEY §2.9 O2).
  *
  * Reference semantics (orion/source_resolution.py:39-244,
  * orion/graph_pipeline.py:354-414):
  *  - a graph's source resolves local → registry → produce;
  *  - "local" = an existing bundle directory keyed by build_version with
  *    nodes/edges + graph-metadata.json;
  *  - "registry" = a remote download — a network service, behind an
  *    injectable client (no-op by default in this zero-egress engine);
  *  - "produce" = for a parser source, run the ingest pipeline and bundle
  *    the output; for a graph dependency, recursively build the subgraph's
  *    OWN spec — but only when the current spec reproduces the pinned
  *    build_version (any other pin is lookup-only and fails on a miss);
  *  - recursion is cycle-checked (a graph that depends on itself through
  *    any chain fails deterministically rather than looping).
  */
object SourceResolution {

  final case class ResolvedSource(
      id: String,
      buildVersion: String,
      bundleDir: String,
      mergeStrategy: String,
      via: String) // "local" | "registry" | "built-parser" | "built-subgraph"

  /** Registry seam — the reference's GraphRegistryClient (network). */
  trait RegistryClient {
    /** Fetch the bundle for (graphId, buildVersion) into destDir; true on success. */
    def fetchBundle(graphId: String, buildVersion: String, destDir: String): Boolean
  }
  object NoRegistry extends RegistryClient {
    override def fetchBundle(graphId: String, buildVersion: String, destDir: String): Boolean = false
  }

  final case class Resolver(
      graphsDir: String,
      graphSpecs: Map[String, GraphSpec],
      parserSourceIds: Set[String],
      buildParser: GraphSource => Option[String], // source → bundle dir
      buildGraph: GraphSpec => Option[String],    // spec → bundle dir
      registry: RegistryClient = NoRegistry) {

    def bundleDir(id: String, buildVersion: String): String =
      Paths.get(graphsDir, id, buildVersion).toString

    private def hasBundle(dir: String): Boolean =
      Files.isDirectory(Paths.get(dir)) &&
        Files.exists(Paths.get(dir, "graph-metadata.json")) &&
        (Files.exists(Paths.get(dir, "nodes.jsonl")) || Files.exists(Paths.get(dir, "nodes.jsonl.gz"))) &&
        (Files.exists(Paths.get(dir, "edges.jsonl")) || Files.exists(Paths.get(dir, "edges.jsonl.gz")))

    def sourceBuildVersion(s: GraphSource): String = sourceBuildVersion(s, Set.empty)

    private def sourceBuildVersion(s: GraphSource, seen: Set[String]): String =
      graphSpecs.get(s.id) match {
        // graph dependency: its version is its own spec's composite version
        case Some(sub) if !parserSourceIds.contains(s.id) =>
          if (seen.contains(s.id)) throw new IllegalStateException(
            s"dependency cycle: ${s.id} depends on itself (chain: ${seen.mkString(" -> ")} -> ${s.id})")
          graphBuildVersion(sub, seen + s.id)
        case _ => Versioning.sourceBuildVersion(
          s.id, s.sourceVersion.getOrElse("latest"),
          s.parsingVersion.getOrElse("1.0"), s.normalizationVersion.getOrElse("1.0"))
      }

    def graphBuildVersion(spec: GraphSpec): String = graphBuildVersion(spec, Set(spec.graphId))

    private def graphBuildVersion(spec: GraphSpec, seen: Set[String]): String =
      Versioning.graphBuildVersion(spec.sources.map(sourceBuildVersion(_, seen)))

    /** Resolve every source of `spec`, recursively building subgraph
      * dependencies; None when any source is unresolvable. */
    def resolveAll(spec: GraphSpec): Option[Seq[ResolvedSource]] =
      resolveAll(spec, Set(spec.graphId))

    private def resolveAll(spec: GraphSpec, building: Set[String]): Option[Seq[ResolvedSource]] = {
      val resolved = spec.sources.map(s => resolve(s, building))
      if (resolved.forall(_.isDefined)) Some(resolved.flatten) else None
    }

    def resolve(source: GraphSource): Option[ResolvedSource] = resolve(source, Set.empty)

    private def resolve(source: GraphSource, building: Set[String]): Option[ResolvedSource] = {
      if (building.contains(source.id) && graphSpecs.contains(source.id) &&
          !parserSourceIds.contains(source.id))
        throw new IllegalStateException(
          s"dependency cycle: ${source.id} is already being built (chain: ${building.mkString(" -> ")})")
      val bv = sourceBuildVersion(source)
      val dir = bundleDir(source.id, bv)
      resolveLocal(source, bv, dir)
        .orElse(resolveRegistry(source, bv, dir))
        .orElse(produce(source, bv, building))
    }

    private def resolveLocal(s: GraphSource, bv: String, dir: String): Option[ResolvedSource] =
      if (hasBundle(dir)) Some(ResolvedSource(s.id, bv, dir, s.mergeStrategy, "local")) else None

    private def resolveRegistry(s: GraphSource, bv: String, dir: String): Option[ResolvedSource] =
      if (registry.fetchBundle(s.id, bv, dir) && hasBundle(dir))
        Some(ResolvedSource(s.id, bv, dir, s.mergeStrategy, "registry"))
      else None

    private def produce(s: GraphSource, bv: String, building: Set[String]): Option[ResolvedSource] = {
      if (parserSourceIds.contains(s.id)) {
        buildParser(s).filter(hasBundle)
          .map(dir => ResolvedSource(s.id, bv, dir, s.mergeStrategy, "built-parser"))
      } else graphSpecs.get(s.id) match {
        case None => None // not a parser source, no spec to build it
        case Some(sub) =>
          // recursive subgraph build — resolve ITS sources first, then build
          resolveAll(sub, building + s.id).flatMap { _ =>
            buildGraph(sub).filter(hasBundle)
              .map(dir => ResolvedSource(s.id, bv, dir, s.mergeStrategy, "built-subgraph"))
          }
      }
    }
  }
}
