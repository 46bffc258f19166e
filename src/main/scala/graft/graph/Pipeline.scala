package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.Transcripts
import graft.extract.Extract
import graft.link.Resolve
import graft.triples.Triples
import graft.canonical.Canonical
import graft.version.Versions

/** The staged KG-construction dataflow. Every stage reads the *committed
  * table* of its upstream stage (not its plan), so:
  *   - each stage computes exactly once per input corpus (no re-derivation
  *     across the many consumers of `mentions`/`resolved`);
  *   - a killed run resumes at the first uncommitted stage;
  *   - per-stage lineage/metrics land next to the tables (StageStore).
  *
  * Stage DAG (reference lifecycle, SURVEY.md §3.1):
  *   transcripts -> mentions -> resolved -> triples -> edges
  *                     |            \-> (minted) nodes
  *                     \-> version_nodes -> version_edges
  */
object Pipeline {

  /** Committed stage table for the 7 transcript-consuming QUERIES (turn
    * roles, hierarchy x2, segments x2, turn edges, transcript dump),
    * which would otherwise each re-run the orders⋈lineitem join +
    * per-order window — measured ~31s of the 84s query total at sf0.1
    * (VERDICT r02 #3). Consumers filtering turn_idx (Hierarchy) get
    * parquet pushdown off the committed table instead of a full
    * re-derivation.
    *
    * NOT in the mentions critical path and NOT part of runAll: the
    * extraction keeps the fused derivation+regex plan (one codegen pass,
    * text never materialized). Measured at sf0.1: the text write+read
    * roundtrip costs ~30s (transcripts 11-23s + parquet-read mentions
    * 10-19s) where the fused stage costs ~11s — committing here would
    * halve pipeline throughput for zero query benefit. In a real
    * deployment transcripts ARE the input table; this stage exists only
    * because the sandbox derives them. */
  def transcripts(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "transcripts") {
      Transcripts.fromTpch(spark, sfDir)
    }

  def mentions(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "mentions") {
      Extract.mentions(Transcripts.fromTpch(spark, sfDir))
    }

  /** Hierarchy node table (corpus/month/conv leaves with dense bucketed
    * IDs): four query consumers (hierarchy nodes + edges, the
    * conv→entity bridge, config rows) would otherwise each re-run the
    * turn-0 projection and both bucketed-ID passes. A tiny table (one
    * row per conversation + folders), so the stage write is cheap and
    * every consumer after the first reads parquet. */
  def hierNodes(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "hier_nodes") {
      Hierarchy.nodes(transcripts(spark, sfDir))
    }

  def resolved(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "resolved") {
      Resolve.resolved(mentions(spark, sfDir))
    }

  def entityNames(spark: SparkSession, sfDir: String): DataFrame =
    Triples.entityNames(mentions(spark, sfDir))

  /** Append-only incremental build over a NEW batch of conversations.
    *
    * Extraction and resolution are conversation-local (every window and
    * join keys on conv_id), so the new batch is processed ALONE and
    * unioned with the committed stage tables — the existing corpus is
    * never re-derived. The only whole-corpus step is the vocabulary
    * semi-join (a relation in an old conversation may name an entity the
    * new batch just defined), which re-runs as ONE hash semi-join over
    * the unioned tables — the 100 TB cost of an append is
    * O(new batch) + one join, not O(corpus).
    *
    * Dense IDs are deliberately NOT incremental: the bucketed assigner
    * re-keys from the unioned triple set downstream (a new name shifts
    * its bucket's sequence — stable IDs across appends would need an ID
    * ledger, a different contract than the reference's rebuild-world
    * semantics, knowledge_graph.py rebuilds all IDs per run too).
    * Returns (mentions, resolved, triples) over the combined corpus. */
  def appendBatch(committedMentions: DataFrame, committedResolved: DataFrame,
      newTranscripts: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // materialize the new batch's extraction ONCE — it feeds three arms
    // (mention union, resolve, vocabulary) and regex extraction is the
    // expensive step; a production append would StageStore-commit it,
    // matching the rest of this module
    val nm = Extract.mentions(newTranscripts).localCheckpoint()
    val m = committedMentions.unionByName(nm)
    val r = committedResolved.unionByName(Resolve.resolved(nm))
    (m, r, Triples.knownOnly(r, Triples.entityNames(m)))
  }

  def nodes(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "nodes") {
      Canonical.nodes(entityNames(spark, sfDir))
    }

  /** The entity vocabulary for the triple-forming joins is read from the
    * COMMITTED nodes table (one row per name by construction), not
    * re-derived: entityNames is a distinct over the full entity_def
    * mention stream — one corpus-sized shuffle — and deriving it again
    * here and in mintedNodes would run that shuffle three times per
    * pipeline instead of once (inside the nodes stage). */
  def triples(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "triples") {
      Triples.knownOnly(resolved(spark, sfDir),
        nodes(spark, sfDir).select("canonical_name"))
    }

  def mintedNodes(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "minted_nodes") {
      Canonical.mintedNodes(
        nodes(spark, sfDir),
        Triples.mintedNames(resolved(spark, sfDir),
          nodes(spark, sfDir).select("canonical_name")))
    }

  def edges(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "edges") {
      Canonical.edges(triples(spark, sfDir), nodes(spark, sfDir))
    }

  def versionNodes(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "version_nodes") {
      Versions.versionNodes(mentions(spark, sfDir))
    }

  def versionEdges(spark: SparkSession, sfDir: String): DataFrame =
    StageStore.getOrCreate(spark, sfDir, "version_edges") {
      Versions.versionEdges(versionNodes(spark, sfDir))
    }

  /** Run every stage to completion (idempotent / resumable). The two
    * branches downstream of `mentions` are independent — the resolve
    * chain (resolved -> nodes -> triples -> minted -> edges) and the
    * version chain (version_nodes -> version_edges) — so they run as
    * concurrent jobs from two driver threads (guide §2.6 "overlap
    * independent jobs"): the version chain's tasks back-fill executor
    * cores left idle by the resolve chain's stage tails, instead of
    * serializing ~3 s of version work after the edge count. Stage
    * ordering WITHIN each branch is unchanged, so per-stage recorded
    * walls still cover their own work (modulo shared-host concurrency,
    * which the lineage rows disclose). Returns the emitted edge count. */
  def runAll(spark: SparkSession, sfDir: String): Long = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    mentions(spark, sfDir)
    val versionBranch = Future {
      versionNodes(spark, sfDir)
      versionEdges(spark, sfDir)
    }
    resolved(spark, sfDir)
    nodes(spark, sfDir)
    triples(spark, sfDir)
    mintedNodes(spark, sfDir)
    val e = edges(spark, sfDir).count()
    Await.result(versionBranch, Duration.Inf)
    e
  }

  /** spark-submit entry point: `graft.graph.Pipeline <sfDir>`. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val nEdges = runAll(spark, sfDir)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""{"pipeline":"kg","sfDir":"$sfDir","edges":$nEdges,"sec":$sec,"triples_per_sec":${nEdges / sec}}""")
    StageStore.metrics(spark, sfDir).show(100, truncate = false)
    spark.stop()
  }
}
