package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** Physical-plan quality gates: the properties that matter at 100 TB,
  * asserted so a regression (lost broadcast, lost pushdown, lost pruning)
  * fails CI instead of shipping a 100x slower plan. */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("triple-forming join broadcasts the entity vocabulary") {
    val m = graft.extract.Extract.mentions(
      graft.sources.Transcripts.fromTpch(spark, sfDir))
    val t = graft.triples.Triples.knownOnly(
      graft.link.Resolve.resolved(m), graft.triples.Triples.entityNames(m))
    val p = plan(t)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast semi join, got:\n${p.take(2000)}")
  }

  test("transcript derivation broadcasts all dimension tables") {
    val p = plan(graft.sources.Transcripts.fromTpch(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"part/supplier/customer should broadcast, found $broadcasts")
  }

  test("column pruning reaches the parquet scan") {
    val df = TextOps.tokenCounts(spark.read.parquet(s"$sfDir/documents.parquet"))
    val p = plan(df)
    assert(p.contains("ReadSchema"))
    // lang/source/n_chars must NOT be read (only doc_id + text)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"scan reads more columns than the projection needs: $readSchema")
  }

  test("predicate pushdown reaches the parquet scan") {
    val df = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_totalprice")
    val p = plan(df)
    assert(p.contains("PushedFilters") &&
      (p.contains("EqualTo(o_orderkey,42)") || p.contains("EqualTo(o_orderkey, 42)")),
      s"filter not pushed:\n${p.take(1500)}")
  }

  test("whole-stage codegen covers the extraction frontend") {
    val m = graft.extract.Extract.mentions(
      graft.sources.Transcripts.fromTpch(spark, sfDir))
    // must execute THIS frame's QueryExecution: AQE only finalizes (and
    // collapses codegen stages) on the executed plan; count() would build
    // a different QueryExecution and leave this one at the initial plan
    m.collect()
    val p = plan(m)
    assert(p.contains("isFinalPlan=true"))
    assert(p.contains("*("),
      s"extraction should stay inside codegen (no UDF barriers):\n${p.take(1200)}")
  }

  test("broadcast gate: salted shuffle path engages above the gate and equals the broadcast path") {
    import spark.implicits._
    // hot-key fixture: one key carries 90% of the stream
    val stream = (0 until 2000).map { i =>
      (if (i % 10 == 0) s"k$i" else "hot", s"c${i % 7}", i % 13, i)
    }.toDF("obj", "conv_id", "turn_idx", "mention_idx")
    val dict = (Seq("hot") ++ (0 until 2000 by 20).map(i => s"k$i")).toDF("obj")

    val viaBroadcast = graft.canonical.Joins
      .semiSkewSafe(stream, dict, "obj", Seq("conv_id", "turn_idx"))
    assert(plan(viaBroadcast).contains("BroadcastExchange"),
      "small dictionary must broadcast")

    val key = "graft.broadcast.maxBytes"
    sys.props(key) = "1" // force the over-the-gate path
    try {
      val viaSalt = graft.canonical.Joins
        .semiSkewSafe(stream, dict, "obj", Seq("conv_id", "turn_idx"))
      // the salt key in the join condition is the salted path's signature
      // (xxhash64 itself may be constant-folded into a LocalTableScan)
      assert(plan(viaSalt).contains("_salt"),
        s"salted path must engage above the gate:\n${plan(viaSalt).take(1500)}")
      val a = viaBroadcast.collect().map(_.toSeq).toSet
      val b = viaSalt.collect().map(_.toSeq).toSet
      assert(a === b, "salted and broadcast paths must agree")
      // edge remap takes the salted path too, and stays correct
      val nodes = graft.canonical.Canonical.nodes(
        Seq("t:a", "t:b", "t:c").toDF("canonical_name"))
      val triples = Seq(("t:a", "uses", "t:b", "c1", 1, 0), ("t:c", "uses", "t:a", "c1", 2, 0))
        .toDF("subj", "pred", "obj", "conv_id", "turn_idx", "mention_idx")
      val e = graft.canonical.Canonical.edges(triples, nodes)
      assert(plan(e).contains("_salt"))
      assert(e.count() === 2L)
    } finally sys.props.remove(key)
  }

  test("hierarchy turn-0 is a pushed parquet filter on the committed transcripts table") {
    // r02 scale-killer regression gate: the month-folder listing must read
    // a filtered 3-column scan, never a full corpus derivation
    // the projection below is what Hierarchy materializes (its checkpoint
    // hides the scan from the downstream dense-ID plan, so assert on the
    // projection's own plan)
    val tmp = java.nio.file.Files.createTempDirectory("graft_hier_push").toString
    graft.sources.Transcripts.fromTpch(spark, sfDir)
      .write.mode("overwrite").parquet(tmp)
    val p = plan(graft.graph.Hierarchy.turn0(spark.read.parquet(tmp)))
    assert(p.contains("PushedFilters") &&
      (p.contains("EqualTo(turn_idx,0)") || p.contains("EqualTo(turn_idx, 0)")),
      s"turn_idx=0 not pushed to the scan:\n${p.take(1500)}")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"),
      s"hierarchy must not read the text column: $readSchema")
  }

  test("LSH projections are shuffle-free (literal plane arrays, no explode)") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = plan(graft.ops.Similarity.lshBuckets(e))
    assert(!p.contains("Exchange"),
      s"sign projections must not shuffle (the old posexplode shape inflated 64x):\n${p.take(1500)}")
    assert(!p.contains("Generate"), "no explode in the projection path")
  }

  test("langId evaluates split exactly once (words array projected as an attribute)") {
    // each of the 5 language ratios uses the words array twice; without
    // the projected attribute the plan re-splits the text ~11x per row
    // (the HOF/no-cheap-alias trap) — CollapseProject must keep the alias
    val p = plan(TextOps.langId(
      spark.read.parquet(s"$sfDir/documents.parquet")))
    val splits = "split\\(".r.findAllIn(p).size
    assert(splits === 1, s"expected exactly one split in the plan, got $splits:\n${p.take(1500)}")
  }

  test("stratified sampling is a pure per-row filter: no shuffle in the plan") {
    val lang = TextOps.langId(spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(col("doc_id"), col("pred_lang"))
    val p = plan(graft.ops.Curation.stratifiedSample(lang, "pred_lang",
      Seq("en" -> "40"), "zz"))
    assert(!p.contains("Exchange"),
      s"hash-threshold sampling must not shuffle:\n${p.take(1200)}")
  }

  test("mix stats: the grand total joins as a broadcast single row") {
    val rows = spark.range(100).select(col("id").as("doc_id"),
      (col("id") % 3).cast("string").as("pred_lang"), lit(5L).as("ws_tokens"))
    val p = plan(graft.ops.Curation.mixStats(rows, "pred_lang", "ws_tokens"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row grand total must broadcast, never shuffle the strata:\n${p.take(1200)}")
  }

  test("brute-force ANN broadcasts the query side") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = plan(graft.ops.Similarity.bruteForceTopK(e, 5, 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query side must broadcast:\n${p.take(1500)}")
  }

  test("auto-plane cosine dedup: bucket blocking is an equi-join, never a cross product") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val p = plan(graft.ops.Similarity.cosineDupPairsAuto(e))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay a bucket equi-join:\n${p.take(1500)}")
  }

  test("PR comments: ONE lineitem scan feeds the sliced collect_list (no self-union)") {
    val p = plan(SparkEntry.queries("kg_pr_nodes_rich")(spark, sfDir))
    // count SCAN NODES, not substring mentions (paths repeat in headers):
    // a regression to a self-union would add a second FileScan node
    val scanNodes = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("lineitem"))
    assert(scanNodes === 1,
      s"expected exactly one lineitem FileScan node, got $scanNodes:\n${p.take(1500)}")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"collect_list aggregate missing:\n${p.take(1200)}")
    assert(!p.contains("CartesianProduct"), "no cross product in the PR dim build")
  }

  test("clean-corpus gate: no cross product, doc-keyed joins only") {
    val p = plan(SparkEntry.queries("doc_clean_corpus")(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every gate family must join on doc_id:\n${p.take(1500)}")
  }

  test("exact-dup pre-collapse keeps the digest groupBy map-side combinable") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val p = plan(graft.ops.Dedup.exact(docs))
    assert(p.contains("HashAggregate"), s"digest dedup must hash-aggregate:\n${p.take(800)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "partial + final aggregate expected (map-side combine)")
  }

  test("top-k gate: two-phase partial rank engages above the gate and equals the single-window path") {
    import spark.implicits._
    val rows = (0 until 3000).map(i => (s"g${i % 3}", s"w$i", (i * 37 % 101).toLong))
      .toDF("grp", "word", "n").repartition(8)
    val order = Seq(col("n").desc, col("word"))
    val single = graft.canonical.TopK.perGroup(rows, Seq("grp"), order, 5, "rk")
    assert(!plan(single).contains("_pp"),
      "below the gate the classic single-window plan must be kept")
    val key = "graft.topk.twoPhaseMinBytes"
    sys.props(key) = "1" // force the at-scale path
    try {
      val two = graft.canonical.TopK.perGroup(rows, Seq("grp"), order, 5, "rk")
      val p = plan(two)
      assert(p.contains("_pp"),
        s"two-phase partial rank must engage above the gate:\n${p.take(1500)}")
      assert("Window".r.findAllIn(p).size >= 2,
        "per-(group, partition) window + final per-group window expected")
      assert(two.collect().map(_.toSeq).toSet ===
        single.collect().map(_.toSeq).toSet,
        "two-phase top-k must equal the single-window top-k exactly")
      // a wired site follows the gate too (brute-force ANN)
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val ann = graft.ops.Similarity.bruteForceTopK(emb)
      assert(plan(ann).contains("_pp"))
    } finally sys.props.remove(key)
  }

  test("incremental probe: corpus docs are candidate-filtered BEFORE shingling (batch)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "unrelated text entirely different here okay then")).toDF("doc_id", "text")
    val index = graft.ops.Dedup.minhashBuckets(corpus)
    val incoming = Seq((100L, "alpha beta gamma delta epsilon zeta eta iota"))
      .toDF("doc_id", "text")
    // a gate-fitting corpus keeps the wholesale-shingle plan (cheaper
    // below the gate than the extra semi-join shuffle)
    val small = graft.ops.Dedup.checkAgainstIndex(incoming, index, corpus)
    assert(!small.queryExecution.optimizedPlan.toString.contains("LeftSemi"))
    val want = small.collect().map(_.toSeq).toSet
    // VERDICT r05 #1 regression gate: above the gate the verify side must
    // semi-join the corpus on the candidate ids BEFORE any shingle
    // projection (the previous plan shingled EVERY corpus doc per batch)
    val key = "graft.broadcast.maxBytes"
    sys.props(key) = "1"
    try {
      val probe = graft.ops.Dedup.checkAgainstIndex(incoming, index, corpus)
      val p = probe.queryExecution.optimizedPlan.toString
      assert(p.contains("LeftSemi"),
        s"corpus must be candidate-semi-joined before shingling:\n${p.take(1500)}")
      assert(probe.collect().map(_.toSeq).toSet === want,
        "probe result unchanged by the pre-filter")
      assert(probe.collect().map(_.getLong(1)).toSet === Set(1L))
    } finally sys.props.remove(key)
  }
}
