package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic 10× scale check for the near-dup operators (PERF.md §10×):
  * duplicates the sf0.1 documents corpus D times (ids shifted), times
  * each gated dedup plan at 1× and D×, and prints one line per op.
  * Pathologically dup-dense by construction — outputs are cluster-
  * quadratic upper bounds, used to verify plan SHAPE (no driver
  * collects, no single-task serialization), not typical cost.
  *
  *   sbt "runMain graft.tools.ScaleCheck [dupFactor] [sfDir]"
  */
object ScaleCheck {

  def main(args: Array[String]): Unit = {
    val dup = args.headOption.map(_.toInt).getOrElse(10)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    // optional third arg: comma-separated name-prefix filter for
    // targeted rehearsals (e.g. "fuzzy,temperature")
    val only = args.drop(2).headOption.map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-scale-check").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.memory", "16g")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text")).cache()
    val n = docs.count()
    val blown = (0 until dup).map(i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).cache()
    val nBig = blown.count()
    println(s"[scale] corpus $n rows -> ${dup}x = $nBig rows")

    def time(name: String, df: => DataFrame): Unit = {
      if (only.forall(_.exists(p => name.startsWith(p)))) {
        val t0 = System.nanoTime()
        val rows = df.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $name%-28s $sec%8.1f s  $rows%12d rows")
      }
    }

    time("ngram_jaccard_1x", Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95))
    time(s"ngram_jaccard_${dup}x", Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95))
    time("simhash_1x", Dedup.simhashNearDups(docs, "text", "doc_id", 3))
    time(s"simhash_${dup}x", Dedup.simhashNearDups(blown, "text", "doc_id", 3))
    time("minhash_1x", Dedup.minhashNearDups(docs, "text", "doc_id",
      saltFactor = 4, hotBucketThreshold = 5000))
    time(s"minhash_${dup}x", Dedup.minhashNearDups(blown, "text", "doc_id",
      saltFactor = 4, hotBucketThreshold = 5000))

    // shared spans: the df guard scales with dup (a span's df multiplies
    // by the copy count) so the blown run does comparable work per
    // surviving span — output is the df² upper bound by construction
    time("shared_spans_1x",
      Dedup.sharedSpanPairs(docs, "text", "doc_id", 5, 1, 100))
    time(s"shared_spans_${dup}x",
      Dedup.sharedSpanPairs(blown, "text", "doc_id", 5, 1, 100 * dup))
    // token blocks: every block duplicated dup-fold — the drop list is
    // ~(dup-1)/dup of ALL blocks, the worst case for the per-doc
    // drop-set join and reassembly
    time("token_blocks_1x", Dedup.dedupTokenBlocks(docs, "text", "doc_id", 8))
    time(s"token_blocks_${dup}x",
      Dedup.dedupTokenBlocks(blown, "text", "doc_id", 8))
    // incremental: a batch that is 100% already-known — every row takes
    // the bloom-hit + exact-confirm path (the broadcast worst case)
    import graft.operators.{Decontamination, IncrementalDedup}
    time("incremental_full_dup",
      IncrementalDedup.newAgainstCorpus(docs, blown, Dedup.normalizedSetKey("text")))
    time("decontaminate_1x", Decontamination.flagContaminated(
      docs, docs.filter(col("doc_id") % 23 === 0), "text", "doc_id", 3, 3))
    time(s"decontaminate_${dup}x", Decontamination.flagContaminated(
      blown, docs.filter(col("doc_id") % 23 === 0), "text", "doc_id", 3, 3))

    // connected components over the duplicated corpus's near-dup pairs
    // (each 1x cluster chains across all dup copies — components count
    // must stay at the 1x value while membership grows dup-fold), plus
    // an adversarial 100k-node CHAIN where round count, not edge
    // volume, is the stressor: label propagation's pointer jumping
    // needs O(log diameter) join rounds; star contraction O(log n)
    // window rounds on a shrinking edge list.
    import graft.operators.ConnectedComponents
    lazy val pairs1x = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
      .localCheckpoint(true)
    lazy val pairsBig = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
      .localCheckpoint(true)
    time("components_labelprop_1x",
      ConnectedComponents.components(pairs1x, "id_a", "id_b"))
    time("components_star_1x",
      ConnectedComponents.componentsStar(pairs1x, "id_a", "id_b"))
    time(s"components_labelprop_${dup}x",
      ConnectedComponents.components(pairsBig, "id_a", "id_b"))
    time(s"components_star_${dup}x",
      ConnectedComponents.componentsStar(pairsBig, "id_a", "id_b"))
    val chain = spark.range(0, 100000)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    time("chain100k_labelprop",
      ConnectedComponents.components(chain.toDF, "id_a", "id_b", maxIter = 40))
    time("chain100k_star",
      ConnectedComponents.componentsStar(chain.toDF, "id_a", "id_b"))

    // fuzzy decontamination: benchmark side stays fixed (broadcast);
    // blown corpus multiplies BOTH the kernel work and the matches
    // (every copy of a bench doc is a 1.0-jaccard hit) — linear corpus
    // cost, output grows with the leak count, as it should
    time("fuzzy_decontaminate_1x", Decontamination.fuzzyContaminated(
      docs, docs.filter(col("doc_id") % 23 === 0), "text", "doc_id", 0.8))
    time(s"fuzzy_decontaminate_${dup}x", Decontamination.fuzzyContaminated(
      blown, docs.filter(col("doc_id") % 23 === 0), "text", "doc_id", 0.8))

    // sampling/curation windows at dup-fold group sizes: both are one
    // window shuffle over the group key — cost tracks rows, state is
    // per-group counters only
    import graft.operators.{Sampling, TextAnalysis}
    val full = spark.read.parquet(s"$dir/documents.parquet")
    val fullBlown = (0 until dup).map(i =>
      full.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .reduce(_ unionByName _)
    time(s"temperature_take_${dup}x",
      Sampling.temperatureTake(fullBlown, "lang", "doc_id", 0.5, 0.3))
    val scoredBlown = fullBlown.select(col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    time(s"token_budget_${dup}x", Sampling.tokenBudgetTake(
      scoredBlown, "source", "quality", "n_tokens", "doc_id", 800L * dup))

    // containment: every cross-copy pair of a containing pair also
    // qualifies — identical-set clustering must keep candidate work at
    // distinct-set scale while the OUTPUT grows ~dup² per 1× pair
    time("containment_1x",
      Dedup.containmentPairs(docs, "text", "doc_id", 0.8))
    time(s"containment_${dup}x",
      Dedup.containmentPairs(blown, "text", "doc_id", 0.8))

    // heavy hitters: the MG summary is k counters per partition no
    // matter the corpus size — cost must track rows, state must not
    val words1x = docs.select(
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    val wordsBig = blown.select(
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    import graft.operators.HeavyHitters
    time("heavy_hitters_1x", HeavyHitters.heavyHitters(words1x, col("w"), 0.034))
    time(s"heavy_hitters_${dup}x",
      HeavyHitters.heavyHitters(wordsBig, col("w"), 0.034))

    // BPE: rounds run on the DISTINCT-WORD frame — duplicating the
    // corpus changes only the one corpus-scale frequency pass, the 24
    // training rounds are vocabulary-bounded and cost the same
    import graft.operators.Bpe
    time("bpe_train_1x",
      { Bpe.trainMerges(docs, "text", 24); docs.limit(1) })
    time(s"bpe_train_${dup}x",
      { Bpe.trainMerges(blown, "text", 24); blown.limit(1) })

    // weighted sampling: pure projection + TakeOrdered — no shuffle to
    // grow; wall time must track the scan alone
    val weighted1x = full.select(col("doc_id"), col("n_chars"))
    val weightedBig = (0 until dup).map(i =>
      full.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("n_chars"))).reduce(_ unionByName _)
    time("weighted_take_1x",
      Sampling.weightedReservoirTake(weighted1x, "doc_id", "n_chars", 50))
    time(s"weighted_take_${dup}x",
      Sampling.weightedReservoirTake(weightedBig, "doc_id", "n_chars", 50))

    // semantic dedup + IVF-PQ over a dup-blown embedding corpus: cells
    // multiply in size, the per-cell kernel's early-exit keeps the
    // duplicated mass linear (every copy hits its first earlier twin)
    import graft.operators.Similarity
    import graft.ingest.PqIndex
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").cache()
    val embBig = (0 until dup).map(i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _).cache()
    embBig.count()
    time("semantic_dedup_1x",
      Similarity.semanticDedup(emb, "vec_id", "embedding", "label", 0.35))
    time(s"semantic_dedup_${dup}x",
      Similarity.semanticDedup(embBig, "vec_id", "embedding", "label", 0.35))
    // winnowing + its decontamination: both scan-local kernels, the
    // match side broadcasts — cost must track rows
    time("winnow_1x",
      TextAnalysis.winnowFingerprints(docs, "text", "doc_id"))
    time(s"winnow_${dup}x",
      TextAnalysis.winnowFingerprints(blown, "text", "doc_id"))
    time(s"winnow_decontaminate_${dup}x", Decontamination.winnowContaminated(
      blown, docs.filter(col("doc_id") % 23 === 0), "text", "doc_id"))

    // Lloyd rounds: M-step is one aggregate over the posexploded corpus,
    // E-step broadcast — per-round cost linear in rows, centroid frame
    // fixed at k×dim
    time(s"lloyd2_${dup}x",
      Similarity.lloydIterate(embBig, "vec_id", "embedding", "label", 2))

    // full cascade at 10×: stage 1 collapses the duplicated mass
    // (every copy is an exact dup), so stages 2-3 run at ~1× corpus
    // size — cost must approach the 1× cascade plus one exact pass
    time(s"dedup_cascade_${dup}x", {
      import org.apache.spark.sql.expressions.Window
      val withMin = blown.withColumn("tmin",
        min(col("doc_id")).over(Window.partitionBy(col("text"))))
      val s1 = withMin.filter(col("doc_id") === col("tmin"))
        .select("doc_id", "text").localCheckpoint(true)
      val cp = Dedup.containmentPairs(s1, "text", "doc_id", 0.8)
        .select("src", "dst").localCheckpoint(true)
      val rev = cp.select(col("src").as("rsrc"), col("dst").as("rdst"))
      val d2 = cp.join(rev,
          col("dst") === col("rsrc") && col("src") === col("rdst"), "left")
        .filter(col("rsrc").isNull || col("dst") < col("src"))
        .select(col("src").as("doc_id")).distinct()
      val s2 = s1.join(d2, Seq("doc_id"), "left_anti").localCheckpoint(true)
      ConnectedComponents.components(
        Dedup.ngramJaccardPairs(s2, "text", "doc_id", 0.95), "id_a", "id_b")
    })

    // JS divergence: after the closed-form Q-side rewrite the plan is
    // one token aggregate + vocabulary-bounded joins — cost must track
    // the corpus scan; the old #groups × vocab grid would grow dup-fold
    // in vocab-side width here and ~10⁶-fold at web scale
    time("js_divergence_1x",
      TextAnalysis.jsDivergenceByGroup(full, "text", "source"))
    time(s"js_divergence_${dup}x",
      TextAnalysis.jsDivergenceByGroup(fullBlown, "text", "source"))

    time(s"ivfpq_build_probe_${dup}x", {
      val p = PqIndex.writeIvfPq(embBig, "vec_id", "embedding",
        s"${System.getProperty("java.io.tmpdir")}/graft-ann/scalecheck/pq${dup}x",
        numCentroids = 16, m = 8, ksub = 16)
      PqIndex.ivfPqTopK(spark, p, "vec_id", "embedding",
        graft.ingest.AnnIndex.lookupVector(emb, "vec_id", "embedding", 0L),
        k = 10, nProbes = 4)
    })

    // bloom-prefiltered joins: the filter build is fixed-size (the
    // benchmark subset), the probe side is the blown corpus — cost must
    // track the probe scan, and the anti split's immediate-emit path
    // must carry the provably-absent mass without touching the join
    import graft.operators.{BloomJoin, HybridSearch}
    val bloomBuild = docs.filter(col("doc_id") % 23 === 0)
    time(s"bloom_semi_${dup}x",
      BloomJoin.semiJoin(blown, bloomBuild, "doc_id", "doc_id"))
    time(s"bloom_anti_${dup}x",
      BloomJoin.antiJoin(blown, bloomBuild, "doc_id", "doc_id"))

    // hybrid RRF: both candidate pools are bounded (TakeOrdered /
    // broadcast-query kernel), so fusion cost must track the two
    // corpus scans — the rank windows never see more than poolSize rows
    time(s"hybrid_rrf_${dup}x",
      HybridSearch.rrfFusion(blown, embBig, "text", "doc_id",
        Seq("spark", "vector", "customer"), "vec_id", "embedding",
        queryVecId = 0L, k = 20))

    // int8 quantization: scan-local projection, zero shuffles — linear
    time(s"quantize_int8_${dup}x",
      Similarity.quantizeInt8(embBig, "vec_id", "embedding"))

    // edit distance: gram-join candidates must scale with shared-gram
    // mass, not pair count; rehearse on 40-char prefixes of the DISTINCT
    // texts (the gate shape) and on the blown corpus — dup-dense input
    // makes every duplicate cluster a dist-0 clique, so this is the
    // cluster-quadratic upper bound like the other dedup rows
    val prefixes = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("id"))
      .select(col("id"), substring(col("text"), 1, 40).as("s"))
    // scale-out input holds DUP DENSITY constant: replica 0 keeps the
    // original prefixes (the 1x problem, same true pairs); replicas
    // 1..9 get fully-distinct md5-derived strings. Duplicating the
    // prefixes verbatim (or mutating a few chars) inflates every gram
    // bucket ~10x and the candidate-pair mass ~100x — the documented
    // clique-quadratic worst case, which at sf0.1 spills >80 GB of
    // shuffle and fills the disk. The honest 10x claim is "the gram
    // prefilter discards a 10x-bigger corpus's noise at near-linear
    // cost", not "pair mass is quadratic in duplication" (that bound
    // is documented at 1x).
    val prefixesBig = blown.groupBy(col("text"), (col("doc_id") / 10000000L).cast("long").as("rep"))
      .agg(min(col("doc_id")).as("id"))
      .select(col("id"), when(col("rep") === 0, substring(col("text"), 1, 40))
        .otherwise(concat(
          md5(concat_ws(":", col("rep"), col("text"))),
          substring(md5(concat_ws(";", col("rep"), col("text"))), 1, 8)))
        .as("s"))
    time("edit_distance_1x",
      graft.operators.EditDistance.pairs(prefixes, "s", "id", 3))
    time(s"edit_distance_${dup}x",
      graft.operators.EditDistance.pairs(prefixesBig, "s", "id", 3))

    // event sequences: one user-window shuffle, type-bounded tails —
    // cost must track the events scan linearly
    val events = graft.Tables(spark, dir).events
    val eventsBig = (0 until dup).map(i =>
      events.select(col("event_id"), (col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("ts"), col("event_type"), col("value"), col("props")))
      .reduce(_ unionByName _)
    time("markov_transitions_1x",
      graft.operators.EventSequences.transitions(events))
    time(s"markov_transitions_${dup}x",
      graft.operators.EventSequences.transitions(eventsBig))
    time(s"attribution_${dup}x",
      graft.operators.EventSequences.touchAttribution(eventsBig, "purchase"))

    // multimodal codecs are scan-local kernels (no shuffle anywhere in
    // the plan) — cost must be linear in the corpus with zero skew
    // sensitivity; the encode side dominates (container writers)
    {
      implicit val sp: SparkSession = spark
      time("mm_image_decode_1x",
        graft.operators.Multimodal.decodeImages(
          graft.operators.Multimodal.syntheticImageTable(docs)).toDF())
      time(s"mm_image_decode_${dup}x",
        graft.operators.Multimodal.decodeImages(
          graft.operators.Multimodal.syntheticImageTable(blown)).toDF())
      time("mm_frame_sample_1x",
        graft.operators.Multimodal.sampleFrames(
          graft.operators.Multimodal.syntheticVideoTable(docs), 2).toDF())
      time(s"mm_frame_sample_${dup}x",
        graft.operators.Multimodal.sampleFrames(
          graft.operators.Multimodal.syntheticVideoTable(blown), 2).toDF())
    }

    // portable (md5-contract) sketches: same banding scale shapes as the
    // xxhash paths — simhash clusters identical sigs first (band join at
    // distinct-signature scale), minhash candidate volume tracks output
    time("portable_simhash_1x",
      graft.operators.PortableSketches.simhashPairs(docs, "text", "doc_id", 3))
    time(s"portable_simhash_${dup}x",
      graft.operators.PortableSketches.simhashPairs(blown, "text", "doc_id", 3))
    time("portable_minhash_1x",
      graft.operators.PortableSketches.minhashPairs(docs, "text", "doc_id", 0.95))
    time(s"portable_minhash_${dup}x",
      graft.operators.PortableSketches.minhashPairs(blown, "text", "doc_id", 0.95))

    // pagerank: per-iteration cost is two keyed shuffles bounded by |E|
    // (the near-dup pair list), never by corpus size
    {
      val pairs1 = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      def sym(p: DataFrame) =
        p.select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(p.select(col("id_b").as("src"), col("id_a").as("dst")))
      time("pagerank_1x",
        graft.operators.PageRank.pagerank(docs.select("doc_id"), "doc_id",
          sym(pairs1), "src", "dst", 3))
      time(s"pagerank_${dup}x",
        graft.operators.PageRank.pagerank(blown.select("doc_id"), "doc_id",
          sym(pairsD), "src", "dst", 3))
    }

    // blocklist: scan-local automaton — cost linear in corpus chars and
    // INDEPENDENT of pattern count (500 patterns ≈ 5), zero shuffles
    {
      val pats5 = Seq("spark", "data", "at", "customer", "er")
      val pats500 = (0 until 500).map(i => f"pattern$i%03d needle") ++ pats5
      time("blocklist_5pat_1x",
        graft.operators.Blocklist.flagMatches(docs, "text", "doc_id", pats5))
      time(s"blocklist_5pat_${dup}x",
        graft.operators.Blocklist.flagMatches(blown, "text", "doc_id", pats5))
      time(s"blocklist_500pat_${dup}x",
        graft.operators.Blocklist.flagMatches(blown, "text", "doc_id", pats500))
      // 10⁴ patterns: the documented real-list scale — the broadcast
      // automaton must keep build+ship flat (one executor copy, not a
      // per-stage closure re-serialization), and match cost stays
      // linear in corpus chars
      val pats10k = (0 until 10000).map(i => f"block$i%04d phrase") ++ pats5
      time("blocklist_10kpat_1x",
        graft.operators.Blocklist.flagMatches(docs, "text", "doc_id", pats10k))
      time(s"blocklist_10kpat_${dup}x",
        graft.operators.Blocklist.flagMatches(blown, "text", "doc_id", pats10k))
    }

    // compression ratio: per-row Deflater kernel, zero shuffles —
    // linear in corpus bytes
    time("compression_ratio_1x",
      graft.operators.TextAnalysis.compressionRatio(docs, "text", "doc_id"))
    time(s"compression_ratio_${dup}x",
      graft.operators.TextAnalysis.compressionRatio(blown, "text", "doc_id"))

    // snapshot diff: both sides projected to 16-byte digests before the
    // id-keyed full outer join — the exchange carries digests, not text
    time(s"snapshot_diff_${dup}x", {
      val v2 = blown.filter(col("doc_id") % 7 =!= 0)
      graft.operators.IncrementalDedup.snapshotDiff(blown, v2, "text", "doc_id")
    })

    // clustering eval: one corpus groupBy to the contingency cells,
    // everything downstream bounded by |labels| x |clusters|
    {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"cluster_nmi_${dup}x",
        graft.operators.Similarity.clusterAgreement(
          graft.operators.Similarity.centroidAssign(
            embBig, "vec_id", "embedding", "label"),
          "vec_id", "assigned",
          embBig.select(col("vec_id"), col("label")), "label"))
    }

    // entity resolution: block keys bound the candidate join exactly like
    // the LSH band joins — scored pairs grow with true match volume
    {
      val dict = spark.read.parquet(s"$dir/part.parquet")
        .groupBy(col("p_name")).agg(min(col("p_partkey")).as("id"))
      val dictBig = (0 until dup).map(i =>
        dict.select(concat(col("p_name"), lit(" v" + i)).as("p_name"),
          (col("id") + lit(i * 10000000L)).as("id")))
        .reduce(_ unionByName _)
      time("er_pairs_1x",
        graft.operators.EntityResolution.scoredPairs(dict, "p_name", "id", 0.9))
      time(s"er_pairs_${dup}x",
        graft.operators.EntityResolution.scoredPairs(dictBig, "p_name", "id", 0.9))
    }

    // WARC entry format: member-per-record gzip write + streaming
    // record parse of the blown corpus — the raw-crawl ingest path
    // must stay linear in corpus bytes (file-per-task parallelism)
    {
      val s2 = spark
      val warcDir =
        s"${System.getProperty("java.io.tmpdir")}/graft-scale-warc"
      if (only.forall(_.exists("warc_roundtrip".startsWith))) {
        val t0 = System.nanoTime()
        graft.sources.Warc.write(blown, "doc_id", "text", warcDir, 32)
        val rows = graft.sources.Warc.read(s2, warcDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val label = s"warc_roundtrip_${dup}x"
        println(f"[scale] $label%-28s $sec%8.1f s  $rows%12d rows")
      }
    }

    // URL canonicalization: scalar chain over the blown corpus — pure
    // codegen, must track corpus size linearly with zero shuffles
    time(s"url_canonicalize_${dup}x",
      blown.select(graft.operators.UrlNormalize.canonicalize(
        concat(lit("HTTPS://Host.EX:443/p/"), col("doc_id"),
          lit("?utm_source=x&b=1&a=2#f"))).as("canonical")))

    // capped ER under a Zipf-hot dictionary: 30% of a 50k-name
    // dictionary shares ONE 2-char prefix ("ma…"), the uncapped
    // contract's worst case (a 15k-row block = 112M candidate pairs in
    // one task). The cap bounds every block at maxBlock, so candidates
    // collapse from quadratic-in-hot-block to ≤ maxBlock² per
    // surviving sub-block — the row to compare against er_pairs above.
    {
      val s2 = spark
      import s2.implicits._
      val hotDict = s2.range(0, 50000L * dup).select(col("id"),
        when(col("id") % 10 < 3,
          concat(lit("martha common "), col("id").cast("string")))
          .otherwise(concat(
            // near-uniform tail: spread first chars by id
            substring(md5(col("id").cast("string")), 1, 6),
            lit(" "), col("id").cast("string"))).as("p_name"))
      time(s"er_pairs_capped_hot_${dup}x",
        graft.operators.EntityResolution.scoredPairsCapped(
          hotDict, "p_name", "id", 0.9, maxBlock = 100))
    }

    // repeated-span dedup (ExactSubstr shape): the blown corpus turns
    // every document into a dup-fold-deep repeat, so the gram frequency
    // aggregate and the hit window both run at their worst case; the
    // only corpus-scale exchange is (gram-md5, doc, idx) and the span
    // merge is per-doc — must track corpus size, not pairs
    time("repeated_spans_1x",
      graft.operators.RepeatedSpans.spans(docs, "text", "doc_id", 8))
    time(s"repeated_spans_${dup}x",
      graft.operators.RepeatedSpans.spans(blown, "text", "doc_id", 8))
    time(s"repeated_span_removal_${dup}x",
      graft.operators.RepeatedSpans.removeRepeated(
        blown, "text", "doc_id", 8))

    // capped dhash banding under a blank-thumbnail collapse: 30% of the
    // corpus shares ONE hash (all 4 band keys identical — the crawl
    // pathology), the rest are diverse. Uncapped banding would put the
    // whole hot block in one bucket (quadratic in 0.3·N); the cap
    // sub-bands hot buckets and drops the still-hot 28-bit sub-buckets
    // by declared contract, so per-bucket work stays ≤ maxBucket² and
    // the runtime must track the DIVERSE fraction, not the hot block
    {
      val s2 = spark
      import s2.implicits._
      val nImg = 5000L * dup
      // ids ≡ 4 (mod 10) are a hamming-1 twin of their predecessor's
      // hash (last nibble's low bit flipped), so the diverse fraction
      // carries real pairs the cap must keep finding
      val skewHashes = s2.range(0, nImg).select(col("id").as("doc_id"),
        when(col("id") % 10 < 3, lit("00000000000000ff"))
          .when(col("id") % 10 === 4, concat(
            substring(md5((col("id") - 1).cast("string")), 1, 15),
            translate(substring(md5((col("id") - 1).cast("string")), 16, 1),
              "0123456789abcdef", "1032547698badcfe")))
          .otherwise(substring(md5(col("id").cast("string")), 1, 16))
          .as("dhash"))
      time(s"dhash_capped_hot_${dup}x",
        graft.operators.Multimodal.dhashNearDupPairsCapped(
          skewHashes, maxHamming = 3, maxBucket = 2000))
    }

    // neighbor Jaccard under the hub cap: the blown corpus merges each
    // template clique across copies (degrees ×dup, wedges ×dup²), so
    // UNCAPPED second-order similarity goes quadratic-in-clique — the
    // cap excludes hubs up front and the wedge volume must track the
    // low-degree subgraph only (≈1% of Σdeg² at sf0.1, measured)
    {
      val pairs1 = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      time("jaccard_nbr_cap_1x",
        graft.operators.GraphMetrics.neighborJaccard(
          pairs1, "id_a", "id_b", 1L, maxDegree = 64L))
      time(s"jaccard_nbr_cap_${dup}x",
        graft.operators.GraphMetrics.neighborJaccard(
          pairsD, "id_a", "id_b", 1L, maxDegree = 64L))
    }

    // PCA: one 1-row Gram aggregate (dim²/2 longs) + scan-local
    // projection — must track corpus size linearly, state is dim²
    {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding")))
        .reduce(_ unionByName _)
      time("pca_power_1x",
        graft.operators.Pca.powerProject(emb, "vec_id", "embedding", 16, 3))
      time(s"pca_power_${dup}x",
        graft.operators.Pca.powerProject(embBig, "vec_id", "embedding", 16, 3))
    }

    // sentence-level dedup: the only corpus-scale exchange carries
    // (doc_id, 32-byte md5 key) pairs; blown corpus duplicates every
    // sentence dup-fold (worst case for the frequency aggregate's
    // map-side combine — it must collapse before the shuffle)
    time("sentence_dedup_1x",
      graft.operators.SentenceDedup.crossDocStats(docs, "text", "doc_id"))
    time(s"sentence_dedup_${dup}x",
      graft.operators.SentenceDedup.crossDocStats(blown, "text", "doc_id"))

    // CDC chunking: scan-local mapPartitions kernel (md5 per window —
    // the portable contract's cost ceiling; a gear hash drops the
    // constant) + the same hash-only dedup shuffle as sentences
    time("cdc_chunks_1x",
      graft.operators.CdcChunking.crossDocStats(docs, "text", "doc_id"))
    time(s"cdc_chunks_${dup}x",
      graft.operators.CdcChunking.crossDocStats(blown, "text", "doc_id"))

    // label propagation: per-round cost is one |E|-bounded vote shuffle
    // + a node-scale window — same discipline as pagerank (edge list
    // materialized once, shuffle_hash pin on the label join)
    {
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      time(s"label_prop_${dup}x",
        graft.operators.GraphMetrics.labelPropagation(
          blown.select("doc_id"), "doc_id", pairsD, "id_a", "id_b", 3))
    }

    // unicode normalize + script profile: pure codegen'd scalar chains
    // (strip_accents fast-paths ASCII with a zero-copy return) — must
    // track corpus size linearly with zero shuffles
    graft.expressions.GraftFunctions.register(spark)
    time(s"normalize_unicode_${dup}x",
      blown.select(graft.operators.TextAnalysis.normalizeForMatch(
        concat(col("text"), lit(" Café Größe naïve"))).as("n")))
    time(s"script_profile_${dup}x",
      blown.select(graft.operators.TextAnalysis.dominantScript(
        col("text")).as("dom")))

    // sketch family at 10x: per-group HLL is ONE map-side-combined
    // aggregate to <= |groups|*64 register rows; KMV set algebra is two
    // distinct-hash TopK passes then <=2k-row frames
    {
      val langs = blown.withColumn("lang",
        concat(lit("l"), (col("doc_id") % 7).cast("string")))
      time(s"hll_grouped_${dup}x",
        graft.operators.HyperLogLog.summaryByGroup(langs, "lang", "text"))
      time(s"kmv_set_ops_${dup}x",
        graft.operators.KmvSketch.setSummary(
          blown.filter(col("doc_id") % 2 === 0),
          blown.filter(col("doc_id") % 3 === 0), "text", 128))
    }

    // negative sampling: margin·N candidate rows, hash equi-join to the
    // distributed dense index, anti-join to pairs — no cross join, no
    // single-partition window
    {
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      time(s"negative_samples_${dup}x",
        graft.operators.Sampling.negativeSamples(
          blown.select("doc_id"), "doc_id", pairsD, "id_a", "id_b",
          k = 2, margin = 8))
    }

    // robust stats + decay: grouped exact-percentile / integer-shift
    // aggregates — linear, map-side combined
    {
      val ev = graft.Tables(spark, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"), col("value"))
      val evBig = (0 until dup).map(i =>
        ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
          col("user_id"), col("event_type"), col("ts"), col("value")))
        .reduce(_ unionByName _)
      time(s"mad_anomaly_${dup}x",
        graft.operators.EventSequences.madAnomalies(evBig))
      time(s"trimmed_stats_${dup}x",
        graft.operators.EventSequences.trimmedStats(evBig))
      time(s"decayed_sum_${dup}x",
        graft.operators.EventSequences.decayedSum(evBig))
    }

    // overlap verify under the IntersectPrefilterRule: consecutive-id
    // candidates over the blown corpus — per-pair cost is the merge
    // walk, short-circuited by the derived size conjuncts
    {
      val cand = blown.select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b"))
        .join(blown.select(col("doc_id").as("id_b")), "id_b")
        .select("id_a", "id_b")
      time(s"overlap_verify_${dup}x",
        Dedup.verifyOverlapCount(cand, blown,
          split(lower(col("text")), "\\s+"), "doc_id", 25))
    }

    // readability: pure codegen regexp counts — linear, zero shuffles
    graft.expressions.GraftFunctions.register(spark)
    time(s"readability_${dup}x",
      blown.select(
        graft.operators.TextAnalysis.fleschScore(
          graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
          lit(3L),
          graft.operators.TextAnalysis.syllableCount(col("text"))
            .cast("long")).as("flesch")))

    // feature engineering: hashing trick is one vocabulary-bounded
    // aggregate; target encoding one category aggregate + 1-row
    // broadcast; TF-IDF pairs bounded by the df cap (candidates
    // multiply with dup² inside a band, the pathological upper bound —
    // watch shape, not cost)
    time(s"hashed_features_${dup}x",
      graft.operators.Features.hashedFeatureHistogram(blown, "text", 64))
    locally {
      val cat = blown.select(
        concat(lit("c"), (col("doc_id") % 100).cast("string")).as("cat"),
        (col("doc_id") % 977).cast("double").as("y"))
      time(s"target_encode_${dup}x",
        graft.operators.Features.targetEncode(cat, "cat", "y", 10))
    }
    // df band scales with dup (every df multiplies on the blown
    // corpus; the 1x band would go empty and skip the pair join)
    time(s"tfidf_pairs_${dup}x",
      graft.operators.Features.tfidfRareTermPairs(
        blown, "doc_id", "text", 2, 20 * dup, 20))

    // rank correlation: two per-dim sort windows — fan-out bounded by
    // the 64-dim domain, each partition sorts |corpus| rows
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"rank_corr_${dup}x",
        graft.operators.Features.rankCorrelation(
          embBig, "vec_id", "embedding", "label"))
    }

    // event resample/drift/trend: per-key windows and moment
    // aggregates over one key partitioning — linear in events
    {
      val ev = graft.Tables(spark, dir).events
      val evBig = (0 until dup).map(i =>
        ev.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
          (col("user_id") + lit(i * 10000000L)).as("user_id"),
          col("event_type"), col("ts"), col("value")))
        .reduce(_ unionByName _)
      time(s"gap_fill_locf_${dup}x",
        graft.operators.EventSequences.gapFillLocf(evBig))
      time(s"cusum_drift_${dup}x",
        graft.operators.EventSequences.cusumDrift(evBig))
      time(s"ols_trend_${dup}x",
        graft.operators.EventSequences.olsTrend(evBig))
    }

    // MERGE upsert: one full-outer hash join, changeset side ~40% of
    // the corpus here (worst-case shuffle merge, no broadcast)
    {
      val src = blown.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), concat(col("text"), lit(" v2")).as("text"),
          (col("doc_id") % 7 === 0).as("del"))
      time(s"merge_upsert_${dup}x",
        graft.operators.MergeUpsert.merge(
          blown, src, "doc_id", Seq("text"), "del"))
    }

    // profile drift: one multi-distinct aggregate per snapshot —
    // linear, |cols|-way expand, map-side combined
    time(s"profile_drift_${dup}x",
      graft.operators.DataProfile.drift(
        blown, blown.filter(col("doc_id") % 7 =!= 0),
        Seq("doc_id", "text")))

    // threshold sweep: reads the checkpointed pair list per threshold —
    // pairs-scale explode, never re-runs the pair join
    locally {
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.8)
        .localCheckpoint(true)
      time(s"threshold_sweep_${dup}x",
        Dedup.thresholdSweep(pairsD, "jaccard", "id_a", "id_b",
          Seq(0.8, 0.85, 0.9, 0.95, 1.0)))
    }

    // chi2 screening: distinct (doc, bucket, class) frame → one
    // bucket-bounded aggregate; quantile bins: Ranks range-bucketed
    // per-dim ntile (dims × sub-buckets parallel, no per-dim full sort)
    time(s"chi2_features_${dup}x",
      graft.operators.Features.chi2BinaryFeatures(
        blown, "doc_id", "text", 64, col("doc_id") % 2 === 0))
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"quantile_bins_${dup}x",
        graft.operators.Features.quantileBins(
          embBig, "vec_id", "embedding", 4))
    }

    // mutual nearest: the bitext shape — the blown corpus is the big
    // (A) side, the broadcast (B) side stays at its natural size (the
    // low-resource language); scored frame materialized once
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"mutual_nearest_${dup}x",
        graft.operators.Similarity.mutualNearest(
          embBig.filter(col("label") % 2 === 0),
          emb.filter(col("label") % 2 === 1),
          "vec_id", "embedding"))
    }

    // merkle digest: ONE bucket-keyed shuffle whose map-side combine
    // reduces every task to <= nBuckets partial rows — cost must track
    // the scan, state must not (the whole point of the digest)
    time("merkle_digest_1x",
      graft.operators.DataProfile.merkleDigest(docs, "doc_id", "text", 1024))
    time(s"merkle_digest_${dup}x",
      graft.operators.DataProfile.merkleDigest(blown, "doc_id", "text", 1024))
    time(s"merkle_changed_${dup}x",
      graft.operators.DataProfile.changedBuckets(
        blown, blown.filter(col("doc_id") % 7 =!= 0), "doc_id", "text", 1024))

    // key-skew profile: one key-count aggregate; everything after is
    // <= k rows — the diagnostic must stay cheaper than the shuffle
    // it is deciding about
    locally {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"), col("event_id"))
      val evBig = (0 until dup).map(i =>
        ev.select((col("user_id") + lit(i * 1000000L)).as("user_id"),
          col("event_type"), col("event_id")))
        .reduce(_ unionByName _)
      time(s"key_skew_profile_${dup}x",
        graft.operators.DataProfile.keySkewProfile(evBig, "user_id", 20))

      // frequent pairs: basket distinct is the one fact-scale shuffle;
      // the within-basket self-join is bounded by the level-1 prune
      // (|item vocab| stays 5 here — the aggregate domain never grows)
      time(s"frequent_pairs_${dup}x",
        graft.operators.FrequentItemsets.frequentPairs(
          evBig.select(concat_ws("@", col("user_id").cast("string"),
            (col("event_id") % 97).cast("string")).as("basket"),
            col("event_type")),
          "basket", "event_type", 10L))
    }

    // portable bloom: build side explodes k positions then collapses to
    // <= m distinct bits (map-side combined); probe side is one
    // broadcast semi-join + key-scale aggregate — both linear
    locally {
      val keys = blown.select(col("doc_id").as("k"))
      val bits = graft.operators.BloomJoin.portableBloomBits(
        keys.filter(col("k") % 3 === 0), "k", 1 << 20, 3)
      time(s"bloom_portable_${dup}x",
        graft.operators.BloomJoin.portableMightContain(
          keys, "k", bits, 1 << 20, 3))
    }

    // neighbor-degree aggregation: |E|-bounded join + node-scale
    // aggregates — the single-round pagerank shape
    locally {
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      time(s"neighbor_agg_${dup}x",
        graft.operators.GraphMetrics.neighborDegreeAgg(
          blown.select("doc_id"), "doc_id", pairsD, "id_a", "id_b"))
    }

    // hard negatives: broadcast-queries partial-top-k kernel — linear
    // scan, merge is partitions x queries x k rows
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"hard_negatives_${dup}x",
        graft.operators.Similarity.hardNegativesBatch(
          embBig, "vec_id", "embedding", "label",
          (0L until 10L).toSeq, 10))
    }

    // luhn card redaction: higher-order fold per row, zero shuffles —
    // linear in corpus chars like the regex redaction path
    time(s"luhn_redaction_${dup}x",
      graft.operators.Redaction.redactCards(
        blown.select(col("doc_id"), concat(col("text"),
          lit(" pay 4111111111111111 or 52"),
          lpad((col("doc_id") % 100000000L).cast("string"), 12, "0"),
          (col("doc_id") % 10).cast("string")).as("text")),
        "text", "doc_id"))

    // audio frame features + scene cuts: partition-preserving codec
    // kernels (encode on the executors, decode+feature in the same
    // task) — zero shuffles, linear in media bytes
    locally {
      implicit val s2: SparkSession = spark
      time(s"audio_frames_${dup}x",
        graft.operators.Multimodal.audioFrameFeatures(
          graft.operators.Multimodal.syntheticAudioTable(blown), 16).toDF())
      time(s"scene_cuts_${dup}x",
        graft.operators.Multimodal.sceneCuts(
          graft.operators.Multimodal.syntheticVideoTable(blown), 2L).toDF())
      time(s"image_stats_${dup}x",
        graft.operators.Multimodal.imageChannelStats(
          graft.operators.Multimodal.syntheticImageTable(blown)).toDF())
    }

    // cross-source overlap: pair-scale broadcasts past the label scan,
    // |sources|^2-bounded aggregate — labels never shuffle
    locally {
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      val labels = blown.select(col("doc_id"),
        concat(lit("src"), (col("doc_id") % 20).cast("string")).as("source"))
      time(s"source_overlap_${dup}x",
        Dedup.sourceOverlapMatrix(pairsD, labels,
          "id_a", "id_b", "doc_id", "source"))
    }

    // curriculum interleave: per-source ranks via Ranks range
    // sub-buckets (each task sorts ~n/buckets of one source, never a
    // whole source) + broadcast size/total joins
    locally {
      val withMeta = blown.select(col("doc_id"),
        length(col("text")).as("difficulty"),
        concat(lit("src"), (col("doc_id") % 20).cast("string")).as("source"))
      time(s"curriculum_${dup}x",
        graft.operators.Sampling.curriculumInterleave(
          withMeta, "doc_id", "difficulty", "source"))
    }

    // LM quality scorers: corpus term/bigram counts as vocab-bounded
    // aggregates joined back (AQE broadcast / skew-split), never a
    // partitionBy(term) window pinning a stopword's posting list
    time("unigram_logprob_1x",
      graft.operators.TextAnalysis.unigramLogProbScore(docs, "text", "doc_id"))
    time(s"unigram_logprob_${dup}x",
      graft.operators.TextAnalysis.unigramLogProbScore(blown, "text", "doc_id"))
    time(s"bigram_logprob_${dup}x",
      graft.operators.TextAnalysis.bigramLogProbScore(blown, "text", "doc_id"))

    // PMI collocations: marginals join back onto the minCount-filtered
    // candidate set; the only corpus-scale pass is the pair aggregate
    time(s"pmi_bigrams_${dup}x",
      graft.operators.TextAnalysis.pmiBigrams(blown, "text", 20L * dup))

    // zipf slope: salted two-stage exact top-k per group — the heavy
    // pass runs at groups×salts-way parallelism
    locally {
      val langd = blown.select(col("text"),
        concat(lit("lang"), (col("doc_id") % 5).cast("string")).as("lang"))
      time(s"zipf_slope_${dup}x",
        graft.operators.TextAnalysis.zipfSlope(langd, "text", "lang"))
    }

    // embedding-frame operators at a blown-up corpus: vec_id remapped,
    // embeddings reused (the cost driver is row count, not values)
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _).cache()
      embBig.count()
      // retrieval metrics: one corpus scan + two salted top-k passes
      time(s"retrieval_metrics_${dup}x",
        graft.operators.Evaluation.retrievalMetrics(embBig, "vec_id",
          "embedding", "label", queryIds = Seq(0L, 1L, 2L, 3L, 4L),
          k = 10, prefixDim = 16))
      // k-center: k-1 narrow passes, literal centers, 1-row argmaxes;
      // per-round state is (vec_id, dmin) only — at k=32 the round
      // materializations write 16 B/row, not embedding-width rows
      time(s"kcenter_${dup}x",
        graft.operators.Similarity.kCenterSelect(embBig, "vec_id",
          "embedding", k = 8, seedId = 0L))
      time(s"kcenter_k32_${dup}x",
        graft.operators.Similarity.kCenterSelect(embBig, "vec_id",
          "embedding", k = 32, seedId = 0L))
      // MMR: broadcast-queries pool + bounded driver greedy
      time(s"mmr_${dup}x",
        graft.operators.Similarity.mmrRerank(embBig, "vec_id",
          "embedding", queryIds = Seq(0L, 1L, 2L), nCandidates = 16,
          k = 5))
      // MaxSim: 4x16-d token vectors per doc, 3 queries — exact pays
      // |q|x|d| cosines per doc on one scan; the pruned path's bucket
      // guard should cut scoring work ~2^planes-fold per query
      locally {
        val tokens = embBig.select(col("vec_id"),
          expr("transform(array(0,1,2,3), i -> transform(" +
            "slice(embedding, i*16+1, 16), x -> CAST(x AS DOUBLE)))")
            .as("tok_vecs"))
        val queries = embBig.filter(col("vec_id").isin(0L, 1L, 2L))
          .select(col("vec_id"), col("embedding")).collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)
            .grouped(16).map(_.toSeq).toSeq)).toSeq
        time(s"maxsim_exact_${dup}x",
          graft.operators.Similarity.maxSimTopK(tokens, "vec_id",
            "tok_vecs", queries, k = 10))
        time(s"maxsim_pruned_${dup}x",
          graft.operators.Similarity.maxSimTopKPruned(tokens, "vec_id",
            "tok_vecs", queries, k = 10, numPlanes = 4, maxHamming = 1))
      }
      embBig.unpersist()
    }

    // unigram-LM trainer: ONE corpus pass (word-freq aggregate) no
    // matter the EM depth — the 10x cost is the aggregate, the
    // driver EM is Heaps-bounded; encode is shuffle-free scan work
    locally {
      def trainEncode(df: DataFrame): DataFrame = {
        val pieces = graft.operators.UnigramLm.trainPieces(
          df, "text", vocabSize = 512, maxPieceLen = 3,
          maxCandidates = 4096, emIters = 2)
        graft.operators.UnigramLm.encode(df, "text", pieces)
          .select(col("doc_id"), col("n_tokens"))
      }
      time("unigram_lm_1x", trainEncode(docs))
      time(s"unigram_lm_${dup}x", trainEncode(blown))
    }

    // per-doc keywords: corpus tokenize + vocabulary-bounded df join +
    // per-doc windows bounded by each doc's distinct terms
    time(s"doc_keywords_${dup}x",
      graft.operators.TextAnalysis.docKeywords(
        blown, "doc_id", "text", 3, dfMaxShare = 0.8))

    // rolling distinct actives: explode factor = window length (7),
    // then one day-keyed distinct aggregate
    locally {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("ts"), col("user_id"))
      val evBig = (0 until dup).map(i =>
        ev.select(col("ts"), (col("user_id") + lit(i * 1000000L)).as("user_id")))
        .reduce(_ unionByName _)
      time(s"rolling_distinct_${dup}x",
        graft.operators.EventSequences.rollingDistinct(
          evBig, "ts", "user_id", 7))

      // KS distance: cumulative windows over the DISTINCT-VALUE domain
      val labeled = evBig.select(col("user_id"),
        (col("user_id") % 2 === 0).cast("string").as("g"),
        pmod(col("user_id"), lit(1000)).as("metric"))
      time(s"ks_distance_${dup}x",
        graft.operators.Evaluation.ksDistance(
          labeled, "metric", "g", "true", "false"))
    }

    // class separation: one posexplode aggregate (|labels|*dim rows) +
    // broadcast centroids + label-scale aggregate
    locally {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val embBig = (0 until dup).map(i =>
        emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding"), col("label")))
        .reduce(_ unionByName _)
      time(s"class_separation_${dup}x",
        graft.operators.Similarity.classSeparation(
          embBig, "embedding", "label"))
    }

    // token offsets: posexplode + per-doc cumulative window — fan-out
    // bounded by doc length, linear in corpus tokens
    time(s"token_offsets_${dup}x",
      graft.operators.TextAnalysis.tokenOffsets(blown, "doc_id", "text"))

    // distribution match + k-fold + cluster split: count aggregates,
    // broadcast rates, md5 coin filters / per-group rank windows —
    // nothing wider than one corpus shuffle each
    locally {
      val labeled = blown.select(col("doc_id"),
        concat(lit("g"), (col("doc_id") % 7).cast("string")).as("g"))
      time(s"distribution_match_${dup}x",
        graft.operators.Sampling.distributionMatchSummary(
          labeled, "doc_id", "g"))
      time(s"kfold_${dup}x",
        graft.operators.Sampling.stratifiedKFold(labeled, "doc_id", "g", 5))
      val pairsD = Dedup.ngramJaccardPairs(blown, "text", "doc_id", 0.95)
        .localCheckpoint(true)
      val comp = graft.operators.ConnectedComponents
        .components(pairsD, "id_a", "id_b").localCheckpoint(true)
      time(s"cluster_split_${dup}x",
        Dedup.leakageFreeSplit(blown, comp, "doc_id",
          "node", "component", 10))
    }

    // sweep-line concurrency: per-day windows over session intervals
    locally {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select(col("ts"), col("user_id"))
      val evBig = (0 until dup).map(i =>
        ev.select(col("ts"), (col("user_id") + lit(i * 1000000L)).as("user_id")))
        .reduce(_ unionByName _)
      val iv = evBig
        .groupBy(col("user_id"), session_window(col("ts"), "5 minutes").as("w"))
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
        .select(to_date(col("s")).as("day"), col("s"), col("e"))
      time(s"max_concurrency_${dup}x",
        graft.operators.EventSequences.maxConcurrency(iv, "s", "e", "day"))
    }

    // schema evolution: mergeSchema read over a two-generation dir —
    // footer-merge planning + scan, linear
    locally {
      val p = graft.sources.ParquetEvolution.evolvedDir(
        blown.select(col("doc_id"), col("text"),
          lit("en").as("lang"), length(col("text")).as("n_chars")),
        tag = s"scale_${dup}x")
      time(s"schema_evolution_${dup}x",
        graft.sources.ParquetEvolution.readMerged(spark, p))
    }

    // spatial grid join: candidate volume is Σ per-cell occupancy × 9,
    // so holding DENSITY constant while growing the extent 10× must
    // scale ~linearly — the spatial analogue of the banding checks
    locally {
      def pts(n: Long, xSpan: Long) = spark.range(n).select(
        col("id"),
        (col("id") * 2654435761L % xSpan).as("x"),
        (col("id") * 2246822519L % 1000000L).as("y"))
      time("spatial_grid_1x",
        graft.operators.Spatial.gridNeighborPairs(
          pts(100000L, 1000000L), "id", "x", "y", 5000L))
      time(s"spatial_grid_${dup}x",
        graft.operators.Spatial.gridNeighborPairs(
          pts(100000L * dup, 1000000L * dup), "id", "x", "y", 5000L))
    }

    // skyline: the prefilter must keep the exact pass's global-order
    // window at candidate scale — 10x the cloud, ~flat frontier work
    locally {
      // offset keeps id=0 off the (0,0) corner, which would dominate
      // the whole cloud and trivialize the exact pass
      def cloud(n: Long) = spark.range(1L, n + 1L).select(col("id"),
        ((col("id") * 2654435761L + 987654321L) % 10000000L).as("x"),
        ((col("id") * 2246822519L + 123456789L) % 10000000L).as("y"))
      time("skyline_1x",
        graft.operators.Skyline.skyline2dMin(
          cloud(500000L), "id", "x", "y"))
      time(s"skyline_${dup}x",
        graft.operators.Skyline.skyline2dMin(
          cloud(500000L * dup), "id", "x", "y"))
    }

    // source vocab jaccard: corpus reduces to the distinct (slice,
    // word) frame before the word-keyed self-join — linear in tokens
    time(s"vocab_jaccard_${dup}x",
      graft.operators.TextAnalysis.sourceVocabJaccard(
        blown.select(col("doc_id"), col("text"),
          concat(lit("s"), (col("doc_id") % 10).cast("string"))
            .as("source")),
        "source", "text"))

    // Fellegi-Sunter: pair stream collapses to <=8 pattern counts in
    // one aggregate; 10x pairs, same tiny EM frame
    locally {
      def dict(n: Long) = spark.range(n).select(col("id"),
        (col("id") % (n / 50 + 1)).as("blk"),
        (col("id") % 7).as("f1"), (col("id") % 11).as("f2"),
        (col("id") % 13).as("f3"))
      def pairsOf(n: Long) = {
        val d = dict(n)
        d.as("a").join(d.as("b"),
          col("a.blk") === col("b.blk") && col("a.id") < col("b.id"))
      }
      time(s"fellegi_sunter_${dup}x",
        graft.operators.EntityResolution.fellegiSunterWeights(
          pairsOf(5000L * dup), Seq(
            "f1" -> (col("a.f1") === col("b.f1")),
            "f2" -> (col("a.f2") === col("b.f2")),
            "f3" -> (col("a.f3") === col("b.f3")))))
    }

    // Theil-Sen / Pettitt / nearest-as-of: per-user work is bounded
    // (K² pairs resp. two windows over ~80 events); USERS scale with
    // the corpus, so 10x users should be ~linear wall
    locally {
      def ev(users: Long) = spark.range(users * 80L).select(
        col("id").as("event_id"),
        (col("id") % users).as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          expr(s"(id div $users) * 60000000") +
          (col("id") % users) * 7L).as("ts"),
        ((col("id") * 2654435761L % 1000L).cast("double") / 10.0)
          .as("value"))
      time("theil_sen_1x",
        graft.operators.EventSequences.theilSen(ev(1000L)))
      time(s"theil_sen_${dup}x",
        graft.operators.EventSequences.theilSen(ev(1000L * dup)))
      time(s"pettitt_${dup}x",
        graft.operators.EventSequences.pettittTest(ev(1000L * dup)))
      val big = ev(1000L * dup)
      time(s"asof_nearest_${dup}x",
        graft.operators.AsOfJoin.asOfNearest(
          big.filter(col("event_id") % 3 === 0),
          big.filter(col("event_id") % 3 === 1),
          "user_id", "ts", "value"))
    }

    // k-means: E-step is a broadcast of k vectors against the corpus,
    // M-step a dim-keyed aggregate — 10x vectors should be ~linear
    locally {
      def vecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(15)),
          i => ((col("id") * 37 + i * 101) % 1000).cast("double") / 100.0)
          .as("embedding"))
      time("kmeans_1x",
        graft.operators.Similarity.kmeansLloyd(
          vecs(15000L), "vec_id", "embedding", k = 8, iters = 2))
      time(s"kmeans_${dup}x",
        graft.operators.Similarity.kmeansLloyd(
          vecs(15000L * dup), "vec_id", "embedding", k = 8, iters = 2))
    }

    // retention / survival: corpus → one row per user → one row per
    // (cohort, offset) resp. distinct lifetime; users scale with data
    locally {
      def ev(users: Long) = spark.range(users * 20L).select(
        (col("id") % users).as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          expr(s"(id div $users) * 86400000000") +
          (col("id") % users) * 11L).as("ts"))
      time(s"retention_${dup}x",
        graft.operators.EventSequences.retentionCohorts(
          ev(10000L * dup)))
      // truncate each user's span to (user % 20)+1 days so lifetimes
      // spread 0..19 and real deaths exist (not all-censored)
      time(s"kaplan_meier_${dup}x",
        graft.operators.EventSequences.kaplanMeier(
          ev(10000L * dup).filter(expr(
            "(unix_micros(ts) - 1700000000000000) div 86400000000" +
              " <= user_id % 20"))))
    }

    // weighted median: corpus collapses to the per-(group, value)
    // frame before any window; mod-97: scan-local codegen fold
    locally {
      def vals(n: Long) = spark.range(n).select(
        concat(lit("g"), (col("id") % 7).cast("string")).as("g"),
        ((col("id") * 2654435761L % 100000L).cast("double") / 100.0)
          .as("v"),
        (col("id") % 50 + 1).cast("double").as("w"))
      time(s"weighted_median_${dup}x",
        graft.operators.Inequality.weightedMedianByGroup(
          vals(1000000L * dup), "g", "v", "w"))
      def cand(n: Long) = spark.range(n).select(col("id"),
        concat(lit("DE"),
          lpad((col("id") % 100).cast("string"), 2, "0"),
          lpad(col("id").cast("string"), 16, "0")).as("s"))
      time(s"mod97_${dup}x",
        cand(1000000L * dup)
          .groupBy(graft.operators.Redaction.mod97Valid(col("s"))
            .as("v"))
          .agg(count(lit(1)).as("n")))
    }

    // global rank/ntile family (Ranks): the former unpartitioned-ntile
    // operators — per-user RFM quintiles, lift/gains deciles, per-dim
    // quantile bins — must scale ~linearly in USERS/rows now that
    // ranking is range-bucketed (pre-rewrite, 10x users all sorted in
    // ONE task, three times for RFM)
    locally {
      def ev(users: Long) = spark.range(users * 20L).select(
        col("id").as("event_id"),
        (col("id") % users).as("user_id"),
        timestamp_micros(lit(1700000000000000L) +
          expr(s"(id div $users) * 86400000000") +
          (col("id") % users) * 11L).as("ts"),
        ((col("id") * 2654435761L % 1000L).cast("double") / 10.0)
          .as("value"))
      time("rfm_segments_1x",
        graft.operators.EventSequences.rfmSegments(ev(100000L)))
      time(s"rfm_segments_${dup}x",
        graft.operators.EventSequences.rfmSegments(ev(100000L * dup)))
      def scored(n: Long) = spark.range(n).select(col("id"),
        ((col("id") * 2654435761L) % 100000L).as("score"),
        (col("id") % 7 === 0).as("y"))
      time(s"lift_gains_${dup}x",
        graft.operators.Evaluation.liftGains(
          scored(1000000L * dup), "score", "id", col("y")))
      // (quantile_bins has its own embeddings-based row above)
      // few groups × corpus-scale rows — the exact shape the group-rank
      // rewrite fixes (pre-rewrite: one task sorts a whole stratum)
      def vals(n: Long) = spark.range(n).select(
        concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
        col("id").as("id"),
        ((col("id") * 2654435761L % 100000L).cast("double") / 100.0)
          .as("v"))
      time("gini_by_group_1x",
        graft.operators.Inequality.giniByGroup(
          vals(1000000L), "g", "v", "id"))
      time(s"gini_by_group_${dup}x",
        graft.operators.Inequality.giniByGroup(
          vals(1000000L * dup), "g", "v", "id"))
      time(s"stratified_take_${dup}x",
        graft.operators.Sampling.stratifiedTake(
          vals(1000000L * dup), "g", "id", 0.1))
    }

    // round 13: WordPiece encode (broadcast vocab, zero shuffles —
    // cost must track rows exactly dup-fold)
    if (only.forall(_.exists("wordpiece".startsWith))) {
      val vocab = graft.operators.WordPiece.vocabFromCorpus(
        docs, "text", numMerges = 64)
      time("wordpiece_1x",
        graft.operators.WordPiece.encode(docs, "text", vocab))
      time(s"wordpiece_${dup}x",
        graft.operators.WordPiece.encode(blown, "text", vocab))
    }

    // round 13: persisted BM25 — the BUILD pays one corpus pass
    // (explode + (doc,term) aggregate); the PROBE must stay
    // bucket-bounded (reads ~|terms|/64 of the postings no matter the
    // corpus), so probe time must NOT grow dup-fold
    if (only.forall(_.exists("bm25_indexed".startsWith))) {
      val idxDir = java.nio.file.Files
        .createTempDirectory("graft-scale-bm25-").toString
      time(s"bm25_indexed_build_${dup}x", {
        graft.ingest.TextIndex.writeBm25(blown, "doc_id", "text", idxDir)
        spark.read.parquet(s"$idxDir/_stats")
      })
      time(s"bm25_indexed_probe_${dup}x",
        graft.ingest.TextIndex.bm25Indexed(spark, idxDir,
          Seq("spark", "vector", "customer")))
    }

    // round 16: Tx-PINNED BM25 lifecycle — the standalone probe above
    // is one pruned scan; the pinned probe adds manifest resolution +
    // the idxdv anti-join + live-moment re-weighting (4 shuffles), and
    // all of that extra work must be BUCKET-BOUNDED: probe time tracks
    // |buckets touched|, never corpus size, at 1x and dup-fold alike.
    // deleteWhere masks postings by value (idxdv) — the post-delete
    // probe pays one KB-scale anti-join more, not a rebuild.
    if (only.forall(_.exists("bm25_txpinned".startsWith))) {
      def pinned(corpus: DataFrame, tag: String): Unit = {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-scale-txbm25-$tag-").toString
        graft.sources.TxTable.create(corpus, root, buckets = 32)
        time(s"bm25_txpinned_build_$tag", {
          graft.sources.TxTable.buildBm25Index(spark, root, "bm",
            "doc_id", "text", termBuckets = 64, buckets = 32)
          spark.range(1).toDF("ok")
        })
        time(s"bm25_txpinned_probe_$tag",
          graft.sources.TxTable.bm25ProbeIndexed(spark, root, "bm",
            Seq("spark", "vector", "customer")))
        time(s"bm25_txpinned_delete_$tag", {
          graft.sources.TxTable.deleteWhere(spark, root,
            col("doc_id") % 10 === 0)
          spark.range(1).toDF("ok")
        })
        time(s"bm25_txpinned_delete_probe_$tag",
          graft.sources.TxTable.bm25ProbeIndexed(spark, root, "bm",
            Seq("spark", "vector", "customer")))
      }
      pinned(docs, "1x")
      pinned(blown, s"${dup}x")
    }

    // round 16: CDC replication apply — the merge apply rewrites the
    // whole replica per applied version (table-bounded), the DV apply
    // masks keys + appends rows (delta-bounded). The SAME fixed-size
    // traffic (1000-row update merge, 500-key delete — ids below 3000
    // exist in every base) lands on a 1x and a dup-fold base: the
    // merge tail must scale with the base, the DV tail must not.
    // The documents corpus (50k rows, ~7 MB) is too small for a full
    // rewrite to cost anything — the first probe run measured BOTH
    // tails flat at ~2 s — so the base here is synthetic at 500k/5M
    // rows, where the rewrite asymptote is visible.
    if (only.forall(_.exists("cdc_apply".startsWith))) {
      def synthBase(rows: Long) = spark.range(rows).select(
        col("id").as("doc_id"),
        md5(col("id").cast("string")).as("text"))
      def mirrorProbe(base: DataFrame, tag: String): Unit = {
        val src = java.nio.file.Files
          .createTempDirectory(s"graft-scale-cdc-src-$tag-").toString
        graft.sources.TxTable.create(base, src, buckets = 32)       // v0
        graft.sources.TxTable.setChangeFeed(spark, src, enabled = true)
        graft.sources.TxTable.mergeInto(src,
          base.filter(col("doc_id").between(0, 1999))
            .select(col("doc_id"),
              concat(lit("M:"), col("text")).as("text"),
              lit(false).as("deleted")),
          "doc_id", Seq("text"), "deleted", buckets = 32)           // v2
        graft.sources.TxTable.deleteWhere(spark, src,
          col("doc_id").between(2000, 2999))                        // v3
        val vs = graft.sources.TxTable.versions(spark, src).filter(_ > 0)
        def bootstrap(): String = {
          val dst = java.nio.file.Files
            .createTempDirectory(s"graft-scale-cdc-dst-$tag-").toString
          graft.sources.TxTable.create(
            graft.sources.TxTable.readVersion(spark, src, 0L), dst,
            buckets = 32)
          dst
        }
        // wall-clock alone cannot separate the strategies at probe-
        // feasible sizes (local NVMe absorbs a 5M-row rewrite in
        // seconds — both tails measured ~8-13 s flat), so the probe
        // ALSO reports bytes written by each tail: the structural
        // claim is merge ≈ versions × base bytes, DV ≈ delta bytes.
        def dirBytes(p: String): Long = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(p))
            .iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map(java.nio.file.Files.size).sum
        }
        val dvDst = bootstrap()
        val dvBoot = dirBytes(dvDst)
        time(s"cdc_apply_dv_tail_$tag", {
          vs.foreach(v => graft.sources.TxReplicate.applyTyped(
            spark, dvDst, "doc_id",
            graft.sources.TxTable.readChangesTyped(spark, src, v - 1, v),
            streamId = "mirror", batchId = v))
          spark.range(1).toDF("ok")
        })
        println(f"[scale] cdc_apply_dv_written_$tag%-14s " +
          f"${(dirBytes(dvDst) - dvBoot) / 1e6}%10.1f MB")
        val mgDst = bootstrap()
        val mgBoot = dirBytes(mgDst)
        time(s"cdc_apply_merge_tail_$tag", {
          vs.foreach { v =>
            val ev = graft.sources.TxTable
              .readChangesTyped(spark, src, v - 1, v)
            val apply = ev
              .filter(col("_change_type").isin("insert", "update_postimage"))
              .select(col("doc_id"), col("text"), lit(false).as("deleted"))
              .unionByName(ev.filter(col("_change_type") === "delete")
                .select(col("doc_id"), col("text"), lit(true).as("deleted")))
            if (!apply.isEmpty)
              graft.sources.TxTable.mergeInto(mgDst, apply, "doc_id",
                Seq("text"), "deleted", buckets = 32)
          }
          spark.range(1).toDF("ok")
        })
        println(f"[scale] cdc_apply_merge_written_$tag%-11s " +
          f"${(dirBytes(mgDst) - mgBoot) / 1e6}%10.1f MB")
        // both strategies end at the same state
        val a = graft.sources.TxTable.read(spark, dvDst)
        val b = graft.sources.TxTable.read(spark, mgDst)
        require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
          s"cdc_apply_$tag: DV and merge replicas diverged")
      }
      mirrorProbe(synthBase(500000L), "1x")
      mirrorProbe(synthBase(500000L * dup), s"${dup}x")
    }

    // round 16: snapshot-pinned harvest pagination — each page is
    // `key > cursor ORDER BY key LIMIT n` over the pinned version.
    // The cursor predicate pushes to parquet, so when the table is
    // key-clustered (files carry narrow key ranges) later pages SKIP
    // earlier files via footer min/max and per-page cost stays ~flat
    // in table size; an unclustered store re-scans everything after
    // the cursor each page. Probe: drain 5 fixed-size pages at 1x
    // and dup-fold, clustered vs not.
    if (only.forall(_.exists("snapshot_harvest".startsWith))) {
      def pagedStore(rows: Long, clustered: Boolean): String = {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-scale-harvest-").toString
        val frame = spark.range(rows).select(
          col("id").as("doc_id"),
          md5(col("id").cast("string")).as("text"),
          lpad(col("id").cast("string"), 12, "0")
            .as("_aggregator_identifier"))
        graft.sources.TxTable.create(frame, root,
          clusterCol = if (clustered) Some("doc_id") else None,
          buckets = 32)
        root
      }
      def drainPages(root: String): DataFrame = {
        val store = new graft.query.TxStudyStore(spark, root)
        val fp = graft.query.ResumptionToken.fingerprint("scale-harvest")
        var token: Option[graft.query.ResumptionToken] = None
        var total = 0L
        (1 to 5).foreach { _ =>
          val p = store.queryPage(graft.query.True,
            Seq("doc_id", "text"), 200, token, fp)
          total += p.rows.size
          token = p.token
        }
        spark.range(total).toDF("n")
      }
      Seq(("flat", false), ("clustered", true)).foreach {
        case (kind, clustered) =>
          val r1 = pagedStore(100000L, clustered)
          time(s"snapshot_harvest_${kind}_1x", drainPages(r1))
          val r10 = pagedStore(100000L * dup, clustered)
          time(s"snapshot_harvest_${kind}_${dup}x", drainPages(r10))
      }
    }

    // round 16: edit-distance q-gram blocking — the gram enumeration
    // is the interpreted transform(sequence) shape (HOF tax); probe
    // whether it dominates at 10x BEFORE kernel-rewriting (the
    // three-rung playbook). Dict rows are part-name-like short
    // strings; candidates are gram-bucket-bounded, never all-pairs.
    if (only.forall(_.exists("editdist".startsWith))) {
      val part = spark.read.parquet(s"$dir/part.parquet")
        .groupBy(col("p_name")).agg(min(col("p_partkey")).as("pk"))
      def dict(copies: Int) = (0 until copies).map { i =>
        if (i == 0) part.select(col("pk").as("id"), col("p_name").as("s"))
        else part.select((col("pk") + lit(i * 10000000L)).as("id"),
          concat(col("p_name"), lit(s" c$i")).as("s"))
      }.reduce(_ unionByName _)
      // enumeration-only (the interpreted transform(sequence) HOF
      // shape) vs the full pipeline: if the JOIN dominates at 10x,
      // a gram-kernel rewrite cannot pay
      def gramsOnly(d: DataFrame) = d.filter(length(col("s")) >= 3)
        .select(col("id"),
          explode(expr(
            "transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))"))
            .as("gram"))
        .groupBy("id", "gram").agg(count(lit(1)).as("cnt"))
      time("editdist_grams_1x", gramsOnly(dict(1)))
      time(s"editdist_grams_${dup}x", gramsOnly(dict(dup)))
      time("editdist_pairs_1x",
        graft.operators.EditDistance.pairs(dict(1), "s", "id", maxDist = 2))
      time(s"editdist_pairs_${dup}x",
        graft.operators.EditDistance.pairs(dict(dup), "s", "id", maxDist = 2))
      // the gate's dict is 64 distinct names — too small to stress
      // anything. A 100 TB-shaped dictionary is millions of mostly-
      // distinct strings with a long-tail gram distribution: hex
      // digests keep gram buckets bounded (16^3 gram space), so
      // enumeration cost is isolated from the candidate join
      def hexDict(rows: Long) = spark.range(rows).select(col("id"),
        substring(md5(col("id").cast("string")), 1, 10).as("s"))
      time("editdist_hex_grams_1x", gramsOnly(hexDict(10000L)))
      time(s"editdist_hex_grams_${dup}x",
        gramsOnly(hexDict(10000L * dup)))
      time("editdist_hex_pairs_1x",
        graft.operators.EditDistance.pairs(
          hexDict(10000L), "s", "id", maxDist = 2))
      time(s"editdist_hex_pairs_${dup}x",
        graft.operators.EditDistance.pairs(
          hexDict(10000L * dup), "s", "id", maxDist = 2))
      // prefix-filtered variant on the SAME uniform-gram dictionary:
      // hex grams are all mid-frequency, so the maxDist*q+1 prefix
      // keeps 7 of 8 occurrence keys — near-zero pruning for three
      // extra shuffles. Expected to LOSE here; the honest baseline.
      time("editdist_prefix_1x",
        graft.operators.EditDistance.pairsPrefix(
          hexDict(10000L), "s", "id", maxDist = 2))
      time(s"editdist_prefix_${dup}x",
        graft.operators.EditDistance.pairsPrefix(
          hexDict(10000L * dup), "s", "id", maxDist = 2))
      // the prefix filter's ACTUAL win shape: a shared-format
      // dictionary ("corpus record entry nr <hex>") where ~20 grams
      // of shared formatting sit in EVERY string — the count filter
      // joins on them all (Σ|bucket|² = 20·N², quadratic in corpus),
      // while the prefix filter's 7 rarest occurrences are always
      // hex-bearing grams with bounded buckets. The variable region
      // must be ≥ 8 chars: it yields q-1+8 = 10 hex-touching grams
      // > k·q+1 = 7, so no string is forced to admit a shared gram
      // into its prefix — a 6-char region leaves only 6 rare grams
      // and the forced 7th key degrades the join to quadratic
      // (measured: 539 s at 20k rows; recorded in PERF.md). pairs()
      // runs only at 1x/2x to expose its quadratic; prefix to 10x.
      def fmtDict(rows: Long) = spark.range(rows).select(col("id"),
        concat(lit("corpus record entry nr "),
          substring(md5(col("id").cast("string")), 1, 8)).as("s"))
      time("editdist_shared_pairs_1x",
        graft.operators.EditDistance.pairs(
          fmtDict(2000L), "s", "id", maxDist = 2))
      time("editdist_shared_pairs_2x",
        graft.operators.EditDistance.pairs(
          fmtDict(4000L), "s", "id", maxDist = 2))
      time("editdist_shared_prefix_1x",
        graft.operators.EditDistance.pairsPrefix(
          fmtDict(2000L), "s", "id", maxDist = 2))
      time(s"editdist_shared_prefix_${dup}x",
        graft.operators.EditDistance.pairsPrefix(
          fmtDict(2000L * dup), "s", "id", maxDist = 2))
      // round 17: the DEGENERATE shape (variable region < maxDist·q
      // chars — a 4-char hex tail against k·q = 6) that round 16
      // measured at 539 s/20k rows when the prefix join ran it raw.
      // pairsPrefix now probes the kept-prefix max df at plan time and
      // falls back to the count filter, so this row must land in
      // editdist_shared_pairs territory, not 100× above it.
      def narrowDict(rows: Long) = spark.range(rows).select(col("id"),
        concat(lit("corpus record entry nr "),
          substring(md5(col("id").cast("string")), 1, 4)).as("s"))
      time("editdist_degen_prefix_1x",
        graft.operators.EditDistance.pairsPrefix(
          narrowDict(2000L), "s", "id", maxDist = 2))
      time("editdist_degen_prefix_2x",
        graft.operators.EditDistance.pairsPrefix(
          narrowDict(4000L), "s", "id", maxDist = 2))
    }

    // round 13: HyperBall — register frame is node-scale × m; two
    // rounds over a modular graph (nodes = range/16, edges = 2 per
    // node); cost must track edges, never node²
    if (only.forall(_.exists("hyperball".startsWith))) {
      def modGraph(nEdges: Long) = spark.range(nEdges).select(
        (col("id") % (nEdges / 16)).as("a"),
        ((col("id") * 3 + 1) % (nEdges / 16)).as("b"))
      time("hyperball_2r_1x",
        graft.operators.HyperBall.neighborhoodEstimate(
          modGraph(500000L), "a", "b", maxDepth = 2, m = 16))
      time(s"hyperball_2r_${dup}x",
        graft.operators.HyperBall.neighborhoodEstimate(
          modGraph(500000L * dup), "a", "b", maxDepth = 2, m = 16))
    }

    // round 13: DV delete — cost must be ONE predicate scan +
    // position write (never a table rewrite); the post-delete read
    // pays one anti-join against the positions
    if (only.forall(_.exists("dv_delete".startsWith))) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-dv-").toString
      graft.sources.TxTable.create(blown, root, buckets = 32)
      time(s"dv_delete_${dup}x", {
        graft.sources.TxTable.deleteWhere(spark, root,
          col("doc_id") % 10 === 0)
        spark.range(1).toDF("ok")
      })
      time(s"dv_read_after_${dup}x",
        graft.sources.TxTable.read(spark, root))
    }

    // round 13: per-file Bloom lookup — build pays one corpus scan;
    // the LOOKUP must stay file-subset-bounded regardless of corpus
    if (only.forall(_.exists("bloom_lookup".startsWith))) {
      val root = java.nio.file.Files
        .createTempDirectory("graft-scale-bloomidx-").toString
      blown.repartition(64, col("doc_id"))
        .write.mode("overwrite").parquet(root)
      time(s"bloom_build_${dup}x", {
        graft.ingest.FileBloomIndex.write(spark, root, "doc_id",
          expectedPerFile = 100000L)
        spark.read.parquet(s"$root/_bloom_doc_id")
      })
      time(s"bloom_lookup_${dup}x",
        graft.ingest.FileBloomIndex.lookup(spark, root, "doc_id", 123L))
    }

    // round 13: Avro sink+source — file-per-partition container IO;
    // cost must track bytes dup-fold, read parallelism = part files
    if (only.forall(_.exists("avro".startsWith))) {
      val avroDir = java.nio.file.Files
        .createTempDirectory("graft-scale-avro-").toString
      time(s"avro_roundtrip_${dup}x", {
        graft.sources.AvroIo.write(blown, s"$avroDir/t", numPartitions = 32)
        graft.sources.AvroIo.read(spark, s"$avroDir/t", blown.schema)
      })
    }

    spark.stop()
  }
}
