package graft
import org.apache.spark.sql.SparkSession

/** Task-metrics tap: accumulates shuffle bytes across all stages so each
  * bench query can report its shuffle volume — the direct measure of the
  * "minimize shuffles" design rule (a correct-but-shuffle-heavy plan is
  * not done). */
private class ShuffleTap extends org.apache.spark.scheduler.SparkListener {
  val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
  override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null)
      shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
  }
}

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The engine's only unpartitioned windows run over pipeline-agg BUCKET
    // frames whose size is ENFORCED in-plan (Aggs.boundedFrame raises
    // beyond the 100k cap — AggsSpec pins it), so WindowExec's
    // single-partition warning is a false positive here by construction.
    // Named occupants (r11 audit — every Window.orderBy in main source):
    // the ES pipeline aggregations over their parent's bucket frame
    // (derivative / cumulative_sum / moving_fn / serial_diff at
    // aggs.scala:171-258, change_point at :172, percentiles_bucket via the
    // same applyPipelines gate) and ES|QL's CHANGE_POINT (esql.scala:248)
    // — all routed through boundedFrame; no corpus-sized frame can reach
    // them. Demote that one logger in the bench harness only, to keep the
    // tail signal-dense; the library itself never touches log config.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // fixture identity gate (r12): when a checked-in manifest exists for
    // this fixture (fixtures/<basename>.manifest.json — recorded for the
    // regenerable /tmp/graft-sf1, absent for the driver-owned testdata
    // dirs), refuse to time a fixture that doesn't match it — otherwise a
    // silently-different regeneration poisons every round-over-round
    // comparison. One counting pass per table, before any timer starts.
    FixtureManifest.checkedInManifest(sfDir).foreach { m =>
      FixtureManifest.check(spark, sfDir, m.toString)
      System.err.println(s"[bench] fixture $sfDir matches manifest $m")
    }
    // warm the session (codegen compiler, parquet reader init, OS page
    // cache) so no timed query absorbs one-time setup: the first read of
    // documents.parquet otherwise costs ~1.5s of decompress/init that
    // belongs to no particular query
    def warm(s: SparkSession): Unit = {
      s.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()
      // collect() the per-column aggregate — its VALUES force every data page
      // to decompress. (A terminal .count() lets ColumnPruning strip the inner
      // aggregates down to a metadata-only scan, warming nothing; same for a
      // bare count().)
      Seq("nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")
        .foreach { t =>
          val df = s.read.parquet(s"$sfDir/$t.parquet")
          df.select(df.columns.map(c =>
            org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.col(c)).as(c)): _*).collect()
        }
      // JIT-warm the regex text-match path (~2s of cold java.util.regex +
      // codegen that otherwise lands on whichever search query runs first)
      import org.apache.spark.sql.functions.{col, lower}
      s.read.parquet(s"$sfDir/documents.parquet")
        .where(lower(col("text")).rlike("\\bwarmup_token_zzz\\b")).count()
    }
    warm(spark)
    // self-certification taps (r13): the verdict's standing rule is that a
    // bench regression needs worktree archaeology to tell code from a
    // contended sandbox — so the artifact now carries the evidence itself:
    // per-query RAW runs (spread visible), the OS load average sampled as
    // each query starts (contention visible), and a small cpus=4 companion
    // pass at the end (a contended 32-thread window inflates wide plans
    // 2-3x while the 4-thread medians sit at their usual level — the r12
    // signature; a real plan regression moves BOTH).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    // r14 (the r13 verdict's direct-contention-signal demand): the sf1
    // window showed tight spreads + low loadavg during a 3-4x inflation,
    // so neither raw runs nor load_avg catches cgroup-level contention.
    // Record the DIRECT signals per query: the cgroup's cpu.stat
    // throttled time (quota throttling) and /proc/pressure/cpu's "some"
    // stall total (any-task-runnable-but-not-running — nonzero under
    // cpu contention from ANY source, including sibling containers).
    // Deltas in microseconds across each query's runs; -1 = unreadable.
    def readCounter(path: String, key: String): Long = {
      try {
        val src = scala.io.Source.fromFile(path)
        try src.getLines().flatMap { l =>
          val t = l.trim.split("\\s+")
          if (path.endsWith("pressure/cpu")) {
            if (t.headOption.contains(key))
              t.find(_.startsWith("total=")).map(_.stripPrefix("total=").toLong)
            else None
          } else if (t.headOption.contains(key)) Some(t.last.toLong) else None
        }.toSeq.headOption.getOrElse(-1L)
        finally src.close()
      } catch { case _: Throwable => -1L }
    }
    def cpuStall(): (Long, Long) = {
      // cgroup v2 cpu.stat carries throttled_usec; v1 throttled_time (ns)
      val v2 = readCounter("/sys/fs/cgroup/cpu.stat", "throttled_usec")
      val throttled =
        if (v2 >= 0) v2
        else {
          val ns = readCounter("/sys/fs/cgroup/cpu/cpu.stat", "throttled_time")
          if (ns >= 0) ns / 1000 else -1L
        }
      (throttled, readCounter("/proc/pressure/cpu", "some"))
    }
    val tap = new ShuffleTap
    spark.sparkContext.addSparkListener(tap)
    // Repeat-and-keep-median guard (r10, replacing the r7 slow-tail-only
    // min-of-two): EVERY query runs `benchRuns` times and the MEDIAN is
    // kept. Single timings on this sandbox carry ±50% noise on sub-3 s
    // queries (r9: two dedup queries swung +50%/+31% in a round that never
    // touched them) and a single cold read can multiply a timing 30-40×
    // (r7: q_dedup_corpus 184 s driver vs 5 s idle) — the median of three
    // is robust to one outlier in either direction, where min-of-two still
    // passed one-sided noise through. Even run counts keep the LOWER
    // middle: always an actually-observed run, biased toward the
    // plan-quality signal rather than the storage-latency sample.
    val benchRuns =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val results = SparkEntry.queries.map { case (name, fn) =>
      val sh0 = { // complete metrics before reading the counter
        org.apache.spark.sql.graft.Bridge.drainListeners(spark.sparkContext)
        tap.shuffleBytes.get()
      }
      val load0 = osBean.getSystemLoadAverage
      val (thr0, psi0) = cpuStall()
      // a failed query must be visible as a failure, not recorded as a
      // normal (time-to-failure) timing.
      // Action = materialize the query's OWN plan (toRdd.count): a bare
      // df.count() re-optimizes FOR counting — column decode is pruned and
      // whole operators vanish (a left join with distinct right keys is
      // eliminated outright, so q_dedup_span_removal "cost" 0.19 s while
      // never running its join). toRdd executes the plan as the user would
      // receive it, minus only the driver-side row decode.
      def run(): Double = {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
                 catch { case _: Throwable => false }
        val sec = (System.nanoTime() - t0) / 1e9
        if (ok) sec else -1.0
      }
      val first = run()
      // shuffle volume is a plan property — read it after the FIRST run so
      // the repeats don't double-count the exchange bytes
      org.apache.spark.sql.graft.Bridge.drainListeners(spark.sparkContext)
      val shuffled = tap.shuffleBytes.get() - sh0
      val runs = first +: Seq.fill(benchRuns - 1)(run())
      val good = runs.filter(_ >= 0).sorted
      // any successful run counts; all-failed stays the -1 failure marker
      val sec = if (good.isEmpty) -1.0 else good((good.size - 1) / 2)
      val (thr1, psi1) = cpuStall()
      val stall = (if (thr0 >= 0 && thr1 >= 0) thr1 - thr0 else -1L,
        if (psi0 >= 0 && psi1 >= 0) psi1 - psi0 else -1L)
      name -> (sec, shuffled, runs, load0, stall)
    }
    // cpus=4 companion medians over a pinned subset — the sandbox-noise
    // canaries (every query the r9-r12 rounds ever suspected of a
    // regression that turned out environmental, plus the headline search/
    // agg paths). Runs in a FRESH local[4] session after the main pass:
    // at 4 threads the sandbox's CPU contention has ~no room to inflate a
    // wide plan, so "32-thread median up, 4-thread median flat" reads as
    // contention from the artifact alone. Opt out with SPARK_GRAFT_CPUS4=0.
    val cpus4Queries = Seq(
      "q_search_topk", "q_search_rowload", "q_search_bm25",
      "q_search_wildcard", "q_upsert_lww", "q_agg_terms",
      "q_agg_date_histogram", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_minhash_salted", "q_dedup_embedding", "q_dedup_semantic",
      "q_dedup_corpus", "q_dedup_edit", "q_suggest_phrase_store",
      "q_split_leakage_safe", "q_curate_corpus",
      // the ANN store family's canary (r13): serve-side, cheap, and on
      // the partition-pruned path every maintenance verb feeds
      "q_similarity_ann_store", "q_text_bigram_nll_store")
    val cpus4: Map[String, Double] =
      if (sys.env.getOrElse("SPARK_GRAFT_CPUS4", "4") == "0") Map.empty
      else {
        spark.stop()
        val s4 = SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.sql.adaptive.enabled", "true")
          .getOrCreate()
        s4.sparkContext.setLogLevel("WARN")
        warm(s4)
        val out = cpus4Queries.flatMap { name =>
          SparkEntry.queries.get(name).map { fn =>
            def run4(): Double = {
              val t0 = System.nanoTime()
              val ok = try { fn(s4, sfDir).queryExecution.toRdd.count(); true }
                       catch { case _: Throwable => false }
              val sec = (System.nanoTime() - t0) / 1e9
              if (ok) sec else -1.0
            }
            val good = Seq.fill(benchRuns)(run4()).filter(_ >= 0).sorted
            name -> (if (good.isEmpty) -1.0 else good((good.size - 1) / 2))
          }
        }.toMap
        s4.stop()
        out
      }
    // failed queries serialize as null, never as -1: a -1 "timing" is
    // indistinguishable from a real value to a consumer that averages or
    // plots the map — the separate "failed" count is the failure signal
    val qs = results.map { case (k, (v, _, _, _, _)) =>
        s"\"" + k + "\":" + (if (v < 0) "null" else v.toString) }
      .mkString("{", ",", "}")
    val sh = results.map { case (k, (_, s, _, _, _)) => s"\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    // self-certification detail: the raw runs behind each median (failed
    // runs as -1 — the medians above already exclude them), and the OS
    // 1-min load average as the query started
    val rawRuns = results.map { case (k, (_, _, rs, _, _)) =>
        s"\"" + k + "\":" + rs.map(r =>
          BigDecimal(r).setScale(3, BigDecimal.RoundingMode.HALF_UP))
          .mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val loads = results.map { case (k, (_, _, _, l, _)) =>
        s"\"" + k + "\":" +
          BigDecimal(l).setScale(2, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    val stalls = results.map { case (k, (_, _, _, _, (thr, psi))) =>
        s"\"" + k + "\":[" + thr + "," + psi + "]" }
      .mkString("{", ",", "}")
    val cpus4Json = cpus4.toSeq.sortBy(_._1).map { case (k, v) =>
        s"\"" + k + "\":" + (if (v < 0) "null"
          else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)) }
      .mkString("{", ",", "}")
    // total covers the queries that ran; failures are counted, not summed
    val total = results.values.map(_._1).filter(_ >= 0).sum
    val totalShuffle = results.values.map(_._2).sum
    // keep round-over-round totals comparable: call out queries added since
    // the named baseline round, so a total delta is read against the
    // query-count delta, not as a regression. The baseline marker makes the
    // list self-describing — if a future round forgets to refresh it, the
    // field still reads truthfully as "since r3", never as a stale "new
    // this round".
    val newQueriesBaseline = "r7" // ran 210 queries (205 + 5 NTZ-failed)
    val newQueries = Seq(
        // r8 (vs the r7 bench's 210 queries; the 5 NTZ-failed r7 queries
        // are repairs, not additions, and are excluded)
        "q_agg_categorize", "q_agg_children", "q_agg_cumulative_card",
        "q_agg_geo_line", "q_agg_moving_pctl", "q_agg_parent",
        "q_agg_random_sampler", "q_agg_sampler_plain", "q_agg_scripted_metric",
        "q_agg_var_width", "q_analyze", "q_esql_dissect", "q_esql_eval",
        "q_esql_lookup", "q_esql_stats", "q_field_caps", "q_mget",
        "q_mix_temperature", "q_rank_eval", "q_scroll",
        "q_search_collapse_inner", "q_search_explain", "q_search_geo_polygon",
        "q_search_rrf", "q_search_script_score", "q_suggest_completion_ctx",
        "q_termvectors", "q_text_bigram_nll", "q_text_dup_ngrams",
        "q_search_sparse_vector", "q_search_min_score", "q_count",
        "q_admin_stats", "q_reindex", "q_snapshot_restore",
        "q_agg_composite_date", "q_mix_epochs", "q_search_retriever",
        "q_search_synonyms", "q_analyze_custom", "q_terms_enum",
        "q_search_index_pattern", "q_esql_metadata", "q_esql_inlinestats",
        "q_esql_bucket", "q_agg_ip_range", "q_bpe_train",
        // r8 second session
        "q_agg_ip_prefix", "q_agg_frequent_sets", "q_agg_change_point",
        "q_agg_bucket_corr", "q_agg_ks_test", "q_search_geo_shape",
        "q_search_geo_shape_envelope", "q_search_span_masking",
        "q_esql_sample", "q_esql_change_point", "q_esql_row", "q_esql_mv",
        "q_esql_dates", "q_quality_gopher", "q_quality_c4", "q_filter_url",
        "q_text_normalize", "q_corpus_stats", "q_dedup_semantic",
        "q_dedup_semantic_kmeans", "q_sql", "q_sql_join",
        // r8 third session
        "q_agg_time_series", "q_agg_geohex", "q_search_mvt_hits",
        "q_search_mvt_grid", "q_upsert_versioned", "q_upsert_cas",
        "q_upsert_scripted", "q_admin_search_shards", "q_train_shuffle",
        "q_search_date_math", "q_quality_classifier", "q_augment_mask",
        "q_search_geo_grid", "q_search_script_fields", "q_search_indices_boost", "q_strip_boilerplate", "q_contrastive_pairs",
        "q_similarity_bbq", "q_similarity_bbq_exact", "q_dedup_edit", "q_esql_now", "q_agg_composite_missing", "q_search_knn_multi", "q_tokenize_ids",
        // r10
        "q_upsert_scripted_dup", "q_dedup_minhash_salted",
        "q_query_validate_explain", "q_admin_stats_segments",
        "q_skew_adaptive", "q_suggest_phrase_store", "q_search_bm25_store",
        "q_suggest_completion_store",
        // r11
        "q_completion_store_append", "q_norms_append",
        "q_suggest_store_append", "q_suggest_term_store",
        "q_termvectors_store",
        // r12
        "q_agg_significant_text_store", "q_bigram_lm_append",
        "q_bm25_upsert_store", "q_dedup_semantic_escape",
        "q_ngram_store_append", "q_search_mlt_store",
        "q_text_bigram_nll_store", "q_text_dup_ngrams_store",
        "q_tokenize_ids_store", "q_esql_stats_ext", "q_esql_to_ip",
        "q_esql_mad")
      .filter(results.contains).map("\"" + _ + "\"").mkString("[", ",", "]")
    val cpus4Total = cpus4.values.filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""shuffle_bytes":$sh,"total_shuffle_bytes":$totalShuffle,""" +
      s""""query_count":${results.size},"new_queries_baseline":"$newQueriesBaseline",""" +
      s""""new_queries_since_baseline":$newQueries,""" +
      s""""action":"materialize_rows (toRdd.count; r5 change — a bare count() let the optimizer elide column decode and whole joins, under-measuring projection-shaped queries)",""" +
      s""""runs_per_query":$benchRuns,"stat":"median (r10 — single timings carry sandbox noise; lower middle on even counts)",""" +
      s""""runs":$rawRuns,"load_avg_1m":$loads,""" +
      s""""cpu_stall_usec":$stalls,""" +
      s""""cpu_stall_note":"per-query [cgroup cpu.stat throttled delta, /proc/pressure/cpu some-stall delta] in usec across the query's runs; -1 = counter unreadable. The DIRECT contended-window signal the r13 sf1 archaeology lacked: stall total rising while load_avg sits low reads as host-level contention.",""" +
      s""""available_processors":${Runtime.getRuntime.availableProcessors},""" +
      s""""cpus4":$cpus4Json,"cpus4_total":${
        BigDecimal(cpus4Total).setScale(3, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""self_certification":"runs = raw timings behind each median (spread exposes one-sided noise); load_avg_1m = OS load as the query started; cpus4 = fresh local[4] medians over the noise-canary subset — 32-thread median up while cpus4 flat reads as sandbox contention, both up reads as a real regression",""" +
      s""""sf":"$sfDir"}"""
    // Full per-query detail (~7 KB with 190+ queries) goes to bench.json in
    // the working directory (= repo root under sbt).
    java.nio.file.Files.write(java.nio.file.Paths.get("bench.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // Stdout gets a COMPACT line instead: every BENCH_rN artifact to date
    // has "parsed": null because the harness keeps only the last ~2000
    // chars of stdout — the full JSON line is longer than that window, so
    // its head is truncated and it never parses. Headline subset + rounded
    // values keeps this line well under 1500 chars so it survives the tail
    // window whole (build.sbt also suppresses the trailing "[success]"
    // line so this stays the last stdout line).
    val headline = Seq(
      "q_search_topk", "q_search_rowload", "q_search_bm25", "q_search_wildcard",
      "q_search_knn", "q_agg_terms", "q_agg_date_histogram", "q_agg_composite",
      "q_agg_percentiles", "q_agg_cardinality_approx", "q_upsert_lww",
      "q_bulk_ndjson", "q_doc_projection", "q_dedup_exact", "q_dedup_minhash",
      "q_dedup_simhash", "q_dedup_embedding", "q_similarity_topk",
      "q_similarity_ivf", "q_text_langid", "q_text_quality", "q_text_tokens",
      "q_text_fingerprint", "q_stream_window", "q_ttl_expire", "q_segment_roll",
      "q_sessionize", "q_flatten")
    val hq = headline.flatMap(k => results.get(k).map { case (v, _, _, _, _) =>
      "\"" + k + "\":" + (if (v < 0) "null"
        else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString) })
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${
      BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      },"unit":"sec","queries":$hq,""" +
      s""""query_count":${results.size},"failed":${
        results.count(_._2._1 < 0)},"total_shuffle_bytes":$totalShuffle,""" +
      s""""cpus4_total":${
        BigDecimal(cpus4Total).setScale(3, BigDecimal.RoundingMode.HALF_UP)
      },"load_avg_max":${
        BigDecimal(results.values.map(_._4).max)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      },"queries_detail":"bench.json (runs/load_avg_1m/cpus4 self-certification)","sf":"$sfDir"}"""
    println(compact)
    spark.stop()
  }
}
