"""Physical-plan regression tests — the scale-design invariants.

Each assertion encodes a 100 TB promise: filters reach the parquet scan,
scans read only the projected columns, dimension joins broadcast, top-K
never globally sorts, the grouped top-N uses WindowGroupLimit, and the
anti-testset query is the only sanctioned nested-loop join.
"""

from __future__ import annotations

from movie_rec_spark import plans as P
from movie_rec_spark.operators import mutation as M
from movie_rec_spark.operators import relational as R
from movie_rec_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return load_table(spark, SF, name)


def test_top_movies_plan(spark):
    df = R.q_top_movies(_t(spark, "lineitem"), _t(spark, "part"))
    assert P.has_pushed_filter(df, "GreaterThanOrEqual(l_quantity,25.0)")
    assert P.has_broadcast_join(df)
    assert P.has_top_k(df)
    scans = P.scan_read_columns(df)
    li_scan = next(s for s in scans if "l_partkey" in s)
    assert li_scan == {"l_orderkey", "l_partkey", "l_quantity",
                       "l_extendedprice"}, "column pruning regressed"
    # one shuffle (the partial->final agg); dim join must add none
    assert P.count_exchanges(df) == 1


def test_user_queries_push_equality_predicate(spark):
    df = R.q_user_latest_ratings(_t(spark, "orders"), _t(spark, "customer"))
    assert P.has_pushed_filter(df, "EqualTo(o_custkey,1)")
    assert P.has_top_k(df)
    assert P.count_exchanges(df) == 0, "single-user query must not shuffle"


def test_movie_stats_pushdown_and_single_shuffle(spark):
    df = R.q_movie_stats(_t(spark, "lineitem"))
    assert P.has_pushed_filter(df, "Not(EqualTo(l_returnflag,R))")
    assert P.count_exchanges(df) == 1


def test_user_topn_uses_window_group_limit(spark):
    df = R.q_user_topn(_t(spark, "orders"))
    assert P.has_window_group_limit(df)
    assert P.count_exchanges(df) == 1


def test_upsert_uses_window_group_limit(spark):
    df = M.q_upsert_latest(_t(spark, "events"))
    assert P.has_window_group_limit(df)


def test_anti_join_broadcasts_user_side(spark):
    df = R.q_avg_recommendations(_t(spark, "lineitem"), _t(spark, "orders"))
    plan = P.physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert not P.has_shuffle_join(df), \
        "per-user anti-join must broadcast, not shuffle, the seen-set"


def test_candidates_scalable_has_no_cartesian(spark):
    df = R.candidate_counts_scalable(
        _t(spark, "customer"), _t(spark, "part"),
        _t(spark, "lineitem"), _t(spark, "orders"))
    assert not P.has_cartesian(df)


def test_candidates_literal_is_the_only_sanctioned_cross(spark):
    df = R.q_candidates(
        _t(spark, "customer"), _t(spark, "part"),
        _t(spark, "lineitem"), _t(spark, "orders"))
    plan = P.physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan


def test_new_operator_shuffle_budgets(spark):
    """Exchange-count regression guard for the beyond-reference
    operators: these numbers are the design (SCALE.md); a regression
    that adds a shuffle fails here, not in production."""
    import __spark_entry__ as E

    from movie_rec_spark.plans import count_exchanges

    # The budgets are statements about the UNCACHED plans: a .cache()
    # leaked by an earlier suite file substitutes InMemoryRelation into
    # any later query sharing the fragment (Spark's cache manager
    # matches plan subtrees), and the serialized cached plan carries
    # its own Exchange lines — q_als_audit measured 9 > 6 with
    # test_ml's ratings cache live. Start from a clean cache.
    spark.catalog.clearCache()

    budgets = {
        "q_asof_join": 1,       # single fused window
        "q_sessionize": 1,      # session_window agg
        "q_salted_count": 2,    # partial + final by design
        "q_window_analytics": 1,
        "q_percentiles": 4,     # two exact-histogram kernels (price,
                                # qty), each (grp,cents)-keyed agg +
                                # cell-sized group window exchange
                                # [r12 skew fix: raw rows no longer
                                # funnel into |groups| partitions]
        "q_pivot": 1,
        "q_unpivot": 0,         # row-local expand
        "q_range_join": 0,      # broadcast at test scale; equi-join shape
        "q_sample_stable": 0,   # row-local hashing
        "q_quality_score": 0,
        "q_corpus_clean": 1,    # gates/split row-local; dedup window only
        "q_embed_quantize": 0,  # Arrow-batched map-only pass, no shuffle
        "q_tfidf_top_terms": 4,
        "q_ngram_counts": 2,    # [fanout +1] explode + one count agg
        "q_domain_stats": 2,    # distinct-digest partial + final, same key
        "q_dedup_incremental": 2,  # fp-keyed join + fp-keyed window
        "q_knn_int8": 0,        # map-only scoring, TakeOrdered finish
        "q_pack_sequences": 1,  # one shuffle on the shard key
        "q_audio_features": 0,  # map-only decode
        "q_source_balance": 1,  # source-count agg; corpus side unshuffled
        "q_embed_centroids": 2,  # (label,pos) mean + per-label count
        "q_source_overlap": 4,   # distinct, fp self-join, pair agg, sizes
        # r12 note: +N on every budget marked [fanout] = the tiny
        # fanout_scan repartitions (skew.fanout_scan) that spread the
        # single-task test-scale scan before per-shingle/-window md5
        # chains; they move only (doc_id, text), are REUSED across
        # self-join sides at runtime, and vanish at production
        # partition counts (the conditional never fires).
        "q_split_repair": 7,     # decontaminate shuffles + repair join
                                 # [fanout +3]
        "q_epoch_mix": 1,        # source-quality agg; copy explode row-local
        "q_unigram_logprob": 3,  # unigram counts, vocab join, per-doc agg
        "q_chunk_dedup": 2,      # two-phase distinct-doc agg on the digest
        "q_chunk_prune": 2,      # fp-keyed rank + doc-keyed reassembly
        "q_pii_redact": 0,       # pure codegen regexes, map-only
        "q_profile": 22,         # 2-phase agg per column branch (11×2),
                                 # deliberately NOT the 1-exchange Expand
                                 # form (row-replication blowup; docstring)
        "q_bm25": 4,             # tf agg, df agg, dl join, doc-sum agg
        "q_semdedup": 1,         # one cell-keyed applyInPandas group
        "q_funnel": 1,           # stacked windows share ONE user Exchange
        "q_cohort": 3,           # first-seen agg, join-back, matrix agg
        "q_rolling_window": 1,   # one user-keyed window, two-pointer frame
        "q_outer_join": 2,       # agg-before-join on both sides, then join
        "q_hll_union": 4,        # portable-register (day,idx) agg +
                                 # tiny idx merge/estimator aggs + the
                                 # per-day exact-distinct baseline
                                 # column's two-phase distinct (r11
                                 # graduation; was 2 with Datasketches
                                 # binaries — the extra exchanges move
                                 # <=|days|*2^p register rows)
        "q_chunk_knn": 3,        # sparse scoring over the checkpointed
                                 # flat index: dot agg + n2 agg + their
                                 # doc-keyed join (all nnz-row-sized;
                                 # the dense form hid a 64-wide
                                 # materialization behind 0 exchanges)
        "q_scd2": 1,             # one user-keyed sort drives all windows
        "q_snapshot_diff": 4,    # two distinct-aggs + full-outer join
        "q_dedup_canonical": 1,  # CC checkpointed; comp-keyed window only
        "q_weighted_sample": 1,  # row-local key, source-keyed top-k
        "q_fuzzy_match": 2,      # entity collapse + block-keyed self-join
        "q_outliers": 2,         # grouped quantiles (agg + cell window
                                 # [r12 skew fix]); fences broadcast back
        "q_resample": 2,         # counts agg + span agg, both user-keyed
        # round-5 additions
        "q_funnel_window": 1,    # same single-window shape as q_funnel
        "q_decontaminate_k8": 5,  # same shape as k=3: shingle join + agg
                                  # [fanout +3]
        "q_pagerank_general": 1,  # final ordered select; rounds checkpointed
        "q_top_movies_bucketed": 0,  # bucketed layout removes the agg Exch
        "q_merge_snapshot": 0,   # checkpointed merge; read is scan-only
        # round-6 additions
        "q_snapshot_asof": 0,    # checkpointed time-travel read
        "q_snapshot_cdf": 0,     # checkpointed feed read
        "q_anomaly_stream_et": 0,  # checkpointed stream output
        "q_incremental_view": 2,  # view agg + delta agg; joins broadcast
                                 # at test scale (keyed exchanges at 100TB)
        "q_star_revenue": 1,     # six-table star: all dims broadcast,
                                 # only the final per-nation agg moves
        "q_data_quality": 8,     # 1 scan/table row-local + unique/fk aggs
        "q_cumulative_users": 4,  # daily distinct, first-seen, new-per-
                                 # day aggs + |days|-row prefix window
        "q_triangles": 5,        # checkpointed oriented edges feed all
                                 # three plan positions (32 without)
        "q_rest_enrichment": 0,  # registered source + row-local shaping
        "q_event_transitions": 3,  # user lead window + matrix agg +
                                   # from_type normalizer window (tiny)
        "q_rfm": 8,              # static count; AQE dedupes the custkey
                                 # agg to 2 ReusedExchange at runtime
        "q_histogram": 1,        # partial agg -> one O(buckets) Exchange
        "q_session_paths": 2,    # user window (reused by the session
                                 # collapse) + path-count agg
        "q_ab_test": 0,          # scalar agg, map-side partials
        "q_corr_matrix": 0,      # one scalar agg + row-local stack
        "q_bucketed_join": 1,    # co-bucketed facts join shuffle-free;
                                 # only the 5-key priority agg moves
        "q_skyline": 3,          # pair collapse + per-price collapse +
                                 # single-partition frontier scan (input
                                 # bounded to |distinct prices| by then)
        "q_grouping_sets": 1,    # one Expand + one two-phase agg
        "q_mode": 2,             # (status,prio) count + status window
        "q_json_decode": 2,      # countDistinct's two-phase agg pair
        "q_attribution": 2,      # user touch window + channel agg
        "q_changepoint": 1,      # day collapse; the series windows run
                                 # in the same bounded task after it
        "q_heavy_hitters": 2,    # MG summary merge + candidate recount;
                                 # the corpus never keys an exchange
        "q_trend": 2,            # day0 join-back + the five-sum agg
        "q_twap": 1,             # lead window + agg share one user key
        "q_quantile_bins": 2,    # global boundary histogram (cents agg
                                 # + cell-ranking window) broadcast
                                 # back; the bin agg is the real move
        "q_khop": 1,             # per-round joins checkpointed; true
                                 # cost 2/round, SCALE.md caveat
        "q_audience_overlap": 3,  # user set agg + pair agg + sizes agg
                                 # (was 7 as a membership self-join)
        "q_seasonal_naive": 2,   # day collapse + |days|-row lag join
        "q_top_unshipped": 1,    # dims broadcast, dates pushed; only
                                 # the orderkey agg moves (TopK finish)
        "q_active_users": 4,     # one day-keyed pass emits dau+wau
                                 # (offset-0 conditional distinct)
        "q_source_divergence": 4,  # three token counts + scoring agg
        "q_kmeans": 19,          # 2 Lloyd iterations relationally:
                                 # distance/argmin/centroid aggs per
                                 # round, fixed iteration count
        "q_lag_features": 1,     # whole feature row in one user agg
                                 # (now-scalar broadcast, struct-max)
        "q_dedup_prefix": 3,     # df agg + prefix self-join + verify
                                 # (prefix subtree checkpointed)
        "q_new_vs_returning": 3,  # user-day distinct, first-seen, join
        "q_rolling_percentiles": 3,  # day-value histogram, day dim,
                                     # weighted-percentile day agg
        "q_interpolate": 2,      # hourly agg + the lead window over
                                 # observed rows; the dense grid emits
                                 # from a row-local sequence explode
        "q_winsorize": 3,        # boundary percentile agg + cell window
                                 # [r12 skew fix] (broadcast back) + the
                                 # audit agg
        "q_stream_join_et": 0,   # checkpointed stream output
        "q_heavy_hitters_stream": 3,  # recount of the checkpointed
                                      # candidates (2, the batch shape)
                                      # + the final-generation window
                                      # over the tiny emitted set
        "q_merge_stream": 0,     # checkpointed sink read; merges ran
                                 # inside foreachBatch
        "q_item_cooccurrence": 5,  # basket-set agg, pair agg, support
                                   # agg, top-k window (+1 headroom if
                                   # AQE un-broadcasts a join-back);
                                   # was 9 as a basket self-join
        # round-6 wave 4
        "q_autocorr": 1,         # lead window + six-sum agg share ONE
                                 # user-keyed Exchange
        "q_ewma": 2,             # (type, day) count agg + the
                                 # type-keyed lag window
        "q_dedup_containment": 7,  # [fanout +4]
                                   # shingle self-join + pair agg +
                                   # sizes agg (sizes broadcast back)
        "q_rrf": 7,              # bm25 arm (tf/df/doc aggs) + fusion;
                                 # dense arm now scores sparsely over
                                 # the checkpointed flat index (+3:
                                 # dot agg, n2 agg, doc-keyed join —
                                 # nnz-row-sized, replacing the dense
                                 # 64-wide array materialization)
        "q_kcore": 0,            # peeling rounds eager-checkpointed;
                                 # final degree agg reads bare pairs
        "q_label_prop": 0,       # per-round joins/aggs checkpointed
        "q_bpe_merges": 0,       # merge table is collected O(rounds)
                                 # rows; per-round work (dict agg +
                                 # TakeOrdered) runs at build time
        "q_negative_sample": 3,  # seen-pair distinct + the (user,
                                 # item) slot collapse + anti-join/
                                 # window sharing the user key
        "q_bpe_encode": 0,       # reads the checkpointed final dict;
                                 # round work ran at build time
        "q_hard_negatives": 1,   # anchors broadcast; the only move is
                                 # the anchor-keyed top-k window
        "q_length_buckets": 2,   # map-only CASE chain -> one
                                 # O(buckets) aggregate + the
                                 # O(buckets)-row presentation sort
        "q_sessionize_stream": 0,  # checkpointed stream output
        # round-7 additions
        "q_minhash_eval": 13,    # sig agg + band self-join + exact
                                 # inverted-index truth + audit joins
        "q_simhash_eval": 17,    # [fanout +4]
                                 # vote agg + segment self-join + the
                                 # same truth/audit join shape
        "q_pq_knn": 4,           # checkpointed per-round codebooks;
                                 # encode argmin + ADC sum aggs
        "q_ivfpq_knn": 6,        # two checkpointed trainers + encode,
                                 # probe, and the candidate ADC agg
        "q_kmv_distinct": 7,     # 2 corpus-sized (distinct + the
                                 # WindowGroupLimit day ranking); the
                                 # rest move <= days*K rows
        "q_quantile_merge": 3,   # (day,cents)-keyed agg builds the
                                 # checkpointed daily histograms [r12
                                 # skew fix: partial agg collapses rows
                                 # before the exchange]; merge + union
                                 # move histogram rows
        "q_bloom_audit": 5,      # bit-set distinct + probe agg + the
                                 # digest truth join; the probe side
                                 # joins the filter BROADCAST
        # round-8 additions
        "q_hll_audit": 7,        # (day,idx) max agg + per-day/global
                                 # countDistinct pairs + the tiny
                                 # merged-register agg; joins broadcast
        "q_hyperlsh_eval": 9,    # id-rank window + sig/bucket aggs +
                                 # bucket self-join + audit full-outer;
                                 # the GEMM truth is ONE checkpointed
                                 # task, the 8.4M-row position join it
                                 # replaced is gone
        "q_image_neardup": 2,    # synth+dhash are map-only Arrow
                                 # stages behind the checkpoint; only
                                 # the segment self-join + pair dedup
                                 # move
        "q_quality_classifier": 2,  # weights broadcast; one doc-keyed
                                    # agg + the presentation sort
        "q_stream_dedup": 1,     # checkpointed stream output + the
                                 # presentation sort only
        "q_audio_neardup": 2,    # same shape as q_image_neardup:
                                 # map-only Arrow stages behind the
                                 # checkpoint; segment join + dedup
        "q_video_scenes": 3,     # tiny id repartition (unlocks 32-way
                                 # synth parallelism on single-file
                                 # sources) + doc-keyed lag window +
                                 # the presentation sort
        # round-9 additions
        "q_dedup_substring": 4,  # [fanout +1]
                                 # windows shuffle ONCE on fp (dup
                                 # test inside the exchange), island
                                 # merge ONCE on doc_id, + the
                                 # presentation sort
        "q_substring_prune": 6,  # [fanout +2: windows + rebuild side]
                                 # fp-keyed rank/dup window + the
                                 # doc-keyed removed-positions agg +
                                 # join-back (broadcast at test scale;
                                 # headroom if AQE un-broadcasts) +
                                 # presentation sort
        "q_importance_resample": 5,  # bucket stats agg + totals agg
                                     # (both <=B rows, broadcast back)
                                     # + doc-keyed score agg + the
                                     # doc-cardinality global rank +
                                     # presentation sort
        # round-10 additions
        "q_assign_ids": 3,      # batch range-repartition + pid-keyed
                                # rank window + presentation sort; the
                                # ≤P-row offsets agg is broadcast back
        "q_mixture_weights": 3,  # sources-sized agg + tiny total agg
                                 # + O(sources) presentation sort
        "q_shard_balance": 3,   # ≤n_shards-key agg + tiny total agg
                                # + O(shards) presentation sort
        "q_curriculum_order": 2,  # ONE shard-keyed window Exchange
                                  # (per-task = one shard's slice) +
                                  # presentation sort
        "q_dup_stats": 3,       # digest agg + cluster-size histogram
                                # agg + O(sizes) presentation sort
        "q_importance_threshold": 3,  # score-keyed tie window +
                                      # single-partition grid/fine cell
                                      # windows (bounded by the 65536
                                      # grid, never doc rows) + the
                                      # presentation sort; dsir_scored
                                      # and the score histogram sit
                                      # behind localCheckpoints with
                                      # their own budget (3: bucket
                                      # stats, doc score, score hist)
        "q_kanon": 2,            # one qid-keyed agg (map-side
                                 # partials) + the O(classes)
                                 # presentation sort
        "q_kanon_generalize": 4,  # three shrinking class-size aggs
                                  # (broadcast back onto the row
                                  # stream) + presentation sort
        "q_ldiversity": 3,       # two-phase distinct agg pair on the
                                 # qid + the O(classes) sort
        # round-11 additions
        "q_image_dedup_groups": 1,  # CC rounds checkpointed (the
                                    # q_dedup_canonical shape): only
                                    # the comp presentation sort
                                    # remains in the final plan
        "q_simhash_sized": 4,    # [fanout +2]
                                 # vote aggregate + cross-segment
                                 # dedup — widening the signature to
                                 # 96/24 adds NO exchange vs the
                                 # declared 56/14 form
        "q_approx_distinct": 2,  # ≤2^p-key register agg (max is
                                 # duplicate-insensitive, no distinct
                                 # pre-pass) + the exact baseline's
                                 # two-phase distinct
        "q_pipeline_llm": 6,     # every stage handoff is
                                 # localCheckpointed (kept, docs2,
                                 # docs2nd — the r12 near-dedup
                                 # stage — train, docs3: the
                                 # multiply-referenced frames), so
                                 # the final plan is: pack's shard
                                 # window + the weights agg/total +
                                 # the three output joins' exchanges
                                 # (the near-dup stage sits entirely
                                 # behind the docs2nd cut); each
                                 # stage's own budget is asserted on
                                 # its declared query
        # round-12 additions
        "q_als_audit": 6,        # ratings agg + user/item distincts
                                 # (the bounded sample frames) +
                                 # exclude-seen anti-join + the
                                 # user-keyed rank window (WGL) +
                                 # presentation sort; the score block
                                 # itself is a broadcast cross attach
                                 # — no exchange
        "q_pipeline_media": 9,   # pair sets + kept behind stage cuts;
                                 # the final plan: union n_dups
                                 # distinct-agg pair + img/aud hamming
                                 # aggs + video's id repartition +
                                 # doc-keyed lag window (the per-clip
                                 # agg reuses its partitioning) + the
                                 # shard window + presentation sort;
                                 # kept broadcasts into the output
                                 # joins at test scale
        "q_jl_eval": 9,          # sample rank window + projection agg
                                 # + two vector-assembly aggs feeding
                                 # the single-task GEMMs + pair join +
                                 # presentation sort — all sized by
                                 # the FIXED 512-vector sample, never
                                 # the corpus
    }
    qs = E.queries()
    for name, budget in budgets.items():
        df = qs[name](spark, "/root/testdata/sf0.001")
        got = count_exchanges(df)
        assert got <= budget, f"{name}: {got} exchanges > budget {budget}"


def test_importance_threshold_no_unpartitioned_corpus_window(spark):
    """r09-verdict scale-killer guard for the at-scale DSIR form: any
    window that could see corpus-cardinality rows must be
    key-partitioned; windows with an EMPTY partition spec may only
    consume post-aggregation histogram/grid cells (bounded by the
    65536-cell coarse grid, never by doc volume). The structural
    walker lives in tests/plan_guards.py (shared with the
    assign_dense_ids_scalable guard)."""
    import __spark_entry__ as E

    from tests.plan_guards import (
        assert_no_unpartitioned_fullcardinality_window,
    )

    df = E.queries()["q_importance_threshold"](
        spark, "/root/testdata/sf0.001")
    assert_no_unpartitioned_fullcardinality_window(df)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Spark's runtime row-level filtering: a selective filter on one
    join side injects a BLOOM FILTER into the OTHER side's scan, so
    fact rows that cannot match die before the shuffle. Free at real
    scale (on by default once the creation side is under its threshold
    and the application side's scan is big enough); the thresholds are
    forced here because the test corpus is below the 10 GB application
    floor. Pinned so a conf or version change that silently loses the
    optimization fails CI."""
    from pyspark.sql import functions as F

    from movie_rec_spark.sources.catalog import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.001"
        li = load_table(spark, sf, "lineitem")
        o = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
             .groupBy("o_orderpriority").count())
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom" in plan.lower(), \
            "runtime bloom filter no longer injected on the fact scan"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
