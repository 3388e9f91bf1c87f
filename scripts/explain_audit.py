"""Plan-shape audit: the `.explain("formatted")` evidence behind
DESIGN_SCALE.md's shuffle/pushdown claims, in one reviewable artifact.

For each audited query this prints (and appends to PLANS.md when run
with --write):

- number of Exchange operators (shuffles) and their partitioning keys
- PushedFilters / ReadSchema of every parquet scan (column pruning +
  predicate pushdown reaching the source)
- WholeStageCodegen span count (JVM-side execution coverage)
- presence of BroadcastExchange (broadcast joins) / SortMergeJoin

Usage: python scripts/explain_audit.py [sf_dir] [--write]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from aroma_spark.session import get_spark

AUDITED = (
    "signals",
    "rollup_1h",
    "rolling_1h",
    "ohlc_1h",
    "latency_hist_1h",
    "asof_join_1h",
    "doc_minhash_pairs",
    "prefix_filter",
    "doc_split",
    "curate_stats",
    # round-4 analytics wave
    "m4_downsample_1h",
    "zscore_1h",
    "level_shift_w8",
    "corr_len_latency",
    "sax_8",
    "hist_quantiles_1d",
    "cm_est_1d",
    "hll_distinct_1d",
    "lttb_12",
    # round-5 additions
    "doc_redact",
    "doc_domains",
    "burst_collapse",
    "trend_1d",
    "emb_dup_clusters",
    # round-5 second wave
    "bollinger_1h",
    "lateness_1h",
    "role_transitions",
    "dedup_editdist_pairs",
    "doc_tfidf",
    # round-5 third wave: interval analytics
    "conv_kpis",
    "concurrency_1h",
    "utilization_1h",
    # round-5c cohort/engagement wave
    "cohort_retention",
    "active_7d",
    "funnel_counts",
    "xcorr_len_latency_lag1",
    "median_latency_1d",
    "transition_latency",
    "term_postings",
    "stickiness_1_7",
    "burstiness",
    "lifespan_hist",
    # round-5d sequence-shape wave
    "spearman_len_latency",
    "role_streaks",
    "drawdown_text_len",
    "extrema_text_len",
    "gap_outages_5m",
    "activity_heatmap",
    # round-5e runs/distribution wave
    "latency_episodes_5m",
    "record_turns_text_len",
    "monotone_runs_text_len",
    "turn_share_deciles",
    "gini_turns",
    "benford_text_len",
    # round-5f corpus-dynamics pair
    "vocab_growth_daily",
    "zipf_buckets",
    # round-5g observability pair
    "tool_usage",
    "latency_drift_daily",
    # round-5h robust-statistics wave
    "mad_outliers_daily",
    "cusum_changepoint",
    "skew_kurt_daily",
    # round-5i ordinal-analysis wave
    "kendall_len_latency",
    "perm_entropy_text_len",
    "tukey_fences_daily",
    # round-5j observability/corpus pair
    "slo_burn_1h",
    "doc_collocations",
    # round-5k pair
    "turn_repetition",
    "latency_pct_daily",
    # round-5l nonparametric wave
    "ks_drift_daily",
    "mannwhitney_latency_daily",
    "theilsen_text_len",
    # round-5m pair
    "runs_test_text_len",
    "phi_tool_role_daily",
    # round-5n forecast/long-memory pair
    "seasonal_backtest",
    "rs_range_text_len",
    # round-5o multi-scale pair
    "acf_profile_text_len",
    "haar_energy_text_len",
    # round-5p dispersion/engagement pair
    "gmd_text_len_daily",
    "day_streaks",
    # round-5q randomness-diagnostics pair
    "variance_ratio_q2",
    "turning_points_text_len",
    # round-5r corpus-dynamics pair
    "topterms_overlap_daily",
    "term_fano",
    # round-5s seasonal-anomaly/load-shape pair
    "seasonal_outliers_1h",
    "peak_factor_1h",
    # round-5t PQ / cluster-quality pair
    "pq_assign",
    "cluster_purity",
    # round-5u PromQL-flavored pair
    "interp_linear_1h",
    "irate_1h",
    # round-5v readability/concentration pair
    "doc_readability",
    "role_hhi",
    # round-5w load-locality/session-tuning pair
    "value_area_1d",
    "session_gap_sweep",
    # round-5x asymmetric-dedup pair
    "doc_containment_pairs",
    "doc_cluster_histogram",
    # round-5y diversity/fatigue pair
    "conv_ttr",
    "latency_by_depth",
    # round-5z weighted-median/rate-test pair
    "wmedian_latency_daily",
    "tool_rate_ztest",
    # round-6a survival/adoption pair
    "conv_survival",
    "tool_adoption",
    # round-6b robust-location pair
    "trimmed_mean_latency_daily",
    "mode_text_len_daily",
    # round-6c corpus-report pair
    "langid_confusion",
    "doc_source_profile",
    # round-6d business-metric pair
    "value_rollup_1d",
    "props_k_stats",
    # round-6e relational pair
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    # round-6f snowflake/semijoin pair
    "tpch_q5_regional",
    "tpch_q18_large",
    "tpch_q14_promo",
    # round-6g drawdown-duration/model-adequacy pair
    "underwater_text_len",
    "residual_autocorr_1h",
    # round-6h CRM pair
    "rfm_users",
    "pareto_revenue",
    # round-6i funnel/operations pair
    "timed_conversion_1h",
    "orders_status_priority",
    # round-6j dedup-audit/operations pair
    "lsh_candidate_quality",
    "returns_by_month",
    # round-6k balance/concentration pair
    "customer_balance_segments",
    "supplier_share_1mo",
    # round-6l horizon/dialogue pair
    "seasonal_backtest_weekly",
    "alternation_rate",
    # round-6m growth/revenue pair
    "growth_accounting",
    "tpch_q6_revenue",
    # round-6n join pair
    "tpch_q10_returns",
    "tpch_q22_idle",
    # round-6o trade/disjunction pair
    "tpch_q7_trade",
    "tpch_q19_disjunct",
    # round-6p cadence/vector pair
    "interpurchase_1d",
    "emb_norm_profile",
    # round-6q smoothing/engagement pair
    "rolling_revenue_7d",
    "bounce_rate_1d",
    # round-6r distribution/idle pair
    "doc_len_quartiles",
    "idle_share_1d",
    # round-6s affinity/fulfillment pair
    "role_cooccur",
    "fulfillment_priority",
    # round-6t path/heatmap pair
    "trigram_paths",
    "revenue_heatmap",
    # round-6u boundary/frequency pair
    "conv_boundary_roles",
    "orders_per_cust_hist",
    # round-6v activation/recovery pair
    "ttft_1d",
    "error_recovery_1d",
    # round-6w provenance/category pair
    "doc_source_ttr",
    "part_class_rev",
    # round-6x growth/balance pair
    "dod_growth",
    "lang_source_mix",
    # round-6y depth/duplication pair
    "depth_tool_rate",
    "doc_dup_rate_lang",
    # round-6z basket/topline pair
    "value_percentiles_1d",
    "wow_revenue",
    # round-7a schedule/cost pair
    "peak_hour_dow",
    "tool_latency_1d",
    # round-7b audit/mix pair
    "order_price_audit",
    "region_rev_mix",
    # round-7c monthly/span pair
    "mau_1mo",
    "conv_span_1d",
    # round-7d script/seasonality pair
    "charclass_lang",
    "orders_month_mix",
    # round-7e..7i batch
    "ship_delay_nation",
    "signup_purchase_lag",
    "revenue_new_ret",
    "tool_diversity",
    "order_value_priority",
    "first_role_mix_1d",
    "purchase_by_depth",
    "top_order_1mo",
    "error_rate_hod",
    "emb_dim_profile",
    # round-7o batch
    "asof_join_1h_near",
    "null_census",
    "freshness_audit",
    "priority_segment_mix",
    # round-7p batch
    "doc_quality_gate",
    "lines_per_order",
    "last_role_mix_1d",
    "gap_dominance_1d",
    # round-7q batch
    "burst_user_1d",
    "top_buyer_1d",
    "emb_centroid_align",
    "pk_audit",
    "median_len_by_role",
    # round-7r batch
    "conv_phase_profile",
    "conversion_by_entry",
    "revenue_outliers",
    "value_quality",
    # round-7s batch
    "cohort_retention_1w",
    "error_convs_1w",
    "doc_word_len_hist",
    "hour_coverage_1d",
    # round-7t batch
    "spend_deciles",
    "emb_sparsity",
    "doc_cross_source_dup",
    # round-7u batch
    "retail_markup",
    "orders_dow_mix",
    "id_density",
    # round-7v batch
    "tool_purchase_lift",
    "weekend_start_conv",
    # round-7w pair
    "value_speed_deciles",
    "type_hour_lift",
    # round-7x batch
    "repeat_buyers_1w",
    "orders_per_cust_region",
    "discount_hist",
    # round-7y pair
    "partition_balance",
    "latency_by_len",
    # round-7z pair
    "order_backlog_1d",
    "turn_density_1d",
    # round-8a pair
    "median_latency_by_role",
    "conv_day_turns",
    # round-8b pair
    "priority_mix_1mo",
    "doc_quality_by_len",
    # round-8c pair
    "props_k_hist",
    "emb_norm_quartiles",
    # round-8d pair
    "median_value_type",
    "first_response_1d",
    # round-8e pair
    "tpch_q4_late",
    "tpch_q21_waiting",
    # round-8f pair
    "cohort_ltv_1w",
    "purchase_attribution",
    # round-8g pair
    "audience_overlap_7d",
    "trending_terms_1d",
    # round-8h pair
    "user_type_conc",
    "spend_decile_mob",
    # round-8i pair
    "hll_overlap_1d",
    "revenue_pacing_1mo",
    # round-8j pair
    "order_sla_1mo",
    "rolling_median_rev_7d",
    # round-8k pair
    "conv_p95_profile",
    "reciprocity_matrix",
    # round-8l pair
    "qty_discount_curve",
    "cust_trend_sign",
    # round-8m pair
    "dedup_savings",
    "supplier_breadth",
    # round-8n pair (streaming_locf_parity is a staged-stream drive,
    # not a plan to audit; its evidence is the oracle hash)
    "dup_rate_by_len",
    # round-8o pair
    "tool_aftermath",
    "repurchase_lag",
    # round-8p pair
    "error_abandonment",
    "intraday_value",
    # round-8q pair
    "tool_position",
    "brand_price_spread",
    # round-8r pair
    "asof_match_rates",
    "revenue_seasonal_idx",
    # round-8s pair
    "region_rollup_subtotals",
    "role_pivot_1d",
    # round-8t pair
    "split_leakage",
    "oov_rate_1d",
    # round-8u pair
    "benford_order_value",
    "round_number_audit",
    # round-7j..7n batch
    "lattice_parity",
    "text_len_cdf",
    "doc_prefix_dup",
    "order_gap_hist",
    "latency_spread_1d",
    "role_mix_drift_1w",
    "supplier_bal_nation",
    "weekend_mix",
    "source_lang_entropy",
    "top_term_lang",
)


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(name: str, text: str) -> str:
    # formatted explain: "(4) Exchange" header lines with the
    # partitioning in a later "Arguments: hashpartitioning(...)" line;
    # codegen membership as "[codegen id : N]" annotations
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", text))
    part_args = re.findall(r"Arguments: (\w+partitioning)\(([^),]*)", text)
    exchanges = [f"{kind}({key.strip()}…)" for kind, key in part_args]
    n_bx = len(re.findall(r"\(\d+\) BroadcastExchange\b", text))
    n_smj = text.count("SortMergeJoin")
    n_wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", text)))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", text)
    lines = [f"### {name}"]
    lines.append(
        f"- exchanges: {n_ex}"
        + (f" — {', '.join(exchanges)}" if exchanges else "")
    )
    lines.append(
        f"- broadcast exchanges: {n_bx}; sort-merge joins: {n_smj}; "
        f"whole-stage codegen spans: {n_wsc}"
    )
    for i, (pf, rs) in enumerate(zip(pushed, schemas)):
        cols = [c.split(":")[0] for c in rs.split(",") if ":" in c]
        lines.append(
            f"- scan {i}: pushed=[{pf or '—'}] columns={','.join(cols)}"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.001"
    write = "--write" in sys.argv
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = ["# PLANS — physical-plan audit of the headline queries\n",
           f"(generated by scripts/explain_audit.py at {sf_dir}; Spark "
           f"{spark.version}, AQE on — final plans may fuse further at "
           "runtime)\n"]
    for name in AUDITED:
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        out.append(summarize(name, plan_text(df)))
        print(out[-1])
    if write:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(root, "PLANS.md"), "w") as f:
            f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
