from aroma_spark.operators.normalize import dedup_exact, normalize  # noqa: F401
from aroma_spark.operators.signals import with_signals  # noqa: F401
from aroma_spark.operators.tiers import (  # noqa: F401
    TIER_SPECS,
    rollup_lattice,
    rollup_tier,
    rollup_tier_salted,
)
from aroma_spark.operators.gapfill import gapfill_grid  # noqa: F401
from aroma_spark.operators.vocab import (  # noqa: F401
    build_vocab,
    encode_tokens,
    top_k_tokens,
    vocab_add,
    vocab_sub,
)
from aroma_spark.operators.rolling import rolling_window_stats  # noqa: F401
from aroma_spark.operators.downsample import (  # noqa: F401
    counter_increase,
    m4_downsample,
    time_weighted_avg,
)
from aroma_spark.operators.anomaly import (  # noqa: F401
    rolling_zscore,
    seasonal_profile,
)
from aroma_spark.operators.maintenance import (  # noqa: F401
    compact_parquet_dir,
    incremental_tier_refresh,
    merge_tier_partials,
    tiered_read,
)
from aroma_spark.operators.smoothing import ewma_smooth  # noqa: F401
from aroma_spark.operators.tiers import (  # noqa: F401
    latency_histogram,
    ohlc_finalize,
    reaggregate_ohlc,
    rollup_ohlc,
)
from aroma_spark.operators.asof import asof_join, interval_join  # noqa: F401
from aroma_spark.operators.sessions import (  # noqa: F401
    session_stats,
    with_session_ids,
)
from aroma_spark.operators.anomaly import level_shift_score  # noqa: F401
from aroma_spark.operators.downsample import lttb_downsample  # noqa: F401
from aroma_spark.operators.stats import (  # noqa: F401
    signal_autocorr,
    signal_corr,
)
from aroma_spark.operators.symbolize import paa_segments, sax_words  # noqa: F401
from aroma_spark.operators.tiers import histogram_quantiles  # noqa: F401
from aroma_spark.operators.sketches import (  # noqa: F401
    cm_estimate,
    cm_merge,
    cm_sketch,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from aroma_spark.operators.smoothing import holt_smooth  # noqa: F401
