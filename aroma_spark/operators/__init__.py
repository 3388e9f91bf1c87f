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
