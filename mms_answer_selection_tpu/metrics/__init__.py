from .ir_metrics import (  # noqa: F401
    mean_reciprocal_rank,
    mean_average_precision,
    auc,
    rank_accuracy,
    mean_reciprocal_rank_jax,
    mean_reciprocal_rank_jax_sorted,
    mean_average_precision_jax,
    mean_average_precision_jax_sorted,
    auc_jax,
    auc_jax_sorted,
    rank_accuracy_jax,
)
from .trec_eval import (  # noqa: F401
    format_trec_table,
    trec_eval,
    write_trec_files,
)
