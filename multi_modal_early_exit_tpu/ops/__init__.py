from multi_modal_early_exit_tpu.ops.criteria import (  # noqa: F401
    entropy,
    lte,
    max_confidence,
)
