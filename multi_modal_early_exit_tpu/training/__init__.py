from multi_modal_early_exit_tpu.training.losses import (  # noqa: F401
    combine_losses,
    ee_loss_fn,
)
from multi_modal_early_exit_tpu.training.subgraphs import (  # noqa: F401
    apply_entropyreg,
    exit_loss_weights,
    exit_named_parameters,
    subgraph_param_counts,
)
