from multi_modal_early_exit_tpu.models.ee.heads import (  # noqa: F401
    exit_head_apply,
    init_exit_head,
    init_lte_head,
    lte_head_apply,
)
from multi_modal_early_exit_tpu.models.ee.model import (  # noqa: F401
    EEOutputs,
    canonical_exit_order,
    ee_forward,
    init_ee_params,
    prune_ee_params,
)
from multi_modal_early_exit_tpu.models.ee.engine import AnytimeEngine  # noqa: F401
from multi_modal_early_exit_tpu.models.ee.cascade import (  # noqa: F401
    CascadeResult,
    capacities_from_distribution,
    make_cascade_forward,
)
