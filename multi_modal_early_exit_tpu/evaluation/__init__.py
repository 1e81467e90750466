from multi_modal_early_exit_tpu.evaluation.metrics import (  # noqa: F401
    METRICS,
    accuracy,
    aurc_logits,
    brier_loss,
    calc_metrics,
    ece_logits,
    f1_macro,
    f1_micro,
    nll,
)
from multi_modal_early_exit_tpu.evaluation.policy import Policy  # noqa: F401
from multi_modal_early_exit_tpu.evaluation.calibration import (  # noqa: F401
    TemperatureScaler,
    get_platt_scaler,
)
