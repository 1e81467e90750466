from multi_modal_early_exit_tpu.config.exit_config import (  # noqa: F401
    EarlyExitHead,
    EarlyExitInference,
    EarlyExitStrategy,
    ExitConfig,
    parse_exits,
)
from multi_modal_early_exit_tpu.config.experiment import (  # noqa: F401
    ExperimentConfig,
    NAMED_CONFIGS,
    parse_cli,
)
