from multi_modal_early_exit_tpu.utils.logging import logger_message  # noqa: F401
from multi_modal_early_exit_tpu.utils.meters import AverageMeter  # noqa: F401
from multi_modal_early_exit_tpu.utils.seeding import seed_everything  # noqa: F401
from multi_modal_early_exit_tpu.utils.artifacts import (  # noqa: F401
    config_to_checkpoint,
    load_json,
    load_npz,
    save_json,
    save_npz,
)
