from multi_modal_early_exit_tpu.models.layoutlmv3.config import (  # noqa: F401
    EEModelConfig,
    LayoutLMv3Config,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.modeling import (  # noqa: F401
    backbone_apply,
    classifier_apply,
    encoder_apply,
    forward_sequence_classification,
    init_params,
    make_attention_bias,
)
from multi_modal_early_exit_tpu.models.layoutlmv3.convert import (  # noqa: F401
    convert_torch_state_dict,
)
