from .config import (  # noqa: F401
    PRESETS,
    QuantizeConfig,
    choices,
    get_preset,
    make_config,
)
from .quantizer import (
    register_quant_backend,
    unregister_quant_backend,  # noqa: F401
    DISABLED,
    QuantizerConfig,
    QuantizerState,
    amax_shape,
    collect,
    init_state,
    quantize,
)
