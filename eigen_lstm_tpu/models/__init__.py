from .lstm import (
    LSTMParams,
    LayerParams,
    init_params,
    init_state,
    forward,
    forward_step,
    loss_fn,
    logits_from_h,
    softmax_xent_bits,
)
