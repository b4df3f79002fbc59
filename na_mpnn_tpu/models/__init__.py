from .config import ModelConfig
from .mpnn import (autoregressive_edge_masks, encode, forward, init_params,
                   sample, sample_decoding_order, score, unconditional_probs)
from .torch_import import from_torch_state_dict, load_torch_checkpoint

__all__ = [
    "ModelConfig", "init_params", "forward", "encode", "sample", "score",
    "unconditional_probs", "sample_decoding_order", "autoregressive_edge_masks",
    "from_torch_state_dict", "load_torch_checkpoint",
]
