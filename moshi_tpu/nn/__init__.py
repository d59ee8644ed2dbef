from moshi_tpu.nn.layers import (  # noqa: F401
    linear, layer_norm, rms_norm, apply_norm, embedding_lookup,
    scaled_embedding, init_linear, init_layer_norm, init_rms_norm,
    init_embedding,
)
from moshi_tpu.nn.rope import apply_rope  # noqa: F401
from moshi_tpu.nn.gating import gating_mlp, init_gating  # noqa: F401
from moshi_tpu.nn.sampling import sample_token  # noqa: F401
