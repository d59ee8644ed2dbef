from moshi_tpu.quant.formats import (  # noqa: F401
    QuantTensor,
    quantize,
    dequantize,
    qmatmul,
    QUANT_FORMATS,
)
from moshi_tpu.quant.policy import choose_format, quantize_tree  # noqa: F401
