from lwm_tpu.ops.blockwise import blockwise_attn, blockwise_ffn
from lwm_tpu.ops.quant import (
    Int8Dense,
    int8_matmul_pallas,
    int8_matmul_xla,
    quantize_params_int8,
    quantize_weight,
)
from lwm_tpu.ops.reference import reference_attention
from lwm_tpu.ops.ring import (
    flash_attention,
    ring_attention,
    ring_attention_inference,
)
