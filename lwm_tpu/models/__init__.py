from lwm_tpu.models.llama import (
    LLAMA_STANDARD_CONFIGS,
    FlaxLLaMAForCausalLM,
    FlaxLLaMAForCausalLMModule,
    FlaxLLaMAModule,
    LLaMAConfig,
)
from lwm_tpu.models.vision_llama import (
    FlaxVideoLLaMAForCausalLM,
    FlaxVideoLLaMAForCausalLMModule,
    FlaxVideoLLaMAModule,
    VideoLLaMAConfig,
)
