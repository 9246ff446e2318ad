from lwm_tpu.models.llama import (
    LLAMA_STANDARD_CONFIGS,
    FlaxLLaMAForCausalLM,
    FlaxLLaMAForCausalLMModule,
    FlaxLLaMAModule,
    LLaMAConfig,
)
