from lwm_tpu.native.token_buffer import NativeTokenBuffer, native_available
