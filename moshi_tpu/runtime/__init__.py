from moshi_tpu.runtime.synth import synth_lm_params, synth_quant_tensor  # noqa: F401
