from tomatis_tpu.ops import dsp, gate, stft  # noqa: F401
