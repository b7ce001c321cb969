from tomatis_tpu.io.audio import AudioFile, info, read, write  # noqa: F401
