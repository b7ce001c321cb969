"""Native (C++) components and their build/loading machinery."""
from tomatis_tpu.native.build import load_library  # noqa: F401
