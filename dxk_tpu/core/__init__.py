from dxk_tpu.core import maths  # noqa: F401
