from wlsqm_tpu.utils.ptrwrap import PointerWrapper  # noqa: F401
