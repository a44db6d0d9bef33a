from wlsqm_tpu.fitter.defs import *  # noqa: F401,F403
