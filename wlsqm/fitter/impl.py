from wlsqm_tpu.fitter.impl import *  # noqa: F401,F403
