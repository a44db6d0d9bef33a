from wlsqm_tpu.fitter.simple import *  # noqa: F401,F403
