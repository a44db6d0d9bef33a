from wlsqm_tpu.fitter.polyeval import *  # noqa: F401,F403
