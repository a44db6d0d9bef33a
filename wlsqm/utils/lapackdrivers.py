from wlsqm_tpu.utils.lapackdrivers import *  # noqa: F401,F403
