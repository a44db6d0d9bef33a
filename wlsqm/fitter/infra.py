from wlsqm_tpu.fitter.infra import *  # noqa: F401,F403
