from wlsqm_tpu.fitter.interp import (  # noqa: F401
    interpolate_fit, lambdify_fit, eval_fit, interpolate_many,
)
__all__ = ["interpolate_fit", "lambdify_fit"]
