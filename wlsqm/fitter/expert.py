from wlsqm_tpu.fitter.expert import ExpertSolver, number_of_dofs  # noqa: F401
__all__ = ["ExpertSolver", "number_of_dofs"]
