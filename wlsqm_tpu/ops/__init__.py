"""TPU compute ops: batched equilibration, factorization, and kernels."""
