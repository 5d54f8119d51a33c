"""Parameter covariance / standard errors from the Gauss-Newton Fisher matrix.

The output-error lineage reports parameter standard errors alongside the
estimates (Cramer-Rao bounds from the GN approximation of the information
matrix — SURVEY.md §3.4).  With the residual convention used here (each
residual pre-multiplied by its sqrt information 1/sigma), the GN normal
matrix IS the Fisher information of (V, p); the parameter covariance is the
inverse of its p-Schur complement:

    Cov(p) = ( C - B^T A^{-1} B )^{-1}

computed with the same block-tridiagonal machinery as the Newton step — one
multi-RHS chain solve, no global matrix.
"""

from __future__ import annotations

import jax.numpy as jnp

from collocfem_tpu.ops.assemble import assemble_gn
from collocfem_tpu.ops.einsum_hp import einsum_hp
from collocfem_tpu.ops.smallblocks import spd_solve
from collocfem_tpu.solve.blocktri import SOLVERS


def parameter_covariance(problem, z, data, method: str = "cr"):
    """(nq, nq) covariance of the parameter estimate at solution ``z``.

    Assumes measurement weights are 1/sigma (so residuals are standardized)
    and the solution is a (local) optimum.  For joint MAP estimation the
    defect weights contribute as the process-noise prior, giving the
    posterior covariance of p.
    """
    sys = assemble_gn(problem, z, data)
    nq = sys.C.shape[0]
    if nq == 0:
        return jnp.zeros((0, 0), sys.D.dtype)
    solver = SOLVERS[method]
    a_b = solver(sys.D, sys.E, sys.B)               # A^{-1} B
    schur = sys.C - einsum_hp("kbq,kbr->qr", sys.B, a_b)
    # SPD inverse via the unrolled Cholesky (f64-capable on TPU).
    eye = jnp.eye(schur.shape[0], dtype=schur.dtype)
    return spd_solve(schur, eye)


def parameter_std(problem, z, data, method: str = "cr"):
    """(nq,) standard errors: sqrt(diag(Cov(p)))."""
    cov = parameter_covariance(problem, z, data, method)
    return jnp.sqrt(jnp.diag(cov))
