"""Symbolic model front-end: declare dynamics as sympy expressions.

Capability parity target: the reference lineage defines models as symbolic
(sympy) classes run through a sym2num-style generator that emits vectorized
numpy callables for f, h and their derivatives (SURVEY.md §2a "Model
codegen").  A user migrating from the reference writes the same kind of
declarative, equation-level model here — but the lowering target is JAX:

  * expressions are parsed with sympy and **lambdified against jnp**, so the
    resulting callables are pure traceable JAX functions — they jit, vmap,
    and differentiate like any hand-written ``Model``;
  * no derivative codegen exists at all: the collocation pipeline takes
    Jacobians/Hessians of the lambdified ``f``/``h`` with ``jax.jacfwd``
    exactly as it does for hand-written models, so the symbolic layer is a
    *front-end convenience*, not a separate compute path;
  * sparsity tables (a large part of sym2num's output) are unnecessary —
    the assembly layer (ops/assemble.py) is block-dense per element and XLA
    fuses/dead-code-eliminates structural zeros.

Example::

    VdP = symbolic_model(
        name="VanDerPolSym",
        states="x0 x1",
        inputs="u0",
        params="mu b",
        f=["x1", "mu*(1 - x0**2)*x1 - x0 + b*u0"],
        h=["x0"],
    )
    model = VdP()          # a collocfem_tpu.model.Model subclass instance

Expressions may reference the state/input/param names and ``t`` (time).
Optional groups mirror the ``Model`` protocol: ``h`` (outputs), ``g``
(inequality path constraints, <= 0), ``g_eq`` (equality path constraints),
``running_cost_residual`` and ``terminal_cost_residual`` (least-squares
cost forms for the OCP solver).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from collocfem_tpu.model import Model


def _names(spec) -> list[str]:
    """'a b c' | ['a','b','c'] -> list of identifier strings."""
    if spec is None:
        return []
    if isinstance(spec, str):
        out = spec.replace(",", " ").split()
    else:
        out = [str(s) for s in spec]
    for n in out:
        if not n.isidentifier():
            raise ValueError(f"symbol name {n!r} is not a valid identifier")
    if len(set(out)) != len(out):
        raise ValueError(f"duplicate symbol names in {out}")
    return out


def _compile_group(exprs, syms, local_dict):
    """Parse + lambdify a list of scalar expressions against jnp.

    Returns ``fn(*scalar_args) -> (n,) jnp array`` or None if the group is
    empty.  Each component is lambdified separately and stacked so constant
    components (lambdify returns a python float) broadcast correctly under
    tracing.
    """
    import sympy

    if exprs is None:
        return None, 0
    if isinstance(exprs, str):
        exprs = [exprs]
    parsed = [
        sympy.sympify(e, locals=local_dict) if isinstance(e, str) else e
        for e in exprs
    ]
    free = set().union(*(e.free_symbols for e in parsed)) if parsed else set()
    known = set(local_dict.values())
    unknown = [str(s) for s in free - known]
    if unknown:
        raise ValueError(
            f"expression uses undeclared symbols {sorted(unknown)}; declare "
            "them in states/inputs/params (time is 't')"
        )
    fns = [sympy.lambdify(syms, e, modules=jnp) for e in parsed]

    def fn(*args):
        vals = [f(*args) for f in fns]
        return jnp.stack([jnp.asarray(v, dtype=jnp.result_type(float))
                          if not hasattr(v, "dtype") else v for v in vals])

    return fn, len(parsed)


def symbolic_model(
    name: str,
    states,
    f: Sequence,
    inputs=None,
    params=None,
    h=None,
    g=None,
    g_eq=None,
    running_cost_residual=None,
    terminal_cost_residual=None,
):
    """Build a ``Model`` subclass from sympy expressions.

    Parameters are expression lists (strings or sympy expressions), one
    scalar per component; see the module docstring for the naming contract.
    Returns the new class (instantiate with no arguments).
    """
    import sympy

    st = _names(states)
    inp = _names(inputs)
    par = _names(params)
    clash = (set(st) | set(inp) | set(par)) & {"t"}
    if clash or len(st + inp + par) != len(set(st + inp + par)):
        raise ValueError("state/input/param names must be distinct and not 't'")

    syms = {n: sympy.Symbol(n, real=True) for n in st + inp + par + ["t"]}
    args = tuple(syms[n] for n in st + inp + par + ["t"])

    f_fn, nf = _compile_group(f, args, syms)
    if nf != len(st):
        raise ValueError(f"f has {nf} components but there are {len(st)} states")
    h_fn, _ = _compile_group(h, args, syms)
    g_fn, ng = _compile_group(g, args, syms)
    ge_fn, ne = _compile_group(g_eq, args, syms)
    rc_fn, _ = _compile_group(running_cost_residual, args, syms)
    # Terminal cost sees only (states, params) — the base
    # Model.terminal_cost_residual(x, p) has no input or time argument, so
    # expressions using inputs or 't' are rejected rather than silently
    # bound to zeros.
    tc_fn, _ = _compile_group(terminal_cost_residual, args, syms)
    if terminal_cost_residual is not None:
        texprs = terminal_cost_residual
        if isinstance(texprs, str):
            texprs = [texprs]
        tfree = set()
        for e in texprs:
            pe = sympy.sympify(e, locals=syms) if isinstance(e, str) else e
            tfree |= {str(s) for s in pe.free_symbols}
        bad = tfree & (set(inp) | {"t"})
        if bad:
            raise ValueError(
                "terminal_cost_residual may not reference inputs or 't' "
                f"(the base Model.terminal_cost_residual(x, p) has no time "
                f"argument): {sorted(bad)}"
            )

    nx, nu, nq = len(st), len(inp), len(par)

    def _scalars(x, u, p, t):
        return (*(x[i] for i in range(nx)),
                *(u[i] for i in range(nu)),
                *(p[i] for i in range(nq)), t)

    ns = {
        "__doc__": f"Symbolically-defined model {name!r} "
                   f"(states={st}, inputs={inp}, params={par}).",
        "nx": nx, "nu": nu, "nq": nq, "ng": ng, "ne": ne,
        "state_names": tuple(st), "input_names": tuple(inp),
        "param_names": tuple(par),
    }

    ns["f"] = lambda self, x, u, p, t: f_fn(*_scalars(x, u, p, t))
    if h_fn is not None:
        ns["h"] = lambda self, x, u, p, t: h_fn(*_scalars(x, u, p, t))
    if g_fn is not None:
        ns["g"] = lambda self, x, u, p, t: g_fn(*_scalars(x, u, p, t))
    if ge_fn is not None:
        ns["g_eq"] = lambda self, x, u, p, t: ge_fn(*_scalars(x, u, p, t))
    if rc_fn is not None:
        ns["running_cost_residual"] = (
            lambda self, x, u, p, t: rc_fn(*_scalars(x, u, p, t))
        )
    if tc_fn is not None:
        ns["terminal_cost_residual"] = (
            lambda self, x, p: tc_fn(
                *_scalars(x, jnp.zeros((nu,), dtype=x.dtype), p,
                          jnp.zeros((), dtype=x.dtype))
            )
        )

    return type(name, (Model,), ns)
