"""mpctools-style ``nmpc`` front end over the box-iLQR solver.

API parity targets (all exercised by the reference scripts — SURVEY.md §2.2):
  * ``getCasadiFunc(pyfunc, sizes, names, funcname=, rk4=, Delta=, M=)``
    (``mpctools/multiple_shooting_mpctools.py:48``, ``test2.py:118``)
  * ``nmpc(f, l, N, x0, lb, ub, p=, funcargs=, inferargs=, uprev=, isQP=,
    verbosity=, Pf=)`` returning a solver object
    (``Trajectory Tracking/Trajectory_tracking.py:72``,
    ``Inverted_pendulum/...mpctools.py:64``)
  * solver object: ``.solve()``, ``.fixvar(name, t, value)``, ``.saveguess()``,
    ``.var["x", k, :]`` / ``.var["u", 0, :]`` indexing, ``.par["p", k] = v``,
    ``.stats["status"]`` (``Trajectory_tracking.py:100-126``)
  * ``callSolver(solver)`` -> dict with "status"/"x"/"u"
    (``Inverted_pendulum/...mpctools.py:74-77``)
  * ``util.c2d``, ``mtimes``, ``DiscreteSimulator``

Differences by design: the backend is a compiled JAX box-iLQR solve, so there
is no per-step NLP rebuild — constructing an ``nmpc`` object compiles once and
every ``.solve()`` is a device call.  Bounds dicts accept the same shapes the
scripts pass ((nu,) arrays or (Nt, nu) move-blocking stacks).
"""
from __future__ import annotations

import inspect
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp.rate import to_rate_form
from ..ocp.spec import OCP, box_bounds
from ..ops.integrators import DiscreteSimulator as _DiscreteSimulator
from ..ops.integrators import c2d as _c2d
from ..ops.integrators import rk4_step
from ..solver.ilqr import ILQROptions, make_ilqr_solver

__all__ = [
    "getCasadiFunc", "nmpc", "callSolver", "util", "DiscreteSimulator",
    "mtimes", "NMPCSolver",
]

DiscreteSimulator = _DiscreteSimulator


def mtimes(*mats):
    """Chained matrix product (mpctools.mtimes)."""
    out = mats[0]
    for m in mats[1:]:
        out = out @ m
    return out


class util:
    """Namespace mirror of ``mpctools.util``."""

    c2d = staticmethod(_c2d)


class SymFunc:
    """A named-argument function wrapper — the ``getCasadiFunc`` product.

    Carries the declared argument names so ``nmpc`` can route (x, u, p, Du)
    the way mpctools' ``inferargs``/``funcargs`` machinery does.
    """

    def __init__(self, fn: Callable, argnames: Sequence[str], name: str = "f"):
        self.fn = fn
        self.argnames = [str(a) for a in argnames]
        self.name = name

    def __call__(self, *args):
        return self.fn(*args)


def getCasadiFunc(pyfunc, sizes=None, names=None, funcname: str = "f",
                  rk4: bool = False, Delta: float = None, M: int = 1):
    """Wrap a plain-python/numpy ode or cost into a traced function.

    With ``rk4=True`` the wrapped function becomes the RK4 discrete step with
    sampling time ``Delta`` and ``M`` substeps, matching
    ``mpc.getCasadiFunc(ode, ..., rk4=True, Delta=Delta, M=1)``.
    """
    if names is None:
        names = list(inspect.signature(pyfunc).parameters)
    names = [str(n) for n in names]

    if not rk4:
        return SymFunc(pyfunc, names, funcname)

    if Delta is None:
        raise ValueError("rk4=True requires Delta")

    has_p = len(names) >= 3

    def rhs(x, u, p):
        return pyfunc(x, u, p) if has_p else pyfunc(x, u)

    step = rk4_step(rhs, Delta, M=M)

    if has_p:
        return SymFunc(lambda x, u, p: step(x, u, p), names, funcname)
    return SymFunc(lambda x, u: step(x, u, None), names, funcname)


def _argnames(func, funcargs_entry, inferargs, default=("x", "u", "p", "Du")):
    if funcargs_entry is not None:
        return [str(a) for a in funcargs_entry]
    if isinstance(func, SymFunc):
        return func.argnames
    if inferargs:
        return list(inspect.signature(func).parameters)
    # inferargs=False and no declared names: mpctools' positional convention
    n = len(inspect.signature(func).parameters)
    return list(default[:n])


def _stage_bound(b, Nt, nu, default):
    if b is None:
        return np.full((Nt, nu), default, dtype=float)
    b = np.asarray(b, dtype=float)
    if b.ndim == 0:
        b = b.reshape(1)
    if b.ndim == 1:
        if b.shape[0] == nu:
            return np.broadcast_to(b, (Nt, nu)).copy()
        if b.shape[0] == Nt:
            return np.broadcast_to(b[:, None], (Nt, nu)).copy()
    if b.ndim == 2:
        # reference passes (Nt, 1) vstacks for Du move blocking
        return np.broadcast_to(b, (Nt, nu)).copy()
    raise ValueError(f"bad bound shape {b.shape}")


class _VarView:
    """Read access mimicking mpctools' struct indexing.

    ``v["x", k]`` / ``v["x", k, :]`` -> (nx,) array; ``v["x", :, :]`` /
    ``v["x"]`` -> list of per-stage arrays (the reference wraps these in
    ``np.array`` — ``Trajectory_tracking.py:131-137``).
    """

    def __init__(self, solver):
        self._s = solver

    def _tab(self, name):
        if name == "x":
            return self._s._last_xs
        if name == "u":
            return self._s._last_us
        raise KeyError(name)

    def __getitem__(self, key):
        if isinstance(key, str):
            name, rest = key, (slice(None),)
        else:
            name, rest = key[0], key[1:]
        tab = self._tab(name)
        if tab is None:
            raise RuntimeError("no solution yet; call solve() first")
        k = rest[0] if rest else slice(None)
        out = tab[k]
        if len(rest) > 1:
            out = out[..., rest[1]] if not isinstance(rest[1], slice) else out
        if isinstance(k, slice):
            return [np.asarray(row) for row in out]
        return np.asarray(out)


class _ParView:
    """Write access for per-stage parameters: ``solver.par["p", k] = vec``."""

    def __init__(self, solver):
        self._s = solver

    def __setitem__(self, key, value):
        name, k = key[0], key[1]
        if name != "p":
            raise KeyError(name)
        self._s._par[k] = np.asarray(value, dtype=float).ravel()

    def __getitem__(self, key):
        name, k = key[0], key[1]
        if name != "p":
            raise KeyError(name)
        return self._s._par[k]


class NMPCSolver:
    """The object ``nmpc`` returns — mpctools solver-object semantics."""

    def __init__(self, ocp: OCP, options: ILQROptions, x0, par, uprev,
                 rate_form: bool, nx_orig: int, nu: int, npar: int):
        self._ocp = ocp
        self._rate_form = rate_form
        self._nx = nx_orig
        self._nu = nu
        self._npar = npar
        self._x0 = np.asarray(x0, dtype=float).copy()
        self._uprev = None if uprev is None else np.asarray(uprev, dtype=float).copy()
        self._par = np.zeros((ocp.N, max(npar, 1)), dtype=float)
        if par is not None:
            p = np.asarray(par, dtype=float)
            if p.ndim == 1:
                p = np.broadcast_to(p, (ocp.N, p.shape[0]))
            self._par[:, : p.shape[1]] = p
        self._guess = np.zeros((ocp.N, nu), dtype=float)
        self._last_xs = None  # (N+1, nx_orig)
        self._last_us = None  # (N, nu)
        self._last_res = None
        self.stats = {"status": "NotSolved"}
        self.var = _VarView(self)
        self.par = _ParView(self)
        self._solve_fn = jax.jit(make_ilqr_solver(ocp, options))

    # -- mpctools surface --------------------------------------------------

    @property
    def varsym(self):
        """Abstract decision-variable descriptors, keyed like mpctools'
        CasADi symbol struct (``Trajectory_tracking_lateral_error.py:76-77``).
        JAX has no persistent symbols — tracing replaces them — so the
        equivalent handle is per-variable ``jax.ShapeDtypeStruct`` lists."""
        dt = jnp.result_type(float)
        N = self._ocp.N
        out = {
            "x": [jax.ShapeDtypeStruct((self._nx,), dt) for _ in range(N + 1)],
            "u": [jax.ShapeDtypeStruct((self._nu,), dt) for _ in range(N)],
        }
        if self._rate_form:
            out["Du"] = [jax.ShapeDtypeStruct((self._nu,), dt) for _ in range(N)]
        return out

    def fixvar(self, name: str, t: int, value) -> None:
        """``fixvar("x", 0, x0)`` pins the initial state (the only use in the
        reference scripts).

        This is the receding-horizon advance signal, so it also rolls the
        rate-form ``uprev`` forward to the last applied control — keeping
        ``solve()`` itself idempotent (two solves from the same pinned state
        return the same trajectory).
        """
        if name != "x" or t != 0:
            raise NotImplementedError("only fixvar('x', 0, value) is supported")
        self._x0 = np.asarray(value, dtype=float).ravel()[: self._nx].copy()
        if self._rate_form and self._last_us is not None:
            self._uprev = np.atleast_1d(self._last_us[0]).astype(float).copy()

    def saveguess(self) -> None:
        """Keep the last solution as the next warm start (mpctools shifts via
        the subsequent ``fixvar``; here the guess is used as-is)."""
        if self._last_res is not None:
            self._guess = np.asarray(self._last_res_us, dtype=float).copy()

    def solve(self):
        dt_f = jnp.result_type(float)
        if self._rate_form:
            uprev = self._uprev if self._uprev is not None else np.zeros(self._nu)
            z0 = np.concatenate([self._x0, uprev])
        else:
            z0 = self._x0
        params = np.concatenate([self._par, self._par[-1:]], axis=0)  # stage N row
        res = self._solve_fn(jnp.asarray(z0, dtype=dt_f),
                             jnp.asarray(params, dtype=dt_f),
                             jnp.asarray(self._guess, dtype=dt_f))
        xs = np.asarray(res.xs)
        us = np.asarray(res.us)
        if self._rate_form:
            u_prev_traj = xs[:-1, self._nx:]
            us_abs = u_prev_traj + us
            xs_out = xs[:, : self._nx]
        else:
            us_abs = us
            xs_out = xs
        self._last_xs = xs_out
        self._last_us = us_abs
        self._last_res = res
        self._last_res_us = us
        self.stats = {
            "status": "Solve_Succeeded" if bool(res.converged)
            else "Maximum_Iterations_Exceeded",
            "obj": float(res.cost),
            "iterations": int(res.iterations),
        }
        return self.stats


def nmpc(f=None, l=None, N=None, x0=None, lb=None, ub=None, p=None,
         funcargs=None, inferargs=False, uprev=None, isQP=False,
         verbosity=0, Pf=None, **kwargs):
    """Build an MPC solver object — drop-in for ``mpctools.nmpc``.

    Accepts the argument shapes the reference scripts use; returns an
    :class:`NMPCSolver`.
    """
    if N is None or f is None or l is None:
        raise ValueError("f, l, N are required")
    Nx, Nu, Nt = int(N["x"]), int(N["u"]), int(N["t"])
    Np = int(N.get("p", 0))

    lb = dict(lb or {})
    ub = dict(ub or {})
    has_du = "Du" in lb or "Du" in ub
    f_args = _argnames(f, (funcargs or {}).get(getattr(f, "name", "f")), inferargs)
    l_args = _argnames(l, (funcargs or {}).get("l"), inferargs)
    l_args_l = [a.lower() for a in l_args]
    has_du_cost = "du" in l_args_l
    rate_form = has_du or has_du_cost or uprev is not None

    f_has_p = len(f_args) >= 3 and f_args[2].lower() == "p"

    def dynamics(x, u, pp):
        return f(x, u, pp[:Np]) if f_has_p else f(x, u)

    def call_l(x, u, pp, du):
        vals = {"x": x, "u": u, "p": pp[:Np], "du": du}
        return l(*[vals[a.lower()] for a in l_args])

    u_lb = _stage_bound(lb.get("u"), Nt, Nu, -np.inf)
    u_ub = _stage_bound(ub.get("u"), Nt, Nu, np.inf)
    x_lb = lb.get("x")
    x_ub = ub.get("x")
    if x_lb is not None:
        x_lb = np.where(np.isfinite(np.asarray(x_lb, float)), np.asarray(x_lb, float), -np.inf)
        if not np.any(np.isfinite(x_lb)):
            x_lb = None
    if x_ub is not None:
        x_ub = np.where(np.isfinite(np.asarray(x_ub, float)), np.asarray(x_ub, float), np.inf)
        if not np.any(np.isfinite(x_ub)):
            x_ub = None

    terminal = None
    if Pf is not None:
        Pf_arr = jnp.asarray(np.asarray(Pf, dtype=float))
        terminal = lambda x, pp: x @ Pf_arr @ x

    if rate_form:
        du_lb = _stage_bound(lb.get("Du"), Nt, Nu, -np.inf)
        du_ub = _stage_bound(ub.get("Du"), Nt, Nu, np.inf)
        ocp = to_rate_form(
            dynamics, call_l, N=Nt, nx=Nx, nu=Nu, npar=max(Np, 0),
            terminal_cost=terminal,
            u_lb=u_lb, u_ub=u_ub, du_lb=du_lb, du_ub=du_ub,
            x_lb=x_lb, x_ub=x_ub)
    else:
        ocp = OCP(
            dynamics=dynamics,
            stage_cost=lambda x, u, pp: call_l(x, u, pp, jnp.zeros_like(u)),
            terminal_cost=terminal,
            N=Nt, nx=Nx, nu=Nu, npar=max(Np, 0),
            control_bounds=box_bounds(jnp.asarray(u_lb), jnp.asarray(u_ub)),
            x_lb=None if x_lb is None else jnp.asarray(x_lb),
            x_ub=None if x_ub is None else jnp.asarray(x_ub),
        )

    has_x_bounds = (x_lb is not None and np.any(np.isfinite(x_lb))) or \
                   (x_ub is not None and np.any(np.isfinite(x_ub)))
    options = ILQROptions(
        max_iters=30 if isQP else 80,
        al_iters=3 if has_x_bounds else 0,
    )
    return NMPCSolver(ocp, options, x0 if x0 is not None else np.zeros(Nx),
                      p, uprev, rate_form, Nx, Nu, max(Np, 0))


def callSolver(solver: NMPCSolver):
    """``mpc.callSolver(solver)`` -> {"status", "x", "u", "obj"}."""
    stats = solver.solve()
    return {
        "status": stats["status"],
        "x": np.asarray(solver._last_xs),
        "u": np.asarray(solver._last_us),
        "obj": stats["obj"],
    }
