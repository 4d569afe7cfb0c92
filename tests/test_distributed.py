"""Two-process distributed solve: the >=2-hosts scaling point, faked locally.

SURVEY.md §6 asks for 1-chip / 1-host / >=2-hosts measurements; real pods
aren't available in CI, so this test runs TWO separate processes (4 virtual
CPU devices each) joined by ``jax.distributed`` over a local TCP coordinator
— exercising the genuine multi-process code path (global mesh spanning
process boundaries, host-local shard feeding, cross-process psum stats,
allgather of sharded results) — and checks the answer against a
single-process solve of the same batch.
"""
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.timeout(600)
def test_two_process_distributed_solve_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out = os.path.join(tempfile.mkdtemp(), "dist_result.npz")
    worker = os.path.join(_ROOT, "tests", "_dist_worker.py")

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, "2", str(pid), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-3000:]

    got = np.load(out)
    assert got["n_total"] == 16
    assert got["n_converged"] == 16

    # single-process reference on the same 16 problems
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv
    from mpc_verde_tpu.models import unicycle
    from mpc_verde_tpu.ops import rk4_step

    T, N = 0.2, 8
    F = rk4_step(unicycle.f, T)
    Q = jnp.diag(jnp.array([1.0, 5.0, 0.1], jnp.float32))
    R = jnp.diag(jnp.array([0.5, 0.05], jnp.float32))

    def l(x, u, p):
        e = x - p[:3]
        return e @ Q @ e + u @ R @ u

    ocp = mv.OCP(dynamics=lambda x, u, p: F(x, u, p), stage_cost=l,
                 N=N, nx=3, nu=2, npar=3,
                 control_bounds=mv.box_bounds(
                     jnp.array([-1.0, -np.pi / 4]), jnp.array([1.0, np.pi / 4])))
    solve = mv.make_ilqr_solver(ocp, mv.ILQROptions(max_iters=60))
    rng = np.random.default_rng(11)
    x0s = jnp.array(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
    ps = jnp.broadcast_to(jnp.array([5.0, 5.0, 0.0], jnp.float32),
                          (16, N + 1, 3))
    us0 = jnp.zeros((16, N, 2), jnp.float32)
    ref = jax.jit(jax.vmap(solve))(x0s, ps, us0)

    # distributed run used f32 on CPU; conftest's x64 makes the local ref
    # f64 — compare at f32-appropriate tolerance on the converged optima
    assert np.abs(got["cost"] - np.asarray(ref.cost)).max() < 1e-2
    assert np.abs(got["us"] - np.asarray(ref.us)).max() < 2e-2
