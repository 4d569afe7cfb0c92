"""Native host engine vs the Python/numpy implementations."""
import numpy as np
import pytest

from mpc_verde_tpu import native
from mpc_verde_tpu.refgen import (lateral_error_references, path_heading,
                                  stage_param_tensor, synthetic_lane_change)


@pytest.fixture(scope="module", autouse=True)
def _ensure_built():
    if not native.available():
        try:
            from mpc_verde_tpu.native.build import build
            build(verbose=False)
        except Exception:
            pytest.skip("native toolchain unavailable")
    assert native.available()


def test_csv_loader_matches_pandas(tmp_path):
    import pandas as pd

    path = synthetic_lane_change(n=50)
    f = tmp_path / "p.csv"
    pd.DataFrame({"x": path["x"], "y": path["y"], "uref": path["uref"]}).to_csv(
        f, index=False)
    got = native.load_path_csv(str(f))
    assert np.allclose(got["x"], path["x"])
    assert np.allclose(got["y"], path["y"])
    assert np.allclose(got["uref"], path["uref"])


def test_lateral_refs_match_python():
    p = synthetic_lane_change(n=300)
    ours = native.lateral_error_refs(p["x"], p["y"], 0.05, -23.55, 61.99)
    ref = lateral_error_references(p, 0.05)
    assert np.allclose(ours, ref, atol=1e-12)


def test_stage_window_matches_python(rng):
    refs = rng.normal(size=(40, 4))
    assert np.allclose(native.stage_window(refs, 7, 40),
                       stage_param_tensor(refs, 7, 40), atol=0)


def test_native_lqr_matches_jax_solver():
    import jax
    import jax.numpy as jnp

    import mpc_verde_tpu as mv

    dt = 0.1
    A = np.array([[1.0, dt], [0.0, 1.0]])
    B = np.array([[0.5 * dt * dt], [dt]])
    Q = np.diag([1.0, 0.1]); R = np.array([[0.01]])
    N = 25
    x0 = np.array([1.0, -0.5])
    us_gold, cost_gold = native.lqr_riccati(A, B, Q, R, Q, N, x0)

    ocp = mv.OCP(
        dynamics=lambda x, u, p: jnp.array(A) @ x + jnp.array(B) @ u,
        stage_cost=lambda x, u, p: x @ jnp.array(Q) @ x + u @ jnp.array(R) @ u,
        terminal_cost=lambda x, p: x @ jnp.array(Q) @ x,
        N=N, nx=2, nu=1)
    res = jax.jit(mv.make_ilqr_solver(ocp, mv.ILQROptions(tol_grad=1e-12)))(
        jnp.array(x0))
    assert np.abs(np.array(res.us) - us_gold).max() < 1e-8
    assert abs(float(res.cost) - cost_gold) < 1e-8 * (1 + abs(cost_gold))
