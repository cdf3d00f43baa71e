"""Generate the committed pinned-scene golden file for tests/test_goldens.py.

Run deliberately (and justify the diff in review) when the rendering
numerics intentionally change:

    python tools/make_goldens.py

Writes tests/goldens/scene32.npz from the dense f32 oracle — the most
accurate path (HIGHEST-precision matmuls, no binning approximations) —
after the analytic closed-form tests have pinned the oracle itself to
the published gsplat equations.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from horizongs_tpu.ops.reference import render_dense_3dgs  # noqa: E402
from tests.test_goldens import GOLDEN_PATH, _grads_3dgs, _pinned_scene  # noqa: E402


def main():
    cam, g, bg = _pinned_scene()
    render, alphas, _ = render_dense_3dgs(
        g["means"], g["quats"], g["scales"], g["opacities"], g["colors"],
        cam.viewmat, cam.K, 32, 32, bg)
    grads = _grads_3dgs(render_dense_3dgs, cam, g, bg)
    out = {"render": np.asarray(render), "alphas": np.asarray(alphas)}
    for name, val in zip(["means", "scales", "opacities", "colors"], grads):
        out[f"grad_{name}"] = np.asarray(val)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez_compressed(GOLDEN_PATH, **out)
    print(f"wrote {GOLDEN_PATH}: "
          + ", ".join(f"{k} {v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    main()
