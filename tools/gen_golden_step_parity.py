"""Capture a TF reference training run into tests/golden/step_parity.npz.

Runs the live-TF side of the step-parity harness (tests/helpers_tf_step.py)
and stores initial weights, the injected (x, t, ε) draws, per-step losses and
final weights, so tests/test_step_parity.py can verify training-step parity
without TensorFlow installed.

Usage: python tools/gen_golden_step_parity.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    from helpers_tf_step import (
        make_parity_case,
        parity_config,
        run_tf_reference_steps,
    )
    from test_step_parity import N_STEPS

    cfg = parity_config()
    batches, t_draws, eps_draws = make_parity_case(cfg, N_STEPS, seed=0)
    init_flat, losses, final_flat = run_tf_reference_steps(
        cfg, batches, t_draws, eps_draws
    )

    out = {
        "n_init": np.int32(len(init_flat)),
        "batches": np.stack(batches),
        "t_draws": np.stack(t_draws),
        "eps_draws": np.stack(eps_draws),
        "losses": np.asarray(losses, np.float64),
    }
    for i, w in enumerate(init_flat):
        out[f"w_{i:03d}"] = w
    for i, w in enumerate(final_flat):
        out[f"f_{i:03d}"] = w

    path = os.path.join(REPO, "tests", "golden", "step_parity.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path}: {len(init_flat)} weights, {N_STEPS} steps, "
          f"losses={losses}")


if __name__ == "__main__":
    main()
