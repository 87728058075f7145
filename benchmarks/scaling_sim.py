"""Simulated strong scaling of the distributed NLML (1 -> 8 devices).

HONEST STAND-IN: only one real TPU chip is reachable from this
environment, so the mesh here is `xla_force_host_platform_device_count`
CPU devices sharing the same host cores. What this measures is NOT
speedup (the cores are oversubscribed) but (a) that the shard_map
program partitions correctly at every mesh size, and (b) the
collective/compute structure the real slice would run — the per-device
row-panel shrinks as 1/P while the all-gather panel traffic grows,
exactly the tradeoff BASELINE's scaling-efficiency row asks about.
Wall times are recorded for completeness with that caveat attached.

Usage: python benchmarks/scaling_sim.py   (forces the CPU backend)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct-script runs
RESULTS = os.path.join(HERE, "results.json")


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    if "xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.parallel import (
        make_dist_nlml_and_grad,
        shard_training_data,
    )

    n, d, nb = 2048, 3, 64
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, (n, d))
    y = np.sin(X @ np.array([3.0, 1.0, 2.0]))
    model = default_model(input_dim=d, dtype=jnp.float64)
    flat = model.pack()

    rows = []
    ref_val = None
    for P_sz in (1, 2, 4, 8):
        mesh = Mesh(np.array(jax.devices()[:P_sz]), ("dp",))
        Xs, ys, ntrue, _ = shard_training_data(mesh, X, y, nb=nb)
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                    mesh, n=ntrue, nb=nb)
        v, g = f(flat, Xs, ys)          # compile + first call
        v = float(v)
        if ref_val is None:
            ref_val = v
        assert abs(v - ref_val) < 1e-6 * abs(ref_val), \
            f"P={P_sz}: value drifted {v} vs {ref_val}"
        times = []
        for r in range(3):
            fl = flat * (1.0 + 1e-6 * (r + 1))
            t0 = time.perf_counter()
            vv, gg = f(fl, Xs, ys)
            jax.block_until_ready((vv, gg))
            times.append(time.perf_counter() - t0)
        rows.append({"devices": P_sz,
                     "nlml_grad_ms_median": round(
                         1e3 * float(np.median(times)), 1),
                     "nlml": v})
        print(rows[-1], flush=True)

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    data["strong_scaling_sim_cpu"] = {
        "note": ("simulated mesh: 1-8 XLA host devices on SHARED CPU "
                 "cores — validates partitioning/collectives at every "
                 "mesh size, not real speedup (see module docstring); "
                 "N=2048 f64, nb=64, exact QW gradient"),
        "rows": rows,
    }
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote strong_scaling_sim_cpu -> {RESULTS}")


if __name__ == "__main__":
    main()
