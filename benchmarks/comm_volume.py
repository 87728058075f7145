"""Collective-volume audit of the distributed NLML (VERDICT r2 weak #5).

Compiles make_dist_nlml_and_grad on a simulated 8-device mesh and
walks the optimized HLO for communication ops (all-gather, all-reduce,
collective-permute, reduce-scatter), summing the shaped bytes each
moves per NLML+gradient evaluation. Combined with the analytic FLOP
count this gives the comms:compute ratio a reader needs to predict
real-mesh scaling (ICI ~ 10^2 GB/s/link vs ~10^2 TFLOP/s/chip: the
evaluation stays compute-bound while bytes/flops << ICI/MXU ratio
~ 1e-3).

Writes results.json["comm_volume"]. Runs anywhere (CPU mesh is fine —
the HLO collectives are the same ops a TPU slice executes over ICI).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python benchmarks/comm_volume.py
"""

from __future__ import annotations

import json
import os
import sys
import re
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root, for direct-script runs
RESULTS = os.path.join(HERE, "results.json")

SIZES = [2048, 4096, 8192]
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "pred": 1, "s8": 1, "u8": 1}
_COLL = ("all-gather", "all-reduce", "collective-permute",
         "reduce-scatter", "all-to-all")


def _shape_bytes(shape_str: str) -> int:
    """bytes of an HLO shape string like 'f32[256,2048]{1,0}' or a
    tuple '(f32[8], f32[8])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        b = _DTYPE_BYTES.get(dt)
        if b is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * b
    return total


def collective_bytes(hlo_text: str) -> dict:
    """Per-collective-kind (count, bytes moved per device per call
    summed over calls) from optimized HLO text. Bytes counted are the
    OUTPUT shape of each collective op — the data each device
    materializes from the wire (all-gather: the gathered array;
    all-reduce: the reduced array; permute: the received block)."""
    out = {}
    for line in hlo_text.splitlines():
        s = line.strip()
        # match 'name = <shape> all-gather(...)' forms
        m = re.match(r"\S+ = (\S.*?) (all-gather|all-reduce|"
                     r"collective-permute|reduce-scatter|all-to-all)"
                     r"(-start)?\(", s)
        if not m:
            continue
        if "-done" in s.split("=")[1][:60]:
            continue
        shape, kind, started = m.group(1), m.group(2), m.group(3)
        b = _shape_bytes(shape)
        rec = out.setdefault(kind, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    return out


def analytic_bytes(n: int, nb: int, grad_exact: bool) -> dict:
    """Per-device collective OUTPUT bytes of one NLML+grad evaluation,
    with loop trip counts applied (the HLO scan sees each in-loop
    collective once; the fori_loop executes it N/nb times).

    From the algorithm (parallel/pchol.py, parallel/nlml.py), B = N/nb
    block steps, f32:
      X all-gather             : 4 N d
      block Cholesky           : per step psum(nb^2) + all-gather
                                 panel (N nb)            ~ 4 N^2
      alpha solve (M=1)        : per step psum(nb + nb^2) lower,
                                 + psum(nb N) row-broadcast upper
                                                          ~ 4 N^2
      exact-grad Q build (M=N) : lower psum(nb N) + upper psum(nb N)
                                 + upper row-broadcast psum(nb N)
                                                          ~ 12 N^2
      reductions (fit, logdet, grad psum) : O(N + p)
    """
    B = max(n // nb, 1)
    f = 4  # f32 bytes
    xg = f * n * 3
    chol = B * (f * nb * nb + f * n * nb)
    alpha = B * (f * (nb + nb * nb) + f * nb * n + f * nb * nb)
    total = xg + chol + alpha
    parts = {"x_all_gather": xg, "block_cholesky": chol,
             "alpha_solves": alpha}
    if grad_exact:
        q = B * (3 * f * nb * n + 2 * f * nb * nb)
        parts["exact_grad_q_build"] = q
        total += q
    parts["alpha_all_gather"] = f * n
    total += f * n
    return {"total": int(total), "parts": parts}


def ring_analytic_bytes(n: int, n_dev: int, probes: int,
                        slq_probes: int, lanczos_iters: int,
                        cg_iters: int, rank: int) -> dict:
    """Per-device collective OUTPUT bytes of one ring NLML+grad eval.

    Dominant mover: the ppermute rotations — per ring pass over a
    C-column block, each device receives P hops of
    (X block (n_local, 3) + V block (n_local, C)), i.e. ~4 n (3 + C)
    bytes (n = P n_local). Passes: cg_iters whitened-CG matmats over
    C = probes + 1 columns, lanczos_iters SLQ matmats over slq_probes
    columns, one gradient pass over probes + 1, plus the pivoted-chol
    build (rank psums of k-vectors + pivot rows, O(rank (k + d))
    bytes — noise). psum'd inner products are O(C) scalars/iter."""
    f = 4
    n_local = n // n_dev
    per_pass = lambda C: f * n_dev * n_local * (3 + C)  # noqa: E731
    cg = cg_iters * per_pass(probes + 1)
    slq = lanczos_iters * per_pass(slq_probes)
    grad = per_pass(probes + 1)
    pivchol = rank * f * (rank + 4 + n_dev)  # psum'd Li rows + pivots
    total = cg + slq + grad + pivchol
    return {"total": int(total),
            "parts": {"cg_ppermute": int(cg), "slq_ppermute": int(slq),
                      "grad_pass": int(grad),
                      "pivchol_psum": int(pivchol)}}


def ring_block(n: int, n_dev: int):
    """Compile the ring NLML+grad on the simulated mesh; HLO-verify
    its collective sites and pair them with the analytic per-eval
    bytes (trip counts applied)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.parallel import (
        make_mesh,
        make_ring_nlml_and_grad,
        shard_training_data,
    )

    opts = dict(precond_rank=256, probes=8, slq_probes=16,
                lanczos_iters=16, cg_tol=1e-3, cg_maxiter=400)
    mesh = make_mesh(n_dev)
    model = default_model(3, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    y = np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
    Xs, ys, n_true, _ = shard_training_data(mesh, X, y, nb=256)
    fr = make_ring_nlml_and_grad(model.kernel, mesh, n=n_true, **opts)
    flat = jnp.asarray(model.pack(), jnp.float32)
    hlo = fr.lower(flat, Xs, ys).compile().as_text()
    coll = collective_bytes(hlo)
    # iteration count measured on-chip for the whitened solve at the
    # nearest stream_tuning rank is ~60-120; use 100 as the stated
    # trip count for the analytic figure
    ana = ring_analytic_bytes(n_true, n_dev, opts["probes"],
                              opts["slq_probes"], opts["lanczos_iters"],
                              cg_iters=100, rank=opts["precond_rank"])
    flops = 100 * 2 * n * n * (3 + 9) + opts["lanczos_iters"] * 2 * n * n * 19
    return {
        "n": n,
        "devices": n_dev,
        "opts": dict(opts, assumed_cg_iters=100),
        "hlo_collective_sites": coll,
        "analytic_bytes_per_eval_per_device": ana,
        "approx_flops_per_eval": float(flops),
        "bytes_per_flop": float(ana["total"] / flops),
    }


def main():
    # force the 8-device simulated CPU mesh regardless of the
    # environment: the axon TPU plugin's register() overrides
    # JAX_PLATFORMS (see tests/conftest.py), and a 1-device run
    # records empty collective sites — worthless as evidence
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gp_ss_ak_tpu.model import default_model
    from gp_ss_ak_tpu.parallel import (
        make_dist_nlml_and_grad,
        make_mesh,
        shard_training_data,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    model = default_model(3, dtype=jnp.float32)
    rng = np.random.default_rng(0)

    rows = []
    for n in SIZES:
        X = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        y = np.sin(X @ np.array([3.0, 1.0, 2.0], np.float32))
        Xs, ys, n_true, _ = shard_training_data(mesh, X, y, nb=256)
        f = make_dist_nlml_and_grad(model.kernel, model.likelihood,
                                    mesh, n=n_true, nb=256)
        flat = jnp.asarray(model.pack(), jnp.float32)
        lowered = f.lower(flat, Xs, ys)
        hlo = lowered.compile().as_text()
        coll = collective_bytes(hlo)
        # analytic FLOPs of one evaluation (dominant terms):
        # Gram row panels 2 n^2 d, block chol n^3/3, alpha solve 2 n^2,
        # exact-grad Q build ~2 n^3 (N-RHS solves) + contraction 2 n^2 d
        grad_exact = n <= 8192
        flops = 2 * n * n * 3 + n ** 3 / 3 + 2 * n * n
        if grad_exact:
            flops += 2 * n ** 3 + 2 * n * n * 3
        ana = analytic_bytes(n, 256, grad_exact)
        row = {
            "n": n,
            "devices": n_dev,
            "hlo_collective_sites": coll,
            "analytic_bytes_per_eval_per_device": ana,
            "approx_flops_per_eval": float(flops),
            "bytes_per_flop": float(ana["total"] / flops),
        }
        rows.append(row)
        print(json.dumps(row))

    try:
        ring = ring_block(8192, n_dev)
        print(json.dumps(ring))
    except Exception as e:  # noqa: BLE001
        ring = {"error": str(e)[:300],
                "diagnosis": "ring compile/HLO walk failed on the "
                             "simulated mesh"}

    data = {}
    if os.path.exists(RESULTS):
        with open(RESULTS) as fh:
            data = json.load(fh)
    data["comm_volume_ring"] = {
        "note": ("ring (ppermute) route: analytic per-device "
                 "collective bytes per NLML+grad eval with loop trip "
                 "counts applied (formulas in ring_analytic_bytes; "
                 "cg trip count stated, measured-range 60-120), "
                 "HLO sites cross-checked on the simulated 8-device "
                 "mesh; the ratio to the per-device tile compute is "
                 "what the scaling projection consumes"),
        "row": ring,
        "ts": time.strftime("%F %T"),
    }
    data["comm_volume"] = {
        "note": ("analytic collective output bytes per NLML+grad "
                 "evaluation per device (loop trip counts applied; "
                 "formulas in benchmarks/comm_volume.analytic_bytes), "
                 "cross-checked against the distinct collective sites "
                 "in the optimized 8-device HLO; an evaluation is "
                 "compute-bound whenever bytes_per_flop << "
                 "ICI_bw / MXU_flops (~2e-3 on v5e: 4.5e11 B/s per "
                 "direction vs 2e14 FLOP/s bf16)"),
        "rows": rows,
        "ts": time.strftime("%F %T"),
    }
    with open(RESULTS, "w") as fh:
        json.dump(data, fh, indent=1)
    print(f"wrote comm_volume -> {RESULTS}")


if __name__ == "__main__":
    main()
