"""Experiment: can the windowed-MSDA kernel's d-broadcast (E) and d-reduce
(E^T) constant matmuls be replaced by VPU lane ops?

The per-shift selection matmuls dominate the attention kernels' MXU time with
K or N = L*M = 56 (<128 lanes, 44% utilization):

- fwd/bwd broadcast: cwlm [T,56] @ E [56, 896] -> cwlk (each (l,m) weight
  copied onto its 16 d-lanes),
- bwd reduce: dlk [T,896] @ E^T [896,56] (sum every 16 d-lanes).

Each variant runs the op `win`^2=81 times inside one Pallas kernel (matching
the shift loop) over a [T, .] tile so relayout costs show at realistic scale.

Usage: python scripts/exp_vpu_broadcast.py          # all variants, each in a
                                                    # timeout-guarded subprocess
       python scripts/exp_vpu_broadcast.py <name>   # one variant inline

Some variants (pltpu.repeat / broadcast on sub-128-lane shapes) are known to
HANG the Mosaic compiler for >10 min (see BENCH_NOTES) — the parent process
runs each variant in a subprocess with a deadline so a hang prints TIMEOUT
instead of blocking forever.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mvdetr_tpu.ops.pallas.msda_kernel import _select_matrices

T = 6 * 184  # bwd tile size at flagship scale
L, M, D, P = 7, 8, 16, 4
LM, LK, PLM = L * M, L * M * D, P * L * M
REPS = 81


def _bench(name, kernel_fn, inputs, out_shape, iters=30):
    f = jax.jit(
        lambda *a: pl.pallas_call(
            kernel_fn,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in a],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*a)
    )
    try:
        r = f(*inputs)
        float(jnp.sum(r))
    except Exception as e:
        print(f"{name:28s}: FAILED {repr(e)[:140]}")
        return
    t0 = time.time()
    for _ in range(iters):
        r = f(*inputs)
    float(jnp.sum(r))
    ms = (time.time() - t0) / iters * 1000
    print(f"{name:28s}: {ms:8.3f} ms  ({ms / REPS * 1000:6.1f} us/rep)")


def main(only: str | None = None):
    rng = np.random.default_rng(0)
    cwlm = jnp.asarray(rng.standard_normal((T, LM)), jnp.float32)
    dlk = jnp.asarray(rng.standard_normal((T, LK)), jnp.float32)
    vwin = jnp.asarray(rng.standard_normal((T, LK)), jnp.bfloat16)
    e_mat = jnp.asarray(_select_matrices(M, L, P, D)[1])
    et_mat = jnp.asarray(e_mat.T.copy())

    # ---- broadcast variants: [T, LM] -> [T, LK], multiply vwin, accumulate
    def k_matmul(x_ref, e_ref, v_ref, o_ref):
        acc = jnp.zeros((T, LK), jnp.float32)
        for i in range(REPS):
            cwlk = jnp.dot(x_ref[...] + float(i), e_ref[...],
                           preferred_element_type=jnp.float32)
            acc += cwlk * v_ref[...].astype(jnp.float32)
        o_ref[...] = acc

    def k_repeat(x_ref, v_ref, o_ref):
        acc = jnp.zeros((T, LK), jnp.float32)
        for i in range(REPS):
            cwlk = pltpu.repeat(x_ref[...] + float(i), D, axis=1)
            acc += cwlk * v_ref[...].astype(jnp.float32)
        o_ref[...] = acc

    def k_jnp_repeat(x_ref, v_ref, o_ref):
        acc = jnp.zeros((T, LK), jnp.float32)
        for i in range(REPS):
            cwlk = jnp.repeat(x_ref[...] + float(i), D, axis=1)
            acc += cwlk * v_ref[...].astype(jnp.float32)
        o_ref[...] = acc

    def k_bcast3d(x_ref, v_ref, o_ref):
        acc = jnp.zeros((T, LM, D), jnp.float32)
        v3 = v_ref[...].reshape(T, LM, D)
        for i in range(REPS):
            cwlk = jax.lax.broadcast_in_dim(x_ref[...] + float(i), (T, LM, D), (0, 1))
            acc += cwlk * v3.astype(jnp.float32)
        o_ref[...] = acc.reshape(T, LK)

    out_f32 = jax.ShapeDtypeStruct((T, LK), jnp.float32)
    if only is None:
        print(f"== broadcast [T={T},{LM}] -> [T,{LK}] x{REPS} ==")
    bcast = {
        "matmul": ("E matmul (baseline)", k_matmul, (cwlm, e_mat, vwin), out_f32),
        "repeat": ("pltpu.repeat", k_repeat, (cwlm, vwin), out_f32),
        "jnp_repeat": ("jnp.repeat", k_jnp_repeat, (cwlm, vwin), out_f32),
        "bcast3d": ("broadcast_in_dim 3d", k_bcast3d, (cwlm, vwin), out_f32),
    }
    for key, spec in bcast.items():
        if only in (None, key):
            _bench(*spec)

    # ---- reduce variants: [T, LK] -> [T, LM]
    def r_matmul(x_ref, et_ref, o_ref):
        acc = jnp.zeros((T, LM), jnp.float32)
        for i in range(REPS):
            acc += jnp.dot(x_ref[...] + float(i), et_ref[...],
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc

    def r_reshape_sum(x_ref, o_ref):
        acc = jnp.zeros((T, LM), jnp.float32)
        for i in range(REPS):
            acc += jnp.sum((x_ref[...] + float(i)).reshape(T, LM, D), axis=2)
        o_ref[...] = acc

    out_lm = jax.ShapeDtypeStruct((T, LM), jnp.float32)
    if only is None:
        print(f"== reduce [T={T},{LK}] -> [T,{LM}] x{REPS} ==")
    reduce = {
        "r_matmul": ("E^T matmul (baseline)", r_matmul, (dlk, et_mat), out_lm),
        "r_reshape_sum": ("reshape+sum axis=-1", r_reshape_sum, (dlk,), out_lm),
    }
    for key, spec in reduce.items():
        if only in (None, key):
            _bench(*spec)
    return list(bcast) + list(reduce)


ALL_VARIANTS = ["matmul", "repeat", "jnp_repeat", "bcast3d", "r_matmul", "r_reshape_sum"]


def _run_all_guarded(deadline_s: int = 600):
    """Each variant in its own subprocess: a Mosaic compile hang becomes a
    TIMEOUT line instead of blocking the script indefinitely."""
    import subprocess

    for name in ALL_VARIANTS:
        try:
            subprocess.run([sys.executable, os.path.abspath(__file__), name], timeout=deadline_s)
        except subprocess.TimeoutExpired:
            print(f"{name:28s}: TIMEOUT (> {deadline_s}s — compiler hang, see BENCH_NOTES)")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        main(sys.argv[1])
    else:
        _run_all_guarded()
