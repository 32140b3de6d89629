"""On-chip correctness check: Pallas windowed-MSDA vs the XLA formulation.

The interpret-mode pytest oracles run on CPU; this script runs BOTH paths on
the real TPU at a reduced flagship shape and compares fwd outputs and all
three gradients. Run after any kernel change (compile ~2-4 min over the
tunnel).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mvdetr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from mvdetr_tpu.ops.msda_windowed import _pallas_windowed, ms_deform_attn_windowed


def main():
    import argparse
    ap = argparse.ArgumentParser(); ap.add_argument("--radius", type=int, default=4)
    radius = ap.parse_args().radius
    b, l, h, w, m, d, p = 1, 3, 24, 48, 8, 16, 4
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((b, l, h, w, m, d)), jnp.float32)
    off = jnp.asarray(rng.uniform(-6, 6, (b, l, h, w, m, l, p, 2)), jnp.float32)
    wgt = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, l, h, w, m, l * p)), jnp.float32), axis=-1
    ).reshape(b, l, h, w, m, l, p)

    def loss_pl(v, o, wg):
        return jnp.sum(jnp.sin(_pallas_windowed(radius, False, True, v, o, wg)))

    def loss_ref(v, o, wg):
        return jnp.sum(jnp.sin(ms_deform_attn_windowed(v, o, wg, radius)))

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))

    out_pl = jax.jit(lambda v, o, wg: _pallas_windowed(radius, False, True, v, o, wg))(value, off, wgt)
    out_rf = jax.jit(lambda v, o, wg: ms_deform_attn_windowed(v, o, wg, radius))(value, off, wgt)
    fwd_err = rel(out_pl, out_rf)

    g_pl = jax.jit(jax.grad(loss_pl, argnums=(0, 1, 2)))(value, off, wgt)
    g_rf = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(value, off, wgt)
    errs = [rel(a, b) for a, b in zip(g_pl, g_rf)]

    print(f"fwd max rel err: {fwd_err:.2e}")
    print(f"grad max rel errs (value, offsets, weights): {errs[0]:.2e} {errs[1]:.2e} {errs[2]:.2e}")
    # the kernel samples values in bf16 (production config); the XLA
    # reference runs f32 — ~1e-2 relative is the expected quantization gap
    ok = fwd_err < 2e-2 and all(e < 3e-2 for e in errs)
    print("OK" if ok else "MISMATCH")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
