"""Persistent XLA compilation cache.

TPU compiles of the full model take minutes over the remote-compile tunnel;
the persistent cache makes every entry point (bench, CLI, driver compile
checks) fast after the first run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                                 ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


def use_fast_prng() -> None:
    """Switch the default PRNG to ``unsafe_rbg`` (hardware RNG) unless
    ``MVDETR_PRNG=threefry`` opts out.

    The encoder's nine dropout sites draw masks over ~19M-element token
    tensors each train step; counter-based threefry generation for those
    masks costs ~19 ms/step at flagship scale (measured: 480 -> 461 ms,
    +4% throughput — BENCH_NOTES r4). rbg is deterministic per key (the
    bitwise step-reproducibility check still passes); its weaker key-split
    mixing is irrelevant for dropout masks. Entry points (cli, bench,
    profile scripts) call this; tests keep the default threefry.
    """
    if os.environ.get("MVDETR_PRNG", "").lower() == "threefry":
        return
    import jax

    try:
        jax.config.update("jax_default_prng_impl", "unsafe_rbg")
    except Exception:
        pass
