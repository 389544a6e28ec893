"""Persistent XLA compile cache, one switch for every entry point.

The 512px NST programs cost minutes of XLA time on a 1-core host; the
cache (``saved/xla_cache`` at the repo root, gitignored) lets repeat
runs — the driver's bench, the probe harnesses, the graft dry run —
skip straight to execution.  Best-effort: backends without persistent
cache support just compile as usual.
"""

from __future__ import annotations

import os

import jax

_REPO_ROOT = os.path.abspath(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)


def enable_compile_cache(cache_dir: str | None = None) -> None:
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.path.join(_REPO_ROOT, "saved", "xla_cache"),
        )
        # 2 s (was 10): the IST build's eager ops (concats, the donor
        # gather) each compile in 1-9 s on this 1-core host and were
        # re-paid EVERY process start — ~13 s of the measured dataset-build
        # wall (round-4 probe: warm build 5.0 s vs first build 19.2 s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:
        # best-effort, but never silent: without the cache every run pays
        # minutes of XLA time per program on this 1-core host
        import sys

        print(
            f"[compile-cache] disabled ({type(e).__name__}: {e}) — "
            "programs will recompile from scratch",
            file=sys.stderr,
        )
