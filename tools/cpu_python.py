"""CPU-forced module launcher: `python tools/cpu_python.py <module> [args...]`.

The host pre-sets JAX_PLATFORMS=axon via sitecustomize, and env vars alone
cannot override it (CLAUDE.md) — the config must be updated programmatically
before any backend touch. Make targets that should never touch the exclusive
TPU (report, test helpers) go through this launcher.
"""
import os
import runpy
import sys

sys.path.insert(0, os.getcwd())  # script-mode puts tools/ first, not cwd

import jax

jax.config.update("jax_platforms", "cpu")

module, sys.argv = sys.argv[1], sys.argv[1:]
runpy.run_module(module, run_name="__main__", alter_sys=True)
